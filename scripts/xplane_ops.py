#!/usr/bin/env python
"""Aggregate a jax.profiler xplane trace into a per-op time table.

Feeds the train-step roofline (DESIGN.md): run a short training with
``--profile_steps N`` (train/loop.py writes ``plugins/profile/.../*.xplane.pb``
under the run dir), then:

    python scripts/xplane_ops.py outputs/<run>/trace --steps N

Prints per-HLO-op total device time (divided by ``--steps`` for a per-step
figure), grouped two ways: by HLO category (fusion/convolution/copy/...)
and by the top individual ops, with their source-annotated names so the
"glue" bucket (loss, BN/LN, concat, optimizer, transposes) is attributable
op by op. Parses the raw XSpace proto via tensorflow's bundled
``tensorflow.tsl.profiler.protobuf.xplane_pb2`` — no plugin needed.
"""

import argparse
import collections
import glob
import os
import sys


def find_xplane(path):
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        raise SystemExit(f"no *.xplane.pb under {path}")
    return hits[-1]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("trace", help="xplane.pb file or directory containing one")
    p.add_argument("--steps", type=int, default=1,
                   help="traced step count (divides totals)")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--min_ms", type=float, default=0.0,
                   help="hide per-op rows below this per-step time")
    p.add_argument("--line", type=str, default="XLA Ops",
                   help="device-plane line to aggregate (default: the "
                        "synchronous compute line; 'Async XLA Ops' shows "
                        "DMA/collective overlap instead)")
    p.add_argument("--depth", type=int, default=2,
                   help="scope-path components kept in the tf_op table")
    args = p.parse_args(argv)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = find_xplane(args.trace)
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    # Device planes are named like "/device:TPU:0" / "/device:CPU:0" (jax
    # host traces use "/host:CPU" for python threads — skip those).
    dev_planes = [pl for pl in space.planes
                  if pl.name.startswith("/device:") and pl.lines]
    if not dev_planes:
        raise SystemExit(
            f"no device planes in {path}; planes: {[pl.name for pl in space.planes]}")

    def scope_key(tf_op, depth):
        """jit(train_step)/jvp(CNNRNNLarge)/res_block1/... -> a short bucket.

        Keeps the fwd/bwd distinction (jvp vs transpose(jvp)) plus `depth`
        scope components below it; strips the jit(...) root and the
        make_train_step glue scopes.
        """
        parts = [p for p in tf_op.rstrip(":").split("/") if p]
        if parts and parts[0].startswith("jit("):
            parts = parts[1:]
        out = []
        for p in parts:
            if p.startswith("transpose(jvp("):
                out.append("bwd")
                continue
            if p.startswith("jvp("):
                out.append("fwd")
                continue
            if p.startswith(("vmap(", "make_train_step", "train_step")):
                continue
            out.append(p)
            if len(out) >= depth + 1 and out[0] in ("fwd", "bwd"):
                break
            if len(out) >= depth and out[0] not in ("fwd", "bwd"):
                break
        return "/".join(out) if out else "(top)"

    by_op = collections.Counter()       # display name -> ns
    by_cat = collections.Counter()      # hlo_category -> ns
    by_scope = collections.Counter()    # tf_op scope bucket -> ns
    op_cat = {}
    op_scope = {}
    for pl in dev_planes:
        meta = pl.event_metadata
        stat_meta = pl.stat_metadata
        for line in pl.lines:
            # Aggregate exactly one line: "XLA Ops" is the synchronous
            # TensorCore timeline (sums to the measured step time);
            # "Async XLA Ops"/"Steps"/"XLA Modules" cover the same wall
            # time again and would double-count.
            if line.name != args.line:
                continue
            for ev in line.events:
                md = meta.get(ev.metadata_id)
                if md is None:
                    continue
                name = md.display_name or md.name
                dur = ev.duration_ps // 1000  # ps -> ns
                by_op[name] += dur
                cat = tf_op = None
                for st in list(ev.stats) + list(md.stats):
                    smd = stat_meta.get(st.metadata_id)
                    if smd is None:
                        continue
                    if smd.name == "hlo_category":
                        cat = st.str_value or None
                    elif smd.name == "tf_op":
                        tf_op = st.str_value or None
                if cat:
                    by_cat[cat] += dur
                    op_cat[name] = cat
                if tf_op:
                    sk = scope_key(tf_op, args.depth)
                    by_scope[sk] += dur
                    op_scope[name] = sk

    # Durations were summed across ALL device planes; normalize by the plane
    # count so a multichip trace reports per-chip ms/step, not the sum over
    # chips (which would inflate roofline math by N).
    n_planes = max(1, len(dev_planes))

    def ms(ns):
        return ns / 1e6 / args.steps / n_planes

    total = sum(by_op.values())
    print(f"trace: {path}")
    print(f"device planes: {[pl.name for pl in dev_planes]}")
    note = f" (mean over {n_planes} device planes)" if n_planes > 1 else ""
    print(f"total device time: {ms(total):.2f} ms/step over {args.steps} steps{note}\n")

    print(f"{'category':<28}{'ms/step':>10}{'share':>8}")
    for cat, ns in by_cat.most_common():
        print(f"{cat:<28}{ms(ns):>10.3f}{ns / total:>7.1%}")

    if by_scope:
        print(f"\n{'scope (tf_op)':<52}{'ms/step':>10}{'share':>8}")
        for sk, ns in by_scope.most_common():
            if ms(ns) < args.min_ms:
                break
            print(f"{sk[:50]:<52}{ms(ns):>10.3f}{ns / total:>7.1%}")

    print(f"\n{'op':<52}{'scope':<36}{'cat':<12}{'ms/step':>9}")
    shown = 0
    for name, ns in by_op.most_common():
        if ms(ns) < args.min_ms:
            break
        print(f"{name[:50]:<52}{op_scope.get(name, '-')[:34]:<36}"
              f"{op_cat.get(name, '-')[:10]:<12}{ms(ns):>9.3f}")
        shown += 1
        if shown >= args.top:
            break
    return 0


if __name__ == "__main__":
    sys.exit(main())
