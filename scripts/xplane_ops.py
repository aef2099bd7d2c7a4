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

    by_op = collections.Counter()       # display name -> ns
    by_cat = collections.Counter()      # hlo_category -> ns
    op_cat = {}
    for pl in dev_planes:
        meta = pl.event_metadata
        stat_meta = pl.stat_metadata
        for line in pl.lines:
            # XLA ops live on the "XLA Ops" line; step/module lines would
            # double-count the same wall time.
            if line.name and "op" not in line.name.lower():
                continue
            for ev in line.events:
                md = meta.get(ev.metadata_id)
                if md is None:
                    continue
                name = md.display_name or md.name
                dur = ev.duration_ps // 1000  # ps -> ns
                by_op[name] += dur
                cat = None
                for st in list(ev.stats) + list(md.stats):
                    smd = stat_meta.get(st.metadata_id)
                    if smd is not None and smd.name == "hlo_category":
                        cat = st.str_value or None
                        break
                if cat:
                    by_cat[cat] += dur
                    op_cat[name] = cat

    def ms(ns):
        return ns / 1e6 / args.steps

    total = sum(by_op.values())
    print(f"trace: {path}")
    print(f"device planes: {[pl.name for pl in dev_planes]}")
    print(f"total device time: {ms(total):.2f} ms/step over {args.steps} steps\n")

    print(f"{'category':<28}{'ms/step':>10}{'share':>8}")
    for cat, ns in by_cat.most_common():
        print(f"{cat:<28}{ms(ns):>10.3f}{ns / total:>7.1%}")

    print(f"\n{'op':<72}{'cat':<16}{'ms/step':>10}")
    shown = 0
    for name, ns in by_op.most_common():
        if ms(ns) < args.min_ms:
            break
        print(f"{name[:70]:<72}{op_cat.get(name, '-')[:14]:<16}{ms(ns):>10.3f}")
        shown += 1
        if shown >= args.top:
            break
    return 0


if __name__ == "__main__":
    sys.exit(main())
