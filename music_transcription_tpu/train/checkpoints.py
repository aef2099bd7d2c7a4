"""Checkpointing: native orbax checkpoints + reference ``.pth`` conversion.

The reference saves bare ``model.state_dict()`` ``.pth`` files with no
optimizer or RNG state (reference scripts/train_cnn.py:345-359). The native
format here is an orbax checkpoint carrying params, batch_stats, optimizer
state and step — full resume, not just weights — with the reference's
best/periodic/final cadence implemented in train/loop.py.

``load_torch_checkpoint`` imports a reference-trained ``.pth`` into our
variables pytree for drop-in inference and parity testing. Key mapping is
mechanical:

  torch                          flax (this package)
  -----                          -------------------
  Conv2d  weight (O,I,kh,kw)  -> {name}/conv kernel (kh,kw,I,O)
  BatchNorm2d weight/bias     -> {name}/bn scale/bias  (params)
              running_mean/var-> {name}/bn mean/var    (batch_stats)
  Linear  weight (O,I)        -> Dense kernel (I,O)
  LSTM    weight_ih_l{k}[_reverse] (4H,I) -> l{k}_wi_fwd|bwd (I,4H)
          weight_hh_l{k}[...]  (4H,H)     -> l{k}_wh_fwd|bwd (H,4H)
          bias_ih + bias_hh                -> l{k}_b_fwd|bwd  (4H,)

Gate order (i,f,g,o) is preserved by ops/lstm.py, so no gate permutation is
needed. Checkpoint layout citations: reference models/cnn_rnn_model.py
(module attribute names), main.py:51-54 (state_dict load path).
"""

from __future__ import annotations

import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from music_transcription_tpu.config import ModelConfig

# ---------------------------------------------------------------------------
# Orbax native checkpoints
# ---------------------------------------------------------------------------


def save_checkpoint(path, payload: dict) -> None:
    """Save a pytree checkpoint (params / batch_stats / opt_state / step)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path, like: dict | None = None) -> dict:
    """Restore a checkpoint. Without ``like``, leaves restore as host numpy
    arrays regardless of the devices present at save time (a checkpoint saved
    on CPU must load on TPU and vice versa — orbax's default restores to the
    *recorded* sharding and fails across platforms)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if like is not None:
        return ocp.StandardCheckpointer().restore(path, target=like)
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path)
    if hasattr(meta, "item_metadata"):  # StepMetadata wrapper
        meta = meta.item_metadata
    tree = meta.tree if hasattr(meta, "tree") else meta
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree,
        is_leaf=lambda x: not isinstance(x, (dict, list, tuple)),
    )
    return ckptr.restore(path, restore_args=restore_args)


def epoch_from_checkpoint_name(name: str) -> int | None:
    """Parse the epoch number from a checkpoint filename — same regex
    convention as the reference resume logic (scripts/train_cnn.py:294-308)."""
    m = re.search(r"epoch[_\-](\d+)", os.path.basename(str(name)))
    return int(m.group(1)) if m else None


def latest_resumable_checkpoint(run_dir: str) -> str | None:
    """Newest resumable checkpoint under ``run_dir/checkpoints``: the
    highest-numbered ``model_epoch_N`` (full state — exact resume), else
    ``model_best`` (inference state — partial resume with a fresh
    optimizer), else None. The target of ``--resume auto``."""
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    if not os.path.isdir(ckpt_dir):
        return None
    best_n, best_path = -1, None
    for name in os.listdir(ckpt_dir):
        n = epoch_from_checkpoint_name(name)
        if name.startswith("model_epoch_") and n is not None and n > best_n:
            best_n, best_path = n, os.path.join(ckpt_dir, name)
    if best_path is not None:
        return best_path
    best = os.path.join(ckpt_dir, "model_best")
    return best if os.path.isdir(best) else None


# ---------------------------------------------------------------------------
# Torch .pth import
# ---------------------------------------------------------------------------


def _load_state_dict(path) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    # notebook-era checkpoints sometimes wrap the dict
    for key in ("model_state", "state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    out = {}
    for k, v in obj.items():
        k = k.removeprefix("module.")
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out


def _conv(sd, prefix):
    return {
        "kernel": jnp.asarray(np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _bn_params(sd, prefix):
    return {"scale": jnp.asarray(sd[f"{prefix}.weight"]), "bias": jnp.asarray(sd[f"{prefix}.bias"])}


def _bn_stats(sd, prefix):
    return {
        "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
        "var": jnp.asarray(sd[f"{prefix}.running_var"]),
    }


def _dense(sd, prefix):
    return {
        "kernel": jnp.asarray(sd[f"{prefix}.weight"].T),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _lstm(sd, prefix, num_layers):
    out = {}
    for li in range(num_layers):
        for d, suffix in (("fwd", ""), ("bwd", "_reverse")):
            out[f"l{li}_wi_{d}"] = jnp.asarray(sd[f"{prefix}.weight_ih_l{li}{suffix}"].T)
            out[f"l{li}_wh_{d}"] = jnp.asarray(sd[f"{prefix}.weight_hh_l{li}{suffix}"].T)
            out[f"l{li}_b_{d}"] = jnp.asarray(
                sd[f"{prefix}.bias_ih_l{li}{suffix}"] + sd[f"{prefix}.bias_hh_l{li}{suffix}"]
            )
    return out


def convert_torch_state_dict(sd: dict, cfg: ModelConfig) -> dict:
    """torch state_dict (numpy values) -> {'params', 'batch_stats'} pytree."""
    # reference wrapper prefixes everything with "model."
    if any(k.startswith("model.") for k in sd):
        sd = {k.removeprefix("model."): v for k, v in sd.items()}

    params: dict = {}
    stats: dict = {}
    if cfg.model_type == "cnn_rnn":
        # reference models/cnn_rnn_model.py:29-55 — cnn.0/1 conv+bn,
        # cnn.4/5 conv+bn, rnn, fc
        params["block1"] = {"conv": _conv(sd, "cnn.0"), "bn": _bn_params(sd, "cnn.1")}
        params["block2"] = {"conv": _conv(sd, "cnn.4"), "bn": _bn_params(sd, "cnn.5")}
        stats["block1"] = {"bn": _bn_stats(sd, "cnn.1")}
        stats["block2"] = {"bn": _bn_stats(sd, "cnn.5")}
        params["rnn"] = _lstm(sd, "rnn", cfg.num_layers)
        params["fc"] = _dense(sd, "fc")
    elif cfg.model_type == "cnn_rnn_large":
        # reference models/cnn_rnn_model.py:178-260
        params["conv1"] = {"conv": _conv(sd, "conv1.0"), "bn": _bn_params(sd, "conv1.1")}
        stats["conv1"] = {"bn": _bn_stats(sd, "conv1.1")}
        for rb in ("res_block1", "res_block2"):
            params[rb] = {
                "conv1": _conv(sd, f"{rb}.conv1"),
                "bn1": _bn_params(sd, f"{rb}.bn1"),
                "conv2": _conv(sd, f"{rb}.conv2"),
                "bn2": _bn_params(sd, f"{rb}.bn2"),
                "skip_conv": _conv(sd, f"{rb}.skip.0"),
                "skip_bn": _bn_params(sd, f"{rb}.skip.1"),
            }
            stats[rb] = {
                "bn1": _bn_stats(sd, f"{rb}.bn1"),
                "bn2": _bn_stats(sd, f"{rb}.bn2"),
                "skip_bn": _bn_stats(sd, f"{rb}.skip.1"),
            }
        params["freq_aware_conv"] = {
            "conv": _conv(sd, "freq_aware_conv.0"),
            "bn": _bn_params(sd, "freq_aware_conv.1"),
        }
        stats["freq_aware_conv"] = {"bn": _bn_stats(sd, "freq_aware_conv.1")}
        params["rnn_main"] = _lstm(sd, "rnn_main", cfg.num_layers)
        params["rnn_local"] = _lstm(sd, "rnn_local", 1)
        if cfg.use_attention:
            params["attention"] = {
                "qkv": _dense(sd, "attention.qkv"),
                "proj": _dense(sd, "attention.proj"),
            }
            params["attention_norm"] = {
                "scale": jnp.asarray(sd["attention_norm.weight"]),
                "bias": jnp.asarray(sd["attention_norm.bias"]),
            }
        if cfg.use_onset_offset_heads:
            params["shared_fc"] = _dense(sd, "shared_fc")
            for head in ("frame_head", "onset_head", "offset_head"):
                params[head] = _dense(sd, head)
        else:
            params["fc"] = _dense(sd, "fc")
    else:
        raise ValueError(f"No torch converter for model type {cfg.model_type}")
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path, cfg: ModelConfig) -> dict:
    """Load a reference ``.pth`` checkpoint into our variables pytree."""
    return convert_torch_state_dict(_load_state_dict(path), cfg)


# ---------------------------------------------------------------------------
# Torch .pth export (the reverse direction: our variables -> reference format)
# ---------------------------------------------------------------------------


def _np(x):
    return np.asarray(x)


def export_torch_state_dict(variables: dict, cfg: ModelConfig, prefix: str = "model.") -> dict:
    """variables pytree -> reference-format state_dict (numpy values).

    Inverse of convert_torch_state_dict; lets models trained here run in the
    reference PyTorch pipeline (same key names, OIHW/row-major layouts)."""
    p = variables["params"]
    s = variables.get("batch_stats", {})
    out: dict = {}

    def put_conv(name, tree):
        out[f"{name}.weight"] = np.transpose(_np(tree["kernel"]), (3, 2, 0, 1))
        out[f"{name}.bias"] = _np(tree["bias"])

    def put_bn(name, ptree, stree):
        out[f"{name}.weight"] = _np(ptree["scale"])
        out[f"{name}.bias"] = _np(ptree["bias"])
        out[f"{name}.running_mean"] = _np(stree["mean"])
        out[f"{name}.running_var"] = _np(stree["var"])
        out[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)

    def put_dense(name, tree):
        out[f"{name}.weight"] = _np(tree["kernel"]).T
        out[f"{name}.bias"] = _np(tree["bias"])

    def put_lstm(name, tree, num_layers):
        for li in range(num_layers):
            for d, suffix in (("fwd", ""), ("bwd", "_reverse")):
                out[f"{name}.weight_ih_l{li}{suffix}"] = _np(tree[f"l{li}_wi_{d}"]).T
                out[f"{name}.weight_hh_l{li}{suffix}"] = _np(tree[f"l{li}_wh_{d}"]).T
                b = _np(tree[f"l{li}_b_{d}"])
                out[f"{name}.bias_ih_l{li}{suffix}"] = b  # combined bias goes to ih,
                out[f"{name}.bias_hh_l{li}{suffix}"] = np.zeros_like(b)  # hh zeroed

    if cfg.model_type == "cnn_rnn":
        put_conv("cnn.0", p["block1"]["conv"])
        put_bn("cnn.1", p["block1"]["bn"], s["block1"]["bn"])
        put_conv("cnn.4", p["block2"]["conv"])
        put_bn("cnn.5", p["block2"]["bn"], s["block2"]["bn"])
        put_lstm("rnn", p["rnn"], cfg.num_layers)
        put_dense("fc", p["fc"])
    elif cfg.model_type == "cnn_rnn_large":
        put_conv("conv1.0", p["conv1"]["conv"])
        put_bn("conv1.1", p["conv1"]["bn"], s["conv1"]["bn"])
        for rb in ("res_block1", "res_block2"):
            put_conv(f"{rb}.conv1", p[rb]["conv1"])
            put_bn(f"{rb}.bn1", p[rb]["bn1"], s[rb]["bn1"])
            put_conv(f"{rb}.conv2", p[rb]["conv2"])
            put_bn(f"{rb}.bn2", p[rb]["bn2"], s[rb]["bn2"])
            put_conv(f"{rb}.skip.0", p[rb]["skip_conv"])
            put_bn(f"{rb}.skip.1", p[rb]["skip_bn"], s[rb]["skip_bn"])
        put_conv("freq_aware_conv.0", p["freq_aware_conv"]["conv"])
        put_bn("freq_aware_conv.1", p["freq_aware_conv"]["bn"], s["freq_aware_conv"]["bn"])
        put_lstm("rnn_main", p["rnn_main"], cfg.num_layers)
        put_lstm("rnn_local", p["rnn_local"], 1)
        if cfg.use_attention:
            put_dense("attention.qkv", p["attention"]["qkv"])
            put_dense("attention.proj", p["attention"]["proj"])
            out["attention_norm.weight"] = _np(p["attention_norm"]["scale"])
            out["attention_norm.bias"] = _np(p["attention_norm"]["bias"])
        if cfg.use_onset_offset_heads:
            put_dense("shared_fc", p["shared_fc"])
            for head in ("frame_head", "onset_head", "offset_head"):
                put_dense(head, p[head])
        else:
            put_dense("fc", p["fc"])
    else:
        raise ValueError(f"No torch export for model type {cfg.model_type}")
    return {prefix + k: v for k, v in out.items()}


def save_torch_checkpoint(path, variables: dict, cfg: ModelConfig) -> None:
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_torch_state_dict(variables, cfg).items()
    }
    torch.save(sd, path)


def assert_tree_shapes_match(converted: dict, initialized: dict) -> None:
    """Sanity check: converted checkpoint has exactly the initialized shapes."""
    conv_flat = jax.tree_util.tree_flatten_with_path(converted)[0]
    init_flat = jax.tree_util.tree_flatten_with_path(initialized)[0]
    conv_map = {jax.tree_util.keystr(k): v.shape for k, v in conv_flat}
    init_map = {jax.tree_util.keystr(k): v.shape for k, v in init_flat}
    missing = sorted(set(init_map) - set(conv_map))
    extra = sorted(set(conv_map) - set(init_map))
    mismatched = sorted(
        k for k in set(conv_map) & set(init_map) if conv_map[k] != init_map[k]
    )
    if missing or extra or mismatched:
        raise ValueError(
            f"checkpoint conversion mismatch:\n missing={missing[:8]}\n "
            f"extra={extra[:8]}\n shape-mismatch={[(k, conv_map[k], init_map[k]) for k in mismatched[:8]]}"
        )
