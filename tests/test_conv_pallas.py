"""Fused conv/res-block Pallas kernels vs the flax modules (interpret mode).

These kernels are numerically exact vs ConvBNRelu / ResidualBlock
(train=False) but measured slower than XLA at serving shapes, so they are
NOT wired into the model (see ops/conv_pallas.py STATUS). The parity tests
stay so the kernels remain a correct starting point for future tuning.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_transcription_tpu.models.cnn_rnn import (
    ConvBNRelu,
    ResidualBlock,
    _maxpool_freq,
)
from music_transcription_tpu.ops.conv_pallas import (
    fused_conv_bn_relu,
    fused_res_block,
)

rng = np.random.default_rng(0)


def _randomize_bn(variables):
    """Give BN stats/params non-trivial values so the affine is exercised."""

    def rnd(tree):
        out = {}
        for k, val in tree.items():
            if isinstance(val, dict):
                out[k] = rnd(val)
            else:
                r = np.asarray(rng.standard_normal(val.shape), np.float32)
                out[k] = jnp.asarray(np.abs(r) + 0.5 if k == "var" else r * 0.3)
        return out

    return {"params": variables["params"], "batch_stats": rnd(dict(variables["batch_stats"]))}


def _maxerr(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


@pytest.mark.parametrize("pool", [True, False])
def test_conv_bn_relu_matches_flax(pool):
    B, F, T = 2, 16, 20
    x = jnp.asarray(rng.standard_normal((B, F, T, 1)), jnp.float32).astype(jnp.bfloat16)
    mod = ConvBNRelu(8, dtype=jnp.bfloat16)
    v = _randomize_bn(mod.init(jax.random.key(0), x, train=True))
    ref = mod.apply(v, x, train=False)
    if pool:
        ref = _maxpool_freq(ref)
    got = fused_conv_bn_relu(
        x, v["params"]["conv"]["kernel"], v["params"]["conv"]["bias"],
        v["params"]["bn"]["scale"], v["params"]["bn"]["bias"],
        v["batch_stats"]["bn"]["mean"], v["batch_stats"]["bn"]["var"],
        pool=pool, f_blk=4, interpret=True,
    )
    assert ref.shape == got.shape
    assert _maxerr(ref, got) < 0.05


def test_conv_bn_relu_wide_kernel():
    """(7,3) freq-aware conv geometry (reference cnn_rnn_model.py:289)."""
    B, F, T = 2, 8, 20
    x = jnp.asarray(rng.standard_normal((B, F, T, 12)), jnp.float32).astype(jnp.bfloat16)
    mod = ConvBNRelu(16, kernel=(7, 3), dtype=jnp.bfloat16)
    v = _randomize_bn(mod.init(jax.random.key(3), x, train=True))
    ref = mod.apply(v, x, train=False)
    got = fused_conv_bn_relu(
        x, v["params"]["conv"]["kernel"], v["params"]["conv"]["bias"],
        v["params"]["bn"]["scale"], v["params"]["bn"]["bias"],
        v["batch_stats"]["bn"]["mean"], v["batch_stats"]["bn"]["var"],
        pool=False, f_blk=4, interpret=True,
    )
    assert _maxerr(ref, got) < 0.05


def test_res_block_skip_pool_matches_flax():
    B, F, T = 2, 16, 20
    x = jnp.asarray(rng.standard_normal((B, F, T, 8)), jnp.float32).astype(jnp.bfloat16)
    rb = ResidualBlock(16, dtype=jnp.bfloat16)
    v = _randomize_bn(rb.init(jax.random.key(1), x, train=True))
    ref = _maxpool_freq(rb.apply(v, x, train=False))
    got = fused_res_block(x, v, pool=True, f_blk=4, interpret=True)
    assert ref.shape == got.shape
    assert _maxerr(ref, got) < 0.1


def test_res_block_identity_matches_flax():
    B, F, T = 2, 16, 20
    x = jnp.asarray(rng.standard_normal((B, F, T, 16)), jnp.float32).astype(jnp.bfloat16)
    rb = ResidualBlock(16, dtype=jnp.bfloat16)
    v = _randomize_bn(rb.init(jax.random.key(2), x, train=True))
    ref = rb.apply(v, x, train=False)
    got = fused_res_block(x, v, pool=False, f_blk=4, interpret=True)
    assert _maxerr(ref, got) < 0.1


def test_res_block_edge_zeroing():
    """conv2 must see zeros outside the tensor: a constant input makes any
    halo leakage visible at the first/last f rows and t columns."""
    B, F, T = 1, 8, 36
    x = jnp.ones((B, F, T, 4), jnp.bfloat16)
    rb = ResidualBlock(4, dtype=jnp.bfloat16)
    v = _randomize_bn(rb.init(jax.random.key(4), x, train=True))
    ref = rb.apply(v, x, train=False)
    got = fused_res_block(x, v, pool=False, f_blk=4, interpret=True)
    assert _maxerr(ref, got) < 0.05
