"""Op-level numerical parity vs torch oracles (CPU torch is the test oracle
for the reference's numerics; no reference code is involved)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from music_transcription_tpu.ops import losses
from music_transcription_tpu.ops.lstm import bilstm_layer, bilstm_stack, init_bilstm_params

RNG = np.random.default_rng(0)


def test_bce_with_logits_matches_torch():
    logits = RNG.standard_normal((4, 88, 50)).astype(np.float32) * 3
    targets = (RNG.random((4, 88, 50)) > 0.7).astype(np.float32)
    ours = np.asarray(losses.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets), reduction="none"
    ).numpy()
    assert np.abs(ours - ref).max() < 1e-5


def test_masked_bce_loss_matches_reference_formula():
    b, p, t = 3, 88, 40
    logits = RNG.standard_normal((b, p, t)).astype(np.float32)
    targets = (RNG.random((b, p, t)) > 0.8).astype(np.float32)
    lengths = np.array([40, 25, 10])
    ours = float(losses.masked_bce_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(lengths)))
    # reference formula: per-elem BCE * mask(B,1,T); sum / (mask.sum() * P)
    per = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets), reduction="none"
    )
    mask = (torch.arange(t)[None, :] < torch.from_numpy(lengths)[:, None]).float().unsqueeze(1)
    ref = float((per * mask).sum() / (mask.sum() * p).clamp_min(1))
    assert ours == pytest.approx(ref, rel=1e-6)


def test_interpolate_matches_torch_linear():
    x = RNG.standard_normal((2, 88, 57)).astype(np.float32)
    for out_t in (57, 40, 100, 1):
        ours = np.asarray(losses.interpolate_time_linear(jnp.asarray(x), out_t))
        ref = F.interpolate(torch.from_numpy(x), size=out_t, mode="linear", align_corners=False).numpy()
        assert np.abs(ours - ref).max() < 1e-5, out_t


def test_onset_offset_targets_match_reference_derivation():
    targets = (RNG.random((2, 88, 30)) > 0.6).astype(np.float32)
    on, off = losses.derive_onset_offset_targets(jnp.asarray(targets))
    tt = torch.from_numpy(targets)
    ref_on = torch.zeros_like(tt)
    ref_off = torch.zeros_like(tt)
    ref_on[:, :, 1:] = torch.clamp(tt[:, :, 1:] - tt[:, :, :-1], min=0)
    ref_off[:, :, :-1] = torch.clamp(tt[:, :, :-1] - tt[:, :, 1:], min=0)
    assert np.array_equal(np.asarray(on), ref_on.numpy())
    assert np.array_equal(np.asarray(off), ref_off.numpy())


def test_multi_head_loss_weighting():
    b, p, t = 2, 88, 20
    frame = RNG.standard_normal((b, p, t)).astype(np.float32)
    onset = RNG.standard_normal((b, p, t)).astype(np.float32)
    offset = RNG.standard_normal((b, p, t)).astype(np.float32)
    targets = (RNG.random((b, p, t)) > 0.7).astype(np.float32)
    lengths = jnp.asarray([20, 11])
    d = {k: jnp.asarray(v) for k, v in [("frame", frame), ("onset", onset), ("offset", offset)]}
    total = float(losses.multi_head_loss(d, jnp.asarray(targets), lengths))
    on_t, off_t = losses.derive_onset_offset_targets(jnp.asarray(targets))
    expect = (
        0.5 * float(losses.masked_bce_loss(d["frame"], jnp.asarray(targets), lengths))
        + 0.25 * float(losses.masked_bce_loss(d["onset"], on_t, lengths))
        + 0.25 * float(losses.masked_bce_loss(d["offset"], off_t, lengths))
    )
    assert total == pytest.approx(expect, rel=1e-6)


def test_token_cross_entropy_matches_torch_ignore_index():
    b, t, v = 3, 17, 50
    logits = RNG.standard_normal((b, t, v)).astype(np.float32)
    targets = RNG.integers(0, v, size=(b, t))
    targets[0, 10:] = 2  # pad
    ours = float(losses.token_cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(
        torch.nn.CrossEntropyLoss(ignore_index=2)(
            torch.from_numpy(logits).reshape(-1, v), torch.from_numpy(targets).reshape(-1)
        )
    )
    assert ours == pytest.approx(ref, rel=1e-5)


def test_token_cross_entropy_class_weights_match_torch():
    """--pitch_loss_weight semantics == torch CrossEntropyLoss(weight=...):
    weighted sum over positions / sum of target-id weights; all-ones
    reproduces the unweighted mean exactly."""
    b, t, v = 2, 13, 40
    logits = RNG.standard_normal((b, t, v)).astype(np.float32)
    targets = RNG.integers(0, v, size=(b, t))
    targets[1, 7:] = 2  # pad
    w = np.ones(v, np.float32)
    w[10:20] = 4.0

    ours = float(losses.token_cross_entropy(
        jnp.asarray(logits), jnp.asarray(targets),
        class_weights=jnp.asarray(w)))
    ref = float(
        torch.nn.CrossEntropyLoss(ignore_index=2, weight=torch.from_numpy(w))(
            torch.from_numpy(logits).reshape(-1, v), torch.from_numpy(targets).reshape(-1)
        )
    )
    assert ours == pytest.approx(ref, rel=1e-5)

    plain = float(losses.token_cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    ones = float(losses.token_cross_entropy(
        jnp.asarray(logits), jnp.asarray(targets),
        class_weights=jnp.ones(v, jnp.float32)))
    assert ones == pytest.approx(plain, rel=1e-6)


def test_note_token_mask_covers_exactly_the_pitch_ranges():
    from music_transcription_tpu.models.event_tokenizer import EventMIDITokenizer
    from music_transcription_tpu.models.remi_tokenizer import REMITokenizer

    remi = REMITokenizer(vocab_size=512)
    m = remi.note_token_mask()
    assert m.shape == (512,) and m.sum() == 88 + 88
    assert m[remi.note_on_id(0)] and m[remi.note_on_id(87)]
    assert m[remi.note_off_id(0)] and m[remi.note_off_id(87)]
    assert not m[remi.velocity_id(0)] and not m[remi.time_shift_id(1)]
    assert not m[remi.sos] and not m[remi.eos] and not m[remi.pad]

    ev = EventMIDITokenizer(vocab_size=512)
    m = ev.note_token_mask()
    assert m.shape == (512,) and m.sum() == 128 + 128
    assert m[ev.note_on_id(0)] and m[ev.note_off_id(127)]
    assert not m[ev.time_shift_id(1)] and not m[ev.sos]


# ---------------------------------------------------------------------------
# LSTM vs torch.nn.LSTM
# ---------------------------------------------------------------------------


def _torch_lstm_params_to_ours(lstm: torch.nn.LSTM) -> list[dict]:
    layers = []
    for li in range(lstm.num_layers):
        layer = {}
        for d, suffix in (("fwd", ""), ("bwd", "_reverse")):
            wi = getattr(lstm, f"weight_ih_l{li}{suffix}").detach().numpy()  # (4H, I)
            wh = getattr(lstm, f"weight_hh_l{li}{suffix}").detach().numpy()  # (4H, H)
            bi = getattr(lstm, f"bias_ih_l{li}{suffix}").detach().numpy()
            bh = getattr(lstm, f"bias_hh_l{li}{suffix}").detach().numpy()
            layer[f"wi_{d}"] = jnp.asarray(wi.T)
            layer[f"wh_{d}"] = jnp.asarray(wh.T)
            layer[f"b_{d}"] = jnp.asarray(bi + bh)
        layers.append(layer)
    return layers


def test_bilstm_layer_matches_torch():
    torch.manual_seed(0)
    i, h, b, t = 12, 16, 3, 25
    lstm = torch.nn.LSTM(i, h, num_layers=1, batch_first=True, bidirectional=True)
    x = RNG.standard_normal((b, t, i)).astype(np.float32)
    ref, _ = lstm(torch.from_numpy(x))
    ours = bilstm_layer(jnp.asarray(x), _torch_lstm_params_to_ours(lstm)[0])
    assert np.abs(np.asarray(ours) - ref.detach().numpy()).max() < 2e-5


def test_bilstm_stack_matches_torch_multilayer():
    torch.manual_seed(1)
    i, h, b, t, layers = 10, 8, 2, 30, 3
    lstm = torch.nn.LSTM(i, h, num_layers=layers, batch_first=True, bidirectional=True, dropout=0.0)
    x = RNG.standard_normal((b, t, i)).astype(np.float32)
    ref, _ = lstm(torch.from_numpy(x))
    ours = bilstm_stack(jnp.asarray(x), _torch_lstm_params_to_ours(lstm))
    assert np.abs(np.asarray(ours) - ref.detach().numpy()).max() < 2e-5


def test_init_bilstm_params_shapes():
    layers = init_bilstm_params(jax.random.key(0), input_size=20, hidden_size=8, num_layers=2)
    assert len(layers) == 2
    assert layers[0]["wi_fwd"].shape == (20, 32)
    assert layers[1]["wi_fwd"].shape == (16, 32)
    assert layers[0]["wh_bwd"].shape == (8, 32)


# ---------------------------------------------------------------------------
# Conv / BN / pool / attention building blocks vs torch
# ---------------------------------------------------------------------------


def test_conv_bn_relu_pool_matches_torch():
    from music_transcription_tpu.models.cnn_rnn import ConvBNRelu, _maxpool_freq, _to_nhwc

    x = RNG.standard_normal((2, 1, 16, 20)).astype(np.float32)  # (B,1,F,T)
    mod = ConvBNRelu(4)
    variables = mod.init(jax.random.key(0), _to_nhwc(jnp.asarray(x)), train=False)
    # copy params into torch
    kernel = np.asarray(variables["params"]["conv"]["kernel"])  # (3,3,1,4) HWIO
    bias = np.asarray(variables["params"]["conv"]["bias"])
    tw = torch.from_numpy(np.transpose(kernel, (3, 2, 0, 1)).copy())  # OIHW
    ref = F.conv2d(torch.from_numpy(x), tw, torch.from_numpy(bias), padding=(1, 1))
    ref = F.batch_norm(
        ref, torch.zeros(4), torch.ones(4), torch.ones(4), torch.zeros(4), False, 0.1, 1e-5
    )
    ref = F.relu(ref)
    ref = F.max_pool2d(ref, kernel_size=(2, 1))
    ours = _maxpool_freq(mod.apply(variables, _to_nhwc(jnp.asarray(x)), train=False))
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    assert np.abs(ours_nchw - ref.numpy()).max() < 1e-4


def test_attention_matches_manual_torch():
    from music_transcription_tpu.models.cnn_rnn import MultiHeadSelfAttention

    b, t, c, heads = 2, 10, 24, 4
    x = RNG.standard_normal((b, t, c)).astype(np.float32)
    mod = MultiHeadSelfAttention(hidden_dim=c, num_heads=heads, dropout=0.0)
    variables = mod.init(jax.random.key(0), jnp.asarray(x), train=False)
    wqkv = np.asarray(variables["params"]["qkv"]["kernel"])  # (C, 3C)
    bqkv = np.asarray(variables["params"]["qkv"]["bias"])
    wp = np.asarray(variables["params"]["proj"]["kernel"])
    bp = np.asarray(variables["params"]["proj"]["bias"])

    xt = torch.from_numpy(x)
    qkv = xt @ torch.from_numpy(wqkv) + torch.from_numpy(bqkv)
    qkv = qkv.reshape(b, t, 3, heads, c // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q @ k.transpose(-2, -1)) * (c // heads) ** -0.5
    attn = torch.clamp(attn, min=-10.0, max=10.0)
    attn = F.softmax(attn, dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, t, c)
    ref = out @ torch.from_numpy(wp) + torch.from_numpy(bp)

    ours = mod.apply(variables, jnp.asarray(x), train=False)
    assert np.abs(np.asarray(ours) - ref.numpy()).max() < 1e-5
