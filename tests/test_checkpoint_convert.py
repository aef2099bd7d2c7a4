"""Torch .pth conversion: shape-exactness and end-to-end forward parity for
the base model against a freshly built torch module with the reference's
state_dict layout."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from music_transcription_tpu.config import ModelConfig
from music_transcription_tpu.models.transcription import TranscriptionModel
from music_transcription_tpu.train import checkpoints as CK


class TorchBase(nn.Module):
    """Minimal torch twin with the reference base model's state_dict keys
    (cnn.0/1/4/5, rnn, fc) for conversion testing."""

    def __init__(self, n_mels=16, hidden=8, layers=2):
        super().__init__()
        self.cnn = nn.Sequential(
            nn.Conv2d(1, 32, 3, padding=1),
            nn.BatchNorm2d(32),
            nn.ReLU(),
            nn.MaxPool2d((2, 1)),
            nn.Conv2d(32, 64, 3, padding=1),
            nn.BatchNorm2d(64),
            nn.ReLU(),
            nn.MaxPool2d((2, 1)),
        )
        self.rnn = nn.LSTM(
            64 * (n_mels // 4), hidden, num_layers=layers, batch_first=True, bidirectional=True
        )
        self.fc = nn.Linear(2 * hidden, 88)

    def forward(self, x):
        f = self.cnn(x)
        f = f.permute(0, 3, 1, 2).contiguous()
        b, t, c, fr = f.shape
        out, _ = self.rnn(f.reshape(b, t, c * fr))
        return self.fc(out).transpose(1, 2)


def test_base_conversion_forward_parity():
    torch.manual_seed(0)
    n_mels, hidden, layers = 16, 8, 2
    tm = TorchBase(n_mels, hidden, layers).eval()
    # Perturb BN running stats so the test exercises them.
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    cfg = ModelConfig(model_type="cnn_rnn", n_mels=n_mels, hidden_size=hidden, num_layers=layers)
    model = TranscriptionModel(cfg)
    init_vars = model.init(jax.random.key(0), model.example_input(batch=1, t=6))

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    converted = CK.convert_torch_state_dict(sd, cfg)
    CK.assert_tree_shapes_match(converted, init_vars)

    x = np.random.default_rng(0).standard_normal((2, 1, n_mels, 12)).astype(np.float32)
    ref = tm(torch.from_numpy(x)).detach().numpy()
    ours = np.asarray(model.apply(converted, jnp.asarray(x)))
    assert ref.shape == ours.shape == (2, 88, 12)
    # fp32 accumulation-order noise across backends; any layout/transpose
    # error would produce O(1) differences.
    assert np.abs(ref - ours).max() < 2e-3


def test_large_conversion_shapes():
    """Large model: synthesize a state_dict with the reference's key names
    and verify the converted tree matches our initialized shapes exactly."""
    cfg = ModelConfig(model_type="cnn_rnn_large", n_mels=16, hidden_size=8, num_layers=2)
    model = TranscriptionModel(cfg)
    init_vars = model.init(jax.random.key(0), model.example_input(batch=1, t=6))

    rng = np.random.default_rng(1)
    sd = {}

    def add_conv(prefix, o, i, kh, kw):
        sd[f"{prefix}.weight"] = rng.standard_normal((o, i, kh, kw)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.standard_normal(o).astype(np.float32)

    def add_bn(prefix, c):
        for k, v in (("weight", 1.0), ("bias", 0.0), ("running_mean", 0.0), ("running_var", 1.0)):
            sd[f"{prefix}.{k}"] = np.full(c, v, np.float32)

    def add_dense(prefix, o, i):
        sd[f"{prefix}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.standard_normal(o).astype(np.float32)

    def add_lstm(prefix, input_size, h, layers):
        i = input_size
        for li in range(layers):
            for s in ("", "_reverse"):
                sd[f"{prefix}.weight_ih_l{li}{s}"] = rng.standard_normal((4 * h, i)).astype(np.float32)
                sd[f"{prefix}.weight_hh_l{li}{s}"] = rng.standard_normal((4 * h, h)).astype(np.float32)
                sd[f"{prefix}.bias_ih_l{li}{s}"] = rng.standard_normal(4 * h).astype(np.float32)
                sd[f"{prefix}.bias_hh_l{li}{s}"] = rng.standard_normal(4 * h).astype(np.float32)
            i = 2 * h

    add_conv("conv1.0", 32, 1, 3, 3)
    add_bn("conv1.1", 32)
    for rb, ci, co in (("res_block1", 32, 64), ("res_block2", 64, 128)):
        add_conv(f"{rb}.conv1", co, ci, 3, 3)
        add_bn(f"{rb}.bn1", co)
        add_conv(f"{rb}.conv2", co, co, 3, 3)
        add_bn(f"{rb}.bn2", co)
        add_conv(f"{rb}.skip.0", co, ci, 1, 1)
        add_bn(f"{rb}.skip.1", co)
    add_conv("freq_aware_conv.0", 256, 128, 7, 3)
    add_bn("freq_aware_conv.1", 256)
    lstm_in = 256 * (16 // 8)
    add_lstm("rnn_main", lstm_in, 8, 2)
    add_lstm("rnn_local", lstm_in, 4, 1)
    add_dense("attention.qkv", 3 * 24, 24)  # combined dim = 2*8 + 2*4 = 24
    add_dense("attention.proj", 24, 24)
    sd["attention_norm.weight"] = np.ones(24, np.float32)
    sd["attention_norm.bias"] = np.zeros(24, np.float32)
    add_dense("shared_fc", 8, 24)
    for head in ("frame_head", "onset_head", "offset_head"):
        add_dense(head, 88, 8)

    converted = CK.convert_torch_state_dict(sd, cfg)
    CK.assert_tree_shapes_match(converted, init_vars)
    out = model.apply(converted, jnp.zeros((1, 1, 16, 12)))
    assert out.shape == (1, 88, 12)


def test_epoch_from_checkpoint_name():
    assert CK.epoch_from_checkpoint_name("model_epoch_17.pth") == 17
    assert CK.epoch_from_checkpoint_name("/x/y/model_epoch-3.ckpt") == 3
    assert CK.epoch_from_checkpoint_name("model_best.pth") is None


def test_orbax_roundtrip(tmp_path):
    payload = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.asarray(7),
    }
    path = tmp_path / "ckpt"
    CK.save_checkpoint(path, payload)
    back = CK.load_checkpoint(path, like=jax.tree.map(jnp.zeros_like, payload))
    assert int(back["step"]) == 7
    assert np.allclose(np.asarray(back["params"]["w"]), np.arange(6).reshape(2, 3))


def test_torch_export_roundtrip(tmp_path):
    """our variables -> .pth -> back must be numerically identical."""
    import jax.numpy as jnp

    cfg = ModelConfig(model_type="cnn_rnn_large", n_mels=16, hidden_size=8, num_layers=2)
    model = TranscriptionModel(cfg)
    variables = model.init(jax.random.key(3), model.example_input(batch=1, t=6))
    path = tmp_path / "export.pth"
    CK.save_torch_checkpoint(path, variables, cfg)
    back = CK.load_torch_checkpoint(path, cfg)
    CK.assert_tree_shapes_match(back, {k: variables[k] for k in ("params", "batch_stats")})
    x = jnp.asarray(np.random.default_rng(5).standard_normal((1, 1, 16, 10)), jnp.float32)
    a = model.apply(variables, x)
    b = model.apply(back, x)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-6
