"""AST-style encoder-decoder for REMI token generation (experimental tier).

The reference wraps a pretrained HuggingFace AST encoder (frozen) and a
4-layer torch TransformerDecoder (reference models/transformer_model.py:15-392).
This is a self-contained JAX re-design:

  * **Encoder**: a native mel-patch transformer encoder (patch-embed the
    log-mel, add learned positions, pre-LN transformer blocks). The
    reference's pretrained encoder cannot be fetched in a zero-egress
    environment; ``use_mock_encoder=True`` reproduces the reference's
    dependency-free mock path (shaped pseudo-random features,
    transformer_model.py:56-86) and is the default for tests.
  * **Decoder**: token + learned positional embeddings, post-LN layers with
    gelu FFN (torch nn.TransformerDecoderLayer default semantics), causal
    self-attention, cross-attention to encoder memory.
  * **Generation**: KV-cached autoregressive decode as a ``lax.scan`` over
    steps — greedy or sampled (temperature / top-k), SOS masking and
    count-based repetition penalty matching transformer_model.py:305-392.

Teacher forcing: ``apply(variables, waveforms, targets=tokens)`` returns
(B, T, vocab) logits; generation: ``targets=None`` returns (B, gen_len) ids.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from music_transcription_tpu.config import AudioConfig


def _attention(q, k, v, mask=None, dtype=jnp.float32):
    """(B, T, H, D) attention; mask broadcastable to (B, H, Tq, Tk)."""
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * (d**-0.5)
    if mask is not None:
        logits = jnp.where(mask, logits, -1e9)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w.astype(dtype), v, preferred_element_type=jnp.float32)


class MultiHeadProj(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32

    def setup(self):
        self.q = nn.Dense(self.dim, dtype=self.dtype)
        self.k = nn.Dense(self.dim, dtype=self.dtype)
        self.v = nn.Dense(self.dim, dtype=self.dtype)
        self.o = nn.Dense(self.dim, dtype=self.dtype)

    def heads_split(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self.heads, self.dim // self.heads)

    def __call__(self, x_q, x_kv, mask=None):
        q = self.heads_split(self.q(x_q))
        k = self.heads_split(self.k(x_kv))
        v = self.heads_split(self.v(x_kv))
        out = _attention(q, k, v, mask, dtype=self.dtype)
        b, t, h, d = out.shape
        return self.o(out.reshape(b, t, h * d))

    # --- cached single-step path (generation) ---
    def init_cache(self, batch: int, max_len: int):
        d = self.dim // self.heads
        shape = (batch, max_len, self.heads, d)
        return jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32)

    def step(self, x_q1, cache, pos):
        """x_q1 (B, 1, C); cache (k, v) with new k/v written at ``pos``."""
        k_cache, v_cache = cache
        q = self.heads_split(self.q(x_q1))
        k_new = self.heads_split(self.k(x_q1))
        v_new = self.heads_split(self.v(x_q1))
        k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k_new.astype(k_cache.dtype), pos, 1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v_new.astype(v_cache.dtype), pos, 1)
        t = k_cache.shape[1]
        valid = (jnp.arange(t) <= pos)[None, None, None, :]  # (1,1,1,T)
        out = _attention(q, k_cache, v_cache, valid, dtype=self.dtype)
        b = out.shape[0]
        return self.o(out.reshape(b, 1, self.dim)), (k_cache, v_cache)

    def cross_kv(self, memory):
        return self.heads_split(self.k(memory)), self.heads_split(self.v(memory))

    def cross_step(self, x_q1, kv):
        k, v = kv
        q = self.heads_split(self.q(x_q1))
        out = _attention(q, k, v, None, dtype=self.dtype)
        b = out.shape[0]
        return self.o(out.reshape(b, 1, self.dim))


class DecoderLayer(nn.Module):
    """Post-LN decoder layer (torch nn.TransformerDecoderLayer defaults:
    norm_first=False, gelu, ffn = 4*dim)."""

    dim: int
    heads: int
    dropout: float = 0.2
    dtype: Any = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadProj(self.dim, self.heads, self.dtype)
        self.cross_attn = MultiHeadProj(self.dim, self.heads, self.dtype)
        self.linear1 = nn.Dense(self.dim * 4, dtype=self.dtype)
        self.linear2 = nn.Dense(self.dim, dtype=self.dtype)
        self.norm1 = nn.LayerNorm()
        self.norm2 = nn.LayerNorm()
        self.norm3 = nn.LayerNorm()
        self.drop = nn.Dropout(self.dropout)

    def _ffn(self, x, train):
        h = jax.nn.gelu(self.linear1(x), approximate=False)
        h = self.drop(h, deterministic=not train)
        return self.linear2(h)

    def __call__(self, x, memory, causal_mask, train: bool = False):
        a = self.self_attn(x, x, causal_mask)
        x = self.norm1(x + self.drop(a, deterministic=not train))
        a = self.cross_attn(x, memory)
        x = self.norm2(x + self.drop(a, deterministic=not train))
        x = self.norm3(x + self.drop(self._ffn(x, train), deterministic=not train))
        return x

    def step(self, x1, self_cache, cross_kv, pos):
        a, self_cache = self.self_attn.step(x1, self_cache, pos)
        x1 = self.norm1(x1 + a)
        a = self.cross_attn.cross_step(x1, cross_kv)
        x1 = self.norm2(x1 + a)
        x1 = self.norm3(x1 + self._ffn(x1, train=False))
        return x1, self_cache


class EncoderLayer(nn.Module):
    dim: int
    heads: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.LayerNorm()(x)
        h = MultiHeadProj(self.dim, self.heads, self.dtype)(h, h)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * 4, dtype=self.dtype)(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + nn.Dropout(self.dropout, deterministic=not train)(h)


def _encode_mel_patches(mdl, waveforms, train: bool):
    """Shared mel-patch encoder body: log-mel -> patch embed -> learned
    positions -> pre-LN transformer blocks -> final LN. ``mdl`` must define
    patch_embed / enc_pos / enc_blocks / enc_norm (same names in
    ASTTranscriber and ASTEncoderPretrainer, so pretrained encoder params
    transplant between them by subtree copy)."""
    acfg = AudioConfig(n_mels=mdl.n_mels)
    from music_transcription_tpu.ops.mel import log_mel_batch

    mel = log_mel_batch(waveforms, acfg)  # (B, M, T)
    b, m, t = mel.shape
    t_trim = (t // mdl.patch_frames) * mdl.patch_frames
    patches = mel[:, :, :t_trim].reshape(b, m, -1, mdl.patch_frames)
    patches = jnp.transpose(patches, (0, 2, 1, 3)).reshape(
        b, t_trim // mdl.patch_frames, m * mdl.patch_frames
    )
    x = mdl.patch_embed(patches.astype(mdl.compute_dtype))
    pos = jnp.arange(x.shape[1])
    x = x + mdl.enc_pos(pos)[None]
    for blk in mdl.enc_blocks:
        x = blk(x, train=train)
    return mdl.enc_norm(x)


ENCODER_PARAM_KEYS = ("patch_embed", "enc_pos", "enc_norm")  # + enc{i} blocks


def encoder_param_subtrees(params: dict) -> dict:
    """The encoder's parameter subtrees by top-level key (the transplant
    unit between ASTEncoderPretrainer and ASTTranscriber)."""
    keys = [k for k in params
            if k in ENCODER_PARAM_KEYS or (k.startswith("enc") and k[3:].isdigit())]
    return {k: params[k] for k in keys}


class ASTEncoderPretrainer(nn.Module):
    """Frame-supervised pretraining tower for the mel-patch encoder.

    The reference's AST value comes from a FROZEN PRETRAINED encoder
    (reference models/transformer_model.py:35,94-97 — AudioSet weights,
    unfetchable in a zero-egress environment). This reproduces the
    architecture pattern with in-environment resources: pretrain the same
    encoder against framewise 88-key labels (free from the synthetic
    corpus), then transplant the encoder subtrees into ASTTranscriber and
    freeze them while the token decoder trains.

    Output: frame logits (B, 88, T_trim) where T_trim = S * patch_frames —
    the frame head predicts ``patch_frames`` frames per encoder token, so
    supervision is at the full roll frame rate.
    """

    encoder_layers: int = 4
    encoder_dim: int = 384
    encoder_heads: int = 6
    patch_frames: int = 4
    n_mels: int = 128
    dropout: float = 0.1
    compute_dtype: Any = jnp.float32

    def setup(self):
        # names MUST match ASTTranscriber's encoder attributes (subtree copy)
        self.patch_embed = nn.Dense(self.encoder_dim, dtype=self.compute_dtype)
        self.enc_pos = nn.Embed(4096, self.encoder_dim)
        self.enc_blocks = [
            EncoderLayer(self.encoder_dim, self.encoder_heads, self.dropout,
                         self.compute_dtype, name=f"enc{i}")
            for i in range(self.encoder_layers)
        ]
        self.enc_norm = nn.LayerNorm()
        self.frame_head = nn.Dense(self.patch_frames * 88, dtype=jnp.float32)

    def __call__(self, waveforms, train: bool = False):
        x = _encode_mel_patches(self, waveforms, train)  # (B, S, D)
        h = self.frame_head(x.astype(jnp.float32))  # (B, S, patch_frames*88)
        b, s, _ = h.shape
        h = h.reshape(b, s * self.patch_frames, 88)
        return jnp.transpose(h, (0, 2, 1))  # (B, 88, T_trim)


class ASTTranscriber(nn.Module):
    """waveforms (B, L) -> REMI token logits / generated ids."""

    remi_vocab_size: int = 512
    decoder_layers: int = 4
    decoder_dim: int = 384
    decoder_heads: int = 6
    dropout: float = 0.2
    max_output_len: int = 1024
    encoder_layers: int = 4
    encoder_dim: int = 384
    encoder_heads: int = 6
    patch_frames: int = 4  # mel frames per encoder token
    n_mels: int = 128
    use_mock_encoder: bool = False
    freeze_encoder: bool = True  # stop-gradient through the encoder (ref default)
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.enc_to_dec = nn.Dense(self.decoder_dim, dtype=self.compute_dtype)
        self.token_emb = nn.Embed(self.remi_vocab_size, self.decoder_dim)
        self.pos_emb = nn.Embed(self.max_output_len, self.decoder_dim)
        self.layers = [
            DecoderLayer(self.decoder_dim, self.decoder_heads, self.dropout,
                         self.compute_dtype, name=f"dec{i}")
            for i in range(self.decoder_layers)
        ]
        self.output_fc = nn.Dense(self.remi_vocab_size, dtype=jnp.float32)
        if not self.use_mock_encoder:
            self.patch_embed = nn.Dense(self.encoder_dim, dtype=self.compute_dtype)
            self.enc_pos = nn.Embed(4096, self.encoder_dim)
            self.enc_blocks = [
                EncoderLayer(self.encoder_dim, self.encoder_heads, 0.1,
                             self.compute_dtype, name=f"enc{i}")
                for i in range(self.encoder_layers)
            ]
            self.enc_norm = nn.LayerNorm()

    # ------------------------------------------------------------- encoding
    def _encode(self, waveforms, train: bool):
        if self.use_mock_encoder:
            # Shaped deterministic pseudo-random features — the reference's
            # mock encoder path (transformer_model.py:56-86): S ~ L // 160.
            b, l = waveforms.shape
            s = max(1, l // 160)
            key = jax.random.key(0)
            feats = jax.random.normal(key, (b, s, self.decoder_dim), jnp.float32)
            return feats
        return _encode_mel_patches(self, waveforms, train)

    def _memory(self, waveforms, train: bool):
        feats = self._encode(waveforms, train)
        if self.freeze_encoder:
            # reference freezes the pretrained encoder by default
            # (transformer_model.py:105-108); gradient-stopped here.
            feats = jax.lax.stop_gradient(feats)
        return self.enc_to_dec(feats.astype(self.compute_dtype))  # (B, S, D)

    # ------------------------------------------------------ teacher forcing
    def __call__(self, waveforms, targets=None, train: bool = False,
                 generate_max_len: int = 256, **gen_kwargs):
        memory = self._memory(waveforms, train)
        if targets is None:
            if gen_kwargs.get("beam_size", 1) > 1:
                return self.generate_beam(memory, max_len=generate_max_len,
                                          **gen_kwargs)
            gen_kwargs.pop("beam_size", None)
            gen_kwargs.pop("length_penalty", None)
            return self.generate(memory, max_len=generate_max_len, **gen_kwargs)
        b, t = targets.shape
        positions = jnp.arange(t)[None].repeat(b, 0)
        x = self.token_emb(targets) + self.pos_emb(positions)
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        for layer in self.layers:
            x = layer(x, memory, causal, train=train)
        return self.output_fc(x)  # (B, T, V)

    # ------------------------------------------------------------ generation
    def _decode_step(self, tok, caches, cross_kvs, step, mask_sos, sos_id,
                     allowed_next):
        """One KV-cached decoder step shared by greedy/sampled and beam
        decoding: embed the previous token, run the layers, project to
        logits, and apply the SOS mask and grammar mask. Returns
        (logits (B, V), new_caches)."""
        x1 = self.token_emb(tok[:, None]) + self.pos_emb(step)[None, None]
        new_caches = []
        for layer, cache, ckv in zip(self.layers, caches, cross_kvs):
            x1, cache = layer.step(x1, cache, ckv, step)
            new_caches.append(cache)
        logits = self.output_fc(x1)[:, 0]  # (B, V)
        if mask_sos:
            logits = jnp.where(
                (step > 0) & (jnp.arange(self.remi_vocab_size) == sos_id)[None],
                -1e9,
                logits,
            )
        if allowed_next is not None:
            # tok is the previously emitted token; its successor row vetoes
            # grammar-illegal continuations outright.
            logits = jnp.where(allowed_next[tok], logits, -1e9)
        return logits, tuple(new_caches)

    def generate(
        self,
        memory,
        sos_id: int = 0,
        max_len: int = 256,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_k: int = 0,
        mask_sos: bool = True,
        repetition_penalty: float = 0.0,
        allowed_next=None,
        rng=None,
    ):
        """KV-cached autoregressive decode (reference transformer_model.py:305-392
        semantics: greedy default, optional sampling/top-k, SOS masking after
        step 0, count-based repetition penalty). Returns (B, max_len) ids.

        ``allowed_next`` enables grammar-constrained decoding: a (V, V) bool
        successor table (tokenizer ``transition_mask()``) whose row for the
        previously emitted token masks the logits, so free-running decode
        can only produce sequences the tokenizer's encoder could emit. The
        reference has no counterpart; it directly targets the exposure-bias
        drift its greedy decode suffers from."""
        b = memory.shape[0]
        if rng is None:
            rng = jax.random.key(0)
        self_caches = tuple(
            layer.self_attn.init_cache(b, max_len + 1) for layer in self.layers
        )
        cross_kvs = tuple(layer.cross_attn.cross_kv(memory) for layer in self.layers)
        counts0 = jnp.zeros((b, self.remi_vocab_size), jnp.float32)
        counts0 = counts0.at[:, sos_id].add(1.0)

        def step_fn(carry, step):
            tok, caches, counts, rng = carry
            logits, new_caches = self._decode_step(
                tok, caches, cross_kvs, step, mask_sos, sos_id, allowed_next)
            if repetition_penalty and repetition_penalty > 0.0:
                logits = logits - repetition_penalty * counts
            if do_sample:
                sample_logits = logits / jnp.maximum(1e-8, temperature)
                if top_k and top_k > 0:
                    kth = jnp.sort(sample_logits, axis=-1)[:, -top_k][:, None]
                    sample_logits = jnp.where(sample_logits < kth, -1e9, sample_logits)
                rng, sub = jax.random.split(rng)
                next_tok = jax.random.categorical(sub, sample_logits, axis=-1)
            else:
                next_tok = jnp.argmax(logits, axis=-1)
            counts = counts + jax.nn.one_hot(next_tok, self.remi_vocab_size)
            return (next_tok, new_caches, counts, rng), next_tok

        tok0 = jnp.full((b,), sos_id, jnp.int32)
        (_, _, _, _), tokens = nn.scan(
            lambda mdl, carry, x: step_fn(carry, x),
            variable_broadcast="params",
            split_rngs={"params": False},
        )(self, (tok0, self_caches, counts0, rng), jnp.arange(max_len))
        return jnp.transpose(tokens, (1, 0))  # (B, max_len)

    def generate_beam(
        self,
        memory,
        beam_size: int = 4,
        sos_id: int = 0,
        eos_id: int = 1,
        pad_id: int = 2,
        max_len: int = 256,
        length_penalty: float = 0.6,
        mask_sos: bool = True,
        allowed_next=None,
    ):
        """Vectorized beam search (no reference counterpart — the reference
        decodes greedy/top-k only, transformer_model.py:305-392).

        The beam rides the batch dimension: all ``B*beam`` hypotheses step
        as one KV-cached decoder call, and beam reindexing is a ``jnp.take``
        of the cache rows — one gather per step, MXU-friendly, no host
        control flow. Finished beams emit <pad> at zero score. Hypotheses
        are ranked by ``score / len**length_penalty`` (GNMT length norm).
        Composes with ``allowed_next`` grammar masking. Returns
        (B, max_len) ids of each batch row's best hypothesis."""
        b = memory.shape[0]
        bb = b * beam_size
        v = self.remi_vocab_size
        mem = jnp.repeat(memory, beam_size, axis=0)  # (bb, S, D)
        self_caches = tuple(
            layer.self_attn.init_cache(bb, max_len + 1) for layer in self.layers
        )
        cross_kvs = tuple(layer.cross_attn.cross_kv(mem) for layer in self.layers)
        neg = jnp.float32(-1e9)
        # all beams start identical: only beam 0 live, so the first top-k
        # fans out to distinct tokens instead of beam_size copies
        scores0 = jnp.full((b, beam_size), neg).at[:, 0].set(0.0)
        finished0 = jnp.zeros((b, beam_size), bool)
        lengths0 = jnp.full((b, beam_size), max_len, jnp.int32)
        tokbuf0 = jnp.full((b, beam_size, max_len), pad_id, jnp.int32)
        pad_row = jnp.full((v,), neg).at[pad_id].set(0.0)
        rows = jnp.arange(b)[:, None]  # (b, 1) batch index for beam gathers

        def step_fn(carry, step):
            tok, caches, scores, finished, lengths, tokbuf = carry
            logits, new_caches = self._decode_step(
                tok, caches, cross_kvs, step, mask_sos, sos_id, allowed_next)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            logp = logp.reshape(b, beam_size, v)
            logp = jnp.where(finished[:, :, None], pad_row[None, None], logp)
            cand = scores[:, :, None] + logp  # (b, beam, V)
            scores, idx = jax.lax.top_k(cand.reshape(b, beam_size * v), beam_size)
            parent = idx // v      # (b, beam)
            tok_new = idx % v      # (b, beam)
            flat_parent = (rows * beam_size + parent).reshape(-1)  # (bb,)
            new_caches = tuple(
                (jnp.take(k, flat_parent, axis=0), jnp.take(val, flat_parent, axis=0))
                for k, val in new_caches
            )
            tokbuf = tokbuf[rows, parent]  # (b, beam, max_len), reordered
            tokbuf = jax.lax.dynamic_update_slice_in_dim(
                tokbuf, tok_new[:, :, None], step, axis=2)
            was_finished = finished[rows, parent]
            newly = (tok_new == eos_id) & ~was_finished
            lengths = jnp.where(newly, step + 1, lengths[rows, parent])
            finished = was_finished | (tok_new == eos_id)
            carry = (tok_new.reshape(-1), new_caches, scores, finished,
                     lengths, tokbuf)
            return carry, ()

        tok0 = jnp.full((bb,), sos_id, jnp.int32)
        (_, _, scores, finished, lengths, tokbuf), _ = nn.scan(
            lambda mdl, carry, x: step_fn(carry, x),
            variable_broadcast="params",
            split_rngs={"params": False},
        )(self, (tok0, self_caches, scores0, finished0, lengths0, tokbuf0),
          jnp.arange(max_len))
        norm = scores / jnp.power(lengths.astype(jnp.float32),
                                  jnp.float32(length_penalty))
        best = jnp.argmax(norm, axis=1)  # (b,)
        return tokbuf[jnp.arange(b), best]  # (B, max_len)
