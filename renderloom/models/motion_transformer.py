"""DETR-style motion transformer, TPU-native.

Re-design of the reference pose-sequence upsampler
(``Human_Motion_Modelling/models/transformer.py`` and
``models/position_encoding.py``) as a flax/linen model:

* batch-first ``(B, L, C)`` layout (the reference permutes to L-major for
  ``nn.MultiheadAttention``; XLA prefers batch-leading contractions),
* one fused QKV projection matmul per attention (MXU-friendly) instead of
  torch's packed in-proj,
* masks folded into a single additive attention bias computed once per
  forward, not per layer,
* optional bfloat16 compute with float32 params.

Reference quirks reproduced deliberately (they are part of the trained
behavior):

* encoder self-attention uses an *eye* mask — each timestep is blocked
  from attending to itself (``transformer.py:114-120``);
* the decoder is bidirectional: a causal mask is built but unused in the
  reference (``transformer.py:122-134``), only key-padding masks apply;
* positional encoding is added to queries/keys only, never values
  (``transformer.py:228-230``);
* pre-norm layers, no final encoder norm beyond the stack norm, decoder
  has a final LayerNorm (``transformer.py:32-38``);
* two-stage scheme: encoder output is re-projected to joint space as
  denoised keyframes ``reco = joints_embed(mem) + src``; the decoder
  refines a linear interpolation of ``reco`` and outputs a residual on it
  (``transformer.py:80-112``).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from renderloom.core.config import MotionConfig, PosEncodeConfig, TransformerConfig

NEG_INF = -1e9  # additive mask value (finite: avoids NaNs on all-masked rows)


def sine_position_encoding(batch: int, length: int, dim: int,
                           temperature: float = 10000.0,
                           lengths: Optional[jax.Array] = None,
                           dtype=jnp.float32) -> jax.Array:
    """1-D sine PE, normalized so the last position maps to 2π.

    Mirrors ``PositionEmbeddingSine_1D`` (position_encoding.py:25-53):
    position ``i`` is scaled by ``2π/(L-1+eps)``; feature ``2k`` is
    ``sin(p/T^(2k/D_half))``, feature ``2k+1`` the matching cos.  Returns
    ``(B, L, dim)`` (batch-first here; the reference returns L-major).

    ``lengths`` (B,) gives per-sample *actual* sequence lengths so padded
    eval batches keep the reference's normalization (the reference never
    pads at eval; padding to a static shape is how renderloom keeps XLA
    shapes static while matching its math on the valid prefix).
    """
    half = dim // 2
    position = jnp.arange(length, dtype=jnp.float32)     # (L,)
    if lengths is None:
        norm = jnp.full((batch, 1), length - 1.0)
    else:
        norm = (lengths.astype(jnp.float32) - 1.0)[:, None]
    position = position[None, :] / (norm + 1e-6) * (2 * math.pi)  # (B, L)
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / half)
    angles = position[:, :, None] / dim_t[None, None, :]  # (B, L, half)
    pe = jnp.zeros((batch, length, dim), dtype=jnp.float32)
    pe = pe.at[:, :, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, :, 1::2].set(jnp.cos(angles))
    return pe.astype(dtype)


class LearnedPositionEncoding(nn.Module):
    """Learned absolute PE (position_encoding.py:55-78)."""

    dim: int
    max_positions: int = 160

    @nn.compact
    def __call__(self, batch: int, length: int, dtype=jnp.float32):
        table = self.param(
            "embedding", nn.initializers.uniform(scale=1.0),
            (self.max_positions, self.dim))
        pe = table[:length]
        return jnp.broadcast_to(pe[None], (batch, length, self.dim)).astype(dtype)


def _activation(name: str):
    if name == "relu":
        return nn.relu
    if name == "gelu":
        return nn.gelu
    if name == "leaky_relu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.01)
    if name == "glu":
        return nn.glu
    raise ValueError(f"unsupported activation {name!r}")


class MultiHeadAttention(nn.Module):
    """Attention with DETR-style external positional terms.

    Queries/keys receive ``q_pos``/``k_pos`` *before* projection; values
    never do (transformer.py:228-230).  ``bias`` is an additive mask of
    shape broadcastable to ``(B, 1, Lq, Lk)``.
    """

    dim: int
    heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, q_pos=None, k_pos=None,
                 bias: Optional[jax.Array] = None,
                 deterministic: bool = True):
        head_dim = self.dim // self.heads
        dense = lambda name: nn.Dense(self.dim, dtype=self.dtype,
                                      param_dtype=jnp.float32, name=name)
        q = dense("q_proj")(q_in if q_pos is None else q_in + q_pos)
        k = dense("k_proj")(k_in if k_pos is None else k_in + k_pos)
        v = dense("v_proj")(v_in)

        B, Lq, _ = q.shape
        Lk = k.shape[1]
        q = q.reshape(B, Lq, self.heads, head_dim)
        k = k.reshape(B, Lk, self.heads, head_dim)
        v = v.reshape(B, Lk, self.heads, head_dim)

        scale = 1.0 / math.sqrt(head_dim)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            logits = logits + bias
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        weights = nn.Dropout(self.dropout)(weights,
                                           deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out.reshape(B, Lq, self.dim)
        return dense("out_proj")(out)


class FeedForward(nn.Module):
    dim: int
    hidden: int
    dropout: float
    activation: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = _activation(self.activation)
        h = nn.Dense(self.hidden, dtype=self.dtype,
                     param_dtype=jnp.float32, name="linear1")(x)
        h = act(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="linear2")(h)
        return h


class EncoderLayer(nn.Module):
    """Pre/post-norm encoder layer (transformer.py:201-258)."""

    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, bias, deterministic: bool = True):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(dtype=self.dtype,
                                       param_dtype=jnp.float32, name=name)
        attn = MultiHeadAttention(c.hidden_dim, c.nheads, c.dropout,
                                  self.dtype, name="self_attn")
        ffn = FeedForward(c.hidden_dim, c.dim_feedforward, c.dropout,
                          c.activation, self.dtype, name="ffn")
        drop = nn.Dropout(c.dropout)
        if c.pre_norm:
            h = ln("norm1")(x)
            x = x + drop(attn(h, h, h, pos, pos, bias, deterministic),
                         deterministic=deterministic)
            h = ln("norm2")(x)
            x = x + drop(ffn(h, deterministic), deterministic=deterministic)
        else:
            h = attn(x, x, x, pos, pos, bias, deterministic)
            x = ln("norm1")(x + drop(h, deterministic=deterministic))
            h = ffn(x, deterministic)
            x = ln("norm2")(x + drop(h, deterministic=deterministic))
        return x


class DecoderLayer(nn.Module):
    """Pre/post-norm decoder layer (transformer.py:261-343)."""

    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, q_pos, mem_pos, self_bias, cross_bias,
                 deterministic: bool = True):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(dtype=self.dtype,
                                       param_dtype=jnp.float32, name=name)
        self_attn = MultiHeadAttention(c.hidden_dim, c.nheads, c.dropout,
                                       self.dtype, name="self_attn")
        cross_attn = MultiHeadAttention(c.hidden_dim, c.nheads, c.dropout,
                                        self.dtype, name="cross_attn")
        ffn = FeedForward(c.hidden_dim, c.dim_feedforward, c.dropout,
                          c.activation, self.dtype, name="ffn")
        drop = nn.Dropout(c.dropout)
        if c.pre_norm:
            h = ln("norm1")(x)
            x = x + drop(self_attn(h, h, h, q_pos, q_pos, self_bias,
                                   deterministic),
                         deterministic=deterministic)
            h = ln("norm2")(x)
            x = x + drop(cross_attn(h, memory, memory, q_pos, mem_pos,
                                    cross_bias, deterministic),
                         deterministic=deterministic)
            h = ln("norm3")(x)
            x = x + drop(ffn(h, deterministic), deterministic=deterministic)
        else:
            h = self_attn(x, x, x, q_pos, q_pos, self_bias, deterministic)
            x = ln("norm1")(x + drop(h, deterministic=deterministic))
            h = cross_attn(x, memory, memory, q_pos, mem_pos, cross_bias,
                           deterministic)
            x = ln("norm2")(x + drop(h, deterministic=deterministic))
            h = ffn(x, deterministic)
            x = ln("norm3")(x + drop(h, deterministic=deterministic))
        return x


def padding_bias(key_mask: jax.Array) -> jax.Array:
    """(B, Lk) bool True=hidden → additive (B, 1, 1, Lk) bias."""
    return jnp.where(key_mask[:, None, None, :], NEG_INF, 0.0)


def interpolate_embedding(x: jax.Array, rate: int) -> jax.Array:
    """Linear interpolation from every-``rate``-th frames, batch-first.

    Port of ``Transformer.interpolate_embedding`` (transformer.py:62-77):
    the last partial segment interpolates toward the final frame.
    ``x`` is (B, L, C).
    """
    L = x.shape[1]
    idx = jnp.arange(L)
    chunk = idx // rate
    remain = (idx % rate).astype(x.dtype)
    prev = x[:, chunk * rate]
    nxt_idx = jnp.concatenate([(chunk[:-1] + 1) * rate,
                               jnp.array([L - 1])])
    nxt = x[:, jnp.minimum(nxt_idx, L - 1)]
    w = remain[None, :, None]
    return prev / rate * (rate - w) + nxt / rate * w


class MotionTransformer(nn.Module):
    """Two-stage pose-sequence upsampler (transformer.py:18-134).

    Inputs are batch-first: ``src``/``tgt`` are (B, L, C_joints), masks
    are (B, L) bool with True = hidden/padded.  ``rate`` must be static
    (it selects gather indices).

    Returns ``(joints, reco)``: the refined full-rate sequence and the
    denoised keyframe sequence, both (B, L, C_joints).
    """

    cfg: TransformerConfig
    pos_cfg: PosEncodeConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.input_embed = nn.Dense(c.hidden_dim, dtype=self.dtype,
                                    param_dtype=jnp.float32)
        self.joints_embed = nn.Dense(c.input_joints, dtype=self.dtype,
                                     param_dtype=jnp.float32)
        self.enc_layers_mods = [
            EncoderLayer(c, self.dtype, name=f"enc_{i}")
            for i in range(c.enc_layers)]
        self.dec_layers_mods = [
            DecoderLayer(c, self.dtype, name=f"dec_{i}")
            for i in range(c.dec_layers)]
        if c.pre_norm:
            self.encoder_norm = nn.LayerNorm(dtype=self.dtype,
                                             param_dtype=jnp.float32)
        self.decoder_norm = nn.LayerNorm(dtype=self.dtype,
                                         param_dtype=jnp.float32)
        if self.pos_cfg.position_embedding in ("v3", "learned"):
            self.learned_pe = LearnedPositionEncoding(
                self.pos_cfg.hidden_dim, self.pos_cfg.max_learned_positions)

    def position_encoding(self, batch: int, length: int,
                          lengths: Optional[jax.Array] = None):
        if self.pos_cfg.position_embedding in ("v3", "learned"):
            return self.learned_pe(batch, length, self.dtype)
        return sine_position_encoding(batch, length, self.pos_cfg.hidden_dim,
                                      lengths=lengths, dtype=self.dtype)

    def encode(self, src_embed, src_mask, pos, deterministic=True):
        """Encoder with the eye self-attention mask (transformer.py:114-120)."""
        L = src_embed.shape[1]
        eye = jnp.eye(L, dtype=bool)[None, None]          # True = blocked
        bias = jnp.where(eye, NEG_INF, 0.0) + padding_bias(src_mask)
        x = src_embed
        for layer in self.enc_layers_mods:
            x = layer(x, pos, bias, deterministic)
        if self.cfg.pre_norm:
            x = self.encoder_norm(x)
        return x

    def decode(self, memory, src_mask, mem_pos, tgt_embed, tgt_mask,
               tgt_pos, deterministic=True):
        """Bidirectional decoder — key-padding masks only
        (transformer.py:122-134; the causal mask is built but unused)."""
        self_bias = padding_bias(tgt_mask)
        cross_bias = padding_bias(src_mask)
        x = tgt_embed
        for layer in self.dec_layers_mods:
            x = layer(x, memory, tgt_pos, mem_pos, self_bias, cross_bias,
                      deterministic)
        return self.decoder_norm(x)

    def __call__(self, src, src_mask, tgt, tgt_mask, rate: int,
                 deterministic: bool = True,
                 lengths: Optional[jax.Array] = None):
        B, L, _ = src.shape
        src = src.astype(self.dtype)
        pos = self.position_encoding(B, L, lengths)

        mem = self.encode(self.input_embed(src), src_mask, pos,
                          deterministic)
        reco = self.joints_embed(mem) + src                # denoised keyframes

        if self.cfg.two_stage:
            center = interpolate_embedding(reco, rate)
            tgt_embed = self.input_embed(center)
        else:
            center = tgt.astype(self.dtype)
            tgt_embed = self.input_embed(center)

        out = self.decode(mem, src_mask, pos, tgt_embed, tgt_mask, pos,
                          deterministic)
        joints = self.joints_embed(out) + center
        return joints.astype(jnp.float32), reco.astype(jnp.float32)


def build_motion_model(cfg: MotionConfig) -> MotionTransformer:
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    return MotionTransformer(cfg.transformer, cfg.pos_encode, dtype)


def init_motion_params(key: jax.Array, cfg: MotionConfig):
    model = build_motion_model(cfg)
    L = cfg.dataset.max_seq_length
    src = jnp.zeros((1, L, cfg.transformer.input_joints))
    mask = jnp.zeros((1, L), dtype=bool)
    variables = model.init({"params": key}, src, mask, src, mask,
                           cfg.dataset.train_sample_rate)
    return model, variables["params"]
