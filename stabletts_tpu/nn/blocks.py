"""Core transformer blocks for the DiT-Conv estimator and text encoder.

Behavioral parity with the reference (models/diffusion_transformer.py:10-205):
  * partial RoPE (rotary dim = head_dim / 2) in the labml "concatenated halves"
    formulation
  * adaLN-Zero 6-way modulation from the conditioning vector (zero-initialized)
  * conv-based FFN (kernel 3) instead of an MLP
  * additive -max attention bias from the padding mask

Layout: all sequence tensors are channels-last [B, T, C]; conditioning vectors
are [B, C]; masks are [B, T] floats. 1x1 convs are nn.Dense (pure MXU matmuls);
k-tap convs are nn.Conv with SAME padding.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def rope_cache(seq_len: int, rotary_dim: int, base: float = 10_000.0, dtype=jnp.float32):
    """cos/sin caches [T, rotary_dim] for partial RoPE.

    theta_i = base^(-2i/d) for i in [0, d/2); cache rows are
    [m*theta_0 .. m*theta_{d/2-1}, m*theta_0 .. m*theta_{d/2-1}]
    (reference: models/diffusion_transformer.py:147-170).
    """
    half = rotary_dim // 2
    theta = 1.0 / (base ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim))
    idx_theta = jnp.arange(seq_len, dtype=jnp.float32)[:, None] * theta[None, :]  # [T, half]
    idx_theta2 = jnp.concatenate([idx_theta, idx_theta], axis=1)  # [T, d]
    return jnp.cos(idx_theta2).astype(dtype), jnp.sin(idx_theta2).astype(dtype)


def apply_rope(x: jnp.ndarray, rotary_dim: int) -> jnp.ndarray:
    """Apply partial RoPE to [B, T, H, Dh] (rotates the first rotary_dim features).

    neg_half(x) = [-x[d/2:], x[:d/2]] (reference: diffusion_transformer.py:172-177).
    """
    cos, sin = rope_cache(x.shape[1], rotary_dim, dtype=x.dtype)
    x_rope, x_pass = x[..., :rotary_dim], x[..., rotary_dim:]
    half = rotary_dim // 2
    neg_half = jnp.concatenate([-x_rope[..., half:], x_rope[..., :half]], axis=-1)
    cs = cos[None, :, None, :]
    sn = sin[None, :, None, :]
    x_rope = x_rope * cs + neg_half * sn
    return jnp.concatenate([x_rope, x_pass], axis=-1)


def _rope_packed_cache(seq_len: int, n_heads: int, head_dim: int, rotary_dim: int, dtype):
    """Full-width cos/sin caches [T, H*D] for packed-layout RoPE: rotary dims
    carry the rope_cache values, pass-through dims carry (cos=1, sin=0)."""
    cos, sin = rope_cache(seq_len, rotary_dim)
    pad = head_dim - rotary_dim
    cosv = jnp.concatenate([cos, jnp.ones((seq_len, pad), jnp.float32)], axis=-1)
    sinv = jnp.concatenate([sin, jnp.zeros((seq_len, pad), jnp.float32)], axis=-1)
    return (
        jnp.tile(cosv, (1, n_heads)).astype(dtype),
        jnp.tile(sinv, (1, n_heads)).astype(dtype),
    )


def _rope_neg_half_matrix(n_heads: int, head_dim: int, rotary_dim: int) -> jnp.ndarray:
    """[H*D, H*D] signed permutation P with (x @ P) == neg_half(x) per head.

    Lets packed-layout RoPE run as x * cos + (x @ P) * sin — one MXU matmul
    instead of the slice/negate/concat chain, which XLA lowers to small-lane
    copies costing ~6% of inference device time (profiled on v5e at
    [64, 1024, 4x64]). Multiplying by a +/-1 permutation matrix is EXACT
    (every output column is +/- one input column), so this is bit-identical
    to apply_rope in any dtype.
    """
    import numpy as np

    half = rotary_dim // 2
    p = np.zeros((head_dim, head_dim), np.float32)
    for i in range(half):
        p[i + half, i] = -1.0  # out[i]        = -x[i + half]
        p[i, i + half] = 1.0   # out[i + half] =  x[i]
    # pass-through dims stay zero rows/cols: sin is 0 there
    return jnp.asarray(np.kron(np.eye(n_heads, dtype=np.float32), p))


def masked_sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Scaled dot-product attention. q/k/v: [B, T, H, Dh]; bias: [B, 1, Tq, Tk]."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if bias is not None:
        logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


class _DenseParams(nn.Module):
    """Bare dense weights with nn.Dense's exact param names/shapes/init —
    lets MultiHeadAttention feed them to the fused DiT-attention kernel
    without changing the checkpoint tree."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class MultiHeadAttention(nn.Module):
    """Self-attention with 1x1-conv projections and partial RoPE
    (reference: models/diffusion_transformer.py:33-81).

    Inference uses ops.attention.masked_attention (fused Pallas kernel on
    TPU); training with attention dropout uses the differentiable fused
    kernel on TPU (in-kernel PRNG dropout) or the einsum path elsewhere,
    matching torch SDPA's dropout_p (diffusion_transformer.py:77).

    `fused_pre=(x_resid, shift, scale, gate)` switches to the fully fused
    DiT-attention-half kernel (ops/dit_attention_pallas.py): LN + modulate +
    qkv + RoPE + attention + out-proj + gated residual in one kernel. The
    caller guarantees TPU + deterministic; x passed positionally is ignored
    except for shape.
    """

    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True, fused_pre=None,
                 params_only: bool = False):
        from stabletts_tpu.ops.attention import masked_attention
        from stabletts_tpu.ops.mask import attn_bias_from_mask

        b, t, _ = x.shape
        head_dim = self.channels // self.n_heads
        rotary_dim = int(head_dim * 0.5)

        wq, bq = _DenseParams(x.shape[-1], self.channels, name="conv_q")()
        wk, bk = _DenseParams(x.shape[-1], self.channels, name="conv_k")()
        wv, bv = _DenseParams(x.shape[-1], self.channels, name="conv_v")()

        if params_only:
            # whole-block fusion (ops/dit_block_pallas.py): the parent pulls
            # the weights and runs the kernel itself; identical param tree
            wo, bo = _DenseParams(self.channels, self.out_channels, name="conv_o")()
            return (wq, bq, wk, bk, wv, bv, wo, bo)

        if fused_pre is not None:
            from stabletts_tpu.ops.dit_attention_pallas import fused_dit_attention

            wo, bo = _DenseParams(self.channels, self.out_channels, name="conv_o")()
            x_resid, shift, scale, gate = fused_pre
            return fused_dit_attention(
                x_resid, shift, scale, gate, mask,
                wq, bq, wk, bk, wv, bv, wo, bo, n_heads=self.n_heads,
            )

        q = x @ wq + bq  # [B, T, C] packed-head
        k = x @ wk + bk
        v = (x @ wv + bv).reshape(b, t, self.n_heads, head_dim)

        # packed-layout RoPE: signed-permutation matmuls for neg_half
        # (bit-identical to apply_rope — see _rope_neg_half_matrix).
        # q and k are rotated SEPARATELY: stacking them into one [2B, T, C]
        # matmul (the round-1 formulation) cost ~8 ms/iteration in
        # concat/split/pad data movement at [64, 1024, 256] — more than the
        # tiny [.,256]x[256,256] matmul it saved (profiled round 3).
        cosv, sinv = _rope_packed_cache(t, self.n_heads, head_dim, rotary_dim, q.dtype)
        perm = _rope_neg_half_matrix(self.n_heads, head_dim, rotary_dim).astype(q.dtype)
        q = (q * cosv[None] + (q @ perm) * sinv[None]).reshape(b, t, self.n_heads, head_dim)
        k = (k * cosv[None] + (k @ perm) * sinv[None]).reshape(b, t, self.n_heads, head_dim)

        if deterministic:
            if (
                os.environ.get("STABLETTS_ATTN_LAYOUT") == "tminor"
                and _on_tpu()
                and t % 8 == 0
            ):
                # T-minor kernel variant: consumes/produces logical [B, C, T]
                # buffers == the FFN convs' preferred T-minor layout, so XLA
                # can elide the layout conversions at the custom-call
                # boundary (ops/attention_pallas_t.py)
                from stabletts_tpu.ops.attention_pallas_t import fused_attention_packed_t

                qT = jnp.swapaxes(q.reshape(b, t, self.channels), 1, 2)
                kT = jnp.swapaxes(k.reshape(b, t, self.channels), 1, 2)
                vT = jnp.swapaxes(v.reshape(b, t, self.channels), 1, 2)
                outT = fused_attention_packed_t(qT, kT, vT, mask, n_heads=self.n_heads)
                out = jnp.swapaxes(outT, 1, 2).reshape(b, t, self.n_heads, head_dim)
            else:
                # inference: the fast fused kernel (no VJP — must not be
                # reached by a training/backward trace, so the gate is
                # `deterministic`, NOT `p_dropout == 0`: training with
                # p_dropout=0.0 still needs a differentiable path)
                out = masked_attention(q, k, v, mask=mask)
        else:
            from stabletts_tpu.ops.attention import resolve_impl

            if resolve_impl(None, t) == "fused":
                # fused differentiable kernel with in-kernel dropout
                # (ops/attention_pallas_train.py) — the XLA path below
                # materializes [B,H,T,T] weights in HBM fwd AND bwd
                from stabletts_tpu.ops.attention_pallas_train import (
                    fused_attention_train,
                )

                rng = self.make_rng("dropout") if self.p_dropout > 0.0 else None
                out = fused_attention_train(
                    q.reshape(b, t, self.channels),
                    k.reshape(b, t, self.channels),
                    v.reshape(b, t, self.channels),
                    mask, self.p_dropout, rng, n_heads=self.n_heads,
                ).reshape(b, t, self.n_heads, head_dim)
            else:
                scale = 1.0 / math.sqrt(head_dim)
                logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
                if mask is not None:
                    logits = logits + attn_bias_from_mask(mask, dtype=logits.dtype)
                weights = jax.nn.softmax(logits, axis=-1)
                weights = nn.Dropout(self.p_dropout)(weights, deterministic=False)
                out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out.reshape(b, t, self.channels)
        wo, bo = _DenseParams(self.channels, self.out_channels, name="conv_o")()
        return out @ wo + bo


class _ConvParams(nn.Module):
    """Bare conv weights with nn.Conv's exact param names/shapes/init —
    so FFN can route them either through lax.conv (XLA path) or the fused
    Pallas kernel without changing the checkpoint tree."""

    kernel_shape: tuple  # (k, in, out)

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kernel_shape
        )
        bias = self.param("bias", nn.initializers.zeros, (self.kernel_shape[-1],))
        return kernel, bias


def _conv1d_same(x, kernel, bias):
    """nn.Conv-equivalent 1D conv: x [B,T,Cin], kernel [k,Cin,Cout].

    Stays lax.conv deliberately: a shifted-matmul formulation
    (ops/conv.py conv1d_same_dots) that keeps the hot loop row-major and
    removes XLA's conv-layout copies measured 4% SLOWER end-to-end on v5e
    (2736 vs 2851 audio-s/s) — the k dot intermediates cost more HBM traffic
    than the copies they remove. See DESIGN.md "Layout copies"."""
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding="SAME",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return y + bias


class FFN(nn.Module):
    """Conv-based feed-forward (kernel 3), SiLU, masked at every conv boundary
    (reference: models/diffusion_transformer.py:10-30).

    `fused_mods=(x_resid, shift, scale, gate)` switches to the fused Pallas
    kernel (ops/ffn_pallas.py) computing the whole DiT FFN half —
    LN + modulate + convs + gated residual — in one VMEM-resident kernel
    (TPU, deterministic only; the caller handles that gating)."""

    out_channels: int
    filter_channels: int
    kernel_size: int = 3
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True, fused_mods=None,
                 params_only: bool = False):
        in_ch = x.shape[-1]
        w1, b1 = _ConvParams((self.kernel_size, in_ch, self.filter_channels), name="conv_1")()
        w2, b2 = _ConvParams((self.kernel_size, self.filter_channels, self.out_channels), name="conv_2")()
        if params_only:
            return (w1, b1, w2, b2)
        if fused_mods is not None:
            from stabletts_tpu.ops.ffn_pallas import fused_adaln_ffn

            x_resid, shift, scale, gate = fused_mods
            return fused_adaln_ffn(x_resid, shift, scale, gate, mask, w1, b1, w2, b2)
        m = mask.astype(x.dtype)[..., None]  # keep bf16 activations bf16
        # training FFN impl experiment (r5): shifted-dots keeps fwd+bwd
        # row-major (no conv-grad layouts); measure with
        # STABLETTS_TRAIN_FFN=dots — see DESIGN.md
        conv = _conv1d_same
        if os.environ.get("STABLETTS_TRAIN_FFN") == "dots":
            from stabletts_tpu.ops.conv import conv1d_same_dots

            conv = conv1d_same_dots
        x = conv(x * m, w1, b1)
        x = nn.silu(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = conv(x * m, w2, b2)
        return x * m


class DiTConVBlock(nn.Module):
    """DiT block with adaLN-Zero conditioning and conv FFN
    (reference: models/diffusion_transformer.py:84-122)."""

    hidden_channels: int
    filter_channels: int
    num_heads: int
    kernel_size: int = 3
    p_dropout: float = 0.1
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, c, mask, deterministic: bool = True):
        """x: [B, T, C], c: [B, gin], mask: [B, T] -> [B, T, C]."""
        m = mask.astype(x.dtype)[..., None]  # f32 mask would upcast bf16
        x = x * m

        h = c
        if self.gin_channels != self.hidden_channels:
            h = nn.Dense(self.hidden_channels, name="adaLN_proj")(h)
        h = nn.silu(h)
        # zero-init: adaLN-Zero makes the block the identity at init
        mod = nn.Dense(
            6 * self.hidden_channels,
            name="adaLN_modulation",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(h)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
            mod[:, None, :], 6, axis=-1
        )  # each [B, 1, C]

        # dtype=x.dtype: keep bf16 activations bf16 downstream of the norm
        # (stats are still computed in f32 internally); flax's default would
        # upcast the output to f32 and silently drag the whole block — QKV
        # projections, the [B,H,T,T] attention logits, the FFN — to f32.
        norm1 = nn.LayerNorm(use_scale=False, use_bias=False, epsilon=1e-5, dtype=x.dtype, name="norm1")
        norm2 = nn.LayerNorm(use_scale=False, use_bias=False, epsilon=1e-5, dtype=x.dtype, name="norm2")

        attn = MultiHeadAttention(
            self.hidden_channels, self.hidden_channels, self.num_heads, self.p_dropout, name="attn"
        )
        mlp = FFN(
            self.hidden_channels, self.filter_channels, self.kernel_size, self.p_dropout, name="mlp"
        )

        # Whole-half fusion measured NEUTRAL end-to-end on v5e (2940 vs 2952
        # audio-s/s): the per-batch-element qkv matmuls ([1024,256]x[256,256]
        # per grid cell) lose what the removed layout copies gain vs XLA's
        # batched [B*T,256] projections. Opt-in for future shapes where the
        # trade flips (e.g. longer T); the packed-head attention kernel
        # (ops/attention_pallas.py, reached via masked_attention below)
        # remains the measured-best default.
        # DEFAULT ON since round 4: at the bench operating point
        # [B=64, T=1000] the fused half measures 3519-3582 audio-s/s vs
        # 3332-3372 for the separate-ops path (repeated runs) — the round-2
        # "neutral at B=32" verdict flipped at larger batch. Opt out with
        # STABLETTS_DIT_FUSED=0.
        fuse_halves = (
            os.environ.get("STABLETTS_DIT_FUSED", "1") == "1"
            and _on_tpu()  # the kernel has no interpret fallback here
            and deterministic
            and x.shape[1] % 8 == 0
            and not self.is_initializing()
        )
        # whole-BLOCK fusion: both halves in one launch — one HBM round
        # trip of x per block and half the kernel launches in the ODE loop
        # (ops/dit_block_pallas.py). A/B vs the two-half path (3 interleaved
        # bench pairs, B=64): 3480/3636/3646 vs 3582/3554/3575 audio-s/s —
        # slightly ahead on mean, clearly ahead on best, never behind by
        # more than run-to-run noise. Opt out with STABLETTS_DIT_BLOCK=0.
        if (
            fuse_halves
            and os.environ.get("STABLETTS_DIT_BLOCK", "1") == "1"
            and self.kernel_size == 3
        ):
            from stabletts_tpu.ops.dit_block_pallas import fused_dit_block

            aw = attn(x, mask, deterministic, params_only=True)
            fw = mlp(x, mask, deterministic, params_only=True)
            return fused_dit_block(
                x,
                (shift_msa[:, 0, :], scale_msa[:, 0, :], gate_msa[:, 0, :],
                 shift_mlp[:, 0, :], scale_mlp[:, 0, :], gate_mlp[:, 0, :]),
                mask, *aw, *fw, n_heads=self.num_heads,
            )
        if fuse_halves:
            # one kernel for the whole attention half: LN + modulate + qkv +
            # RoPE + attention + out-proj + gated residual
            # (ops/dit_attention_pallas.py)
            x = attn(
                x, mask, deterministic,
                fused_pre=(x, shift_msa[:, 0, :], scale_msa[:, 0, :], gate_msa[:, 0, :]),
            )
        elif (
            not deterministic
            and os.environ.get("STABLETTS_ATTN_TRAIN", "fused") == "fused"
            and _on_tpu()
            and x.shape[1] % 8 == 0
            and not self.is_initializing()
        ):
            # r5: differentiable fused attention half (custom VJP, in-kernel
            # dropout, cross-batch projection-grad accumulation) — with the
            # fused FFN half below, both block halves run as single Pallas
            # kernels in training too (ops/dit_attention_pallas_train.py).
            # Opt out with STABLETTS_ATTN_TRAIN=xla.
            from stabletts_tpu.ops.dit_attention_pallas_train import (
                fused_dit_attention_train,
            )

            aw = attn(x, mask, deterministic, params_only=True)
            rng = self.make_rng("dropout") if self.p_dropout > 0.0 else None
            x = fused_dit_attention_train(
                x, shift_msa[:, 0, :], scale_msa[:, 0, :], gate_msa[:, 0, :],
                mask, *aw, n_heads=self.num_heads,
                dropout_rate=self.p_dropout, rng=rng,
            )
        else:
            x = x + gate_msa * attn(
                _modulate(norm1(x), shift_msa, scale_msa), mask, deterministic
            ) * m

        # DEFAULT ON since round 4 (opt out with STABLETTS_FFN_IMPL=xla):
        # alone it measured 3215 audio-s/s (worse than 3363 baseline), but
        # combined with the fused attention half it is the best measured
        # configuration — 3556/3583 vs 3477-3565 for attention-half-only
        # (repeated bench runs at [B=64, T=1000] bf16). With both halves
        # fused the block never leaves Pallas custom calls, so XLA's
        # T-minor conv layouts (and their boundary copies) disappear.
        if (
            os.environ.get("STABLETTS_FFN_IMPL", "fused") == "fused"
            and _on_tpu()  # the kernel has no interpret fallback here
            and deterministic
            and x.shape[1] % 8 == 0
            and self.kernel_size == 3  # the fused kernel hard-codes 3 taps
            and not self.is_initializing()
        ):
            # fused LN+modulate+FFN+gated-residual kernel (TPU inference)
            x = mlp(
                x, mask, deterministic,
                fused_mods=(
                    x, shift_mlp[:, 0, :], scale_mlp[:, 0, :], gate_mlp[:, 0, :]
                ),
            )
        elif (
            not deterministic
            and os.environ.get("STABLETTS_FFN_TRAIN", "fused") == "fused"
            and _on_tpu()
            and x.shape[1] % 8 == 0
            and self.kernel_size == 3
            and not self.is_initializing()
        ):
            # r5: differentiable fused FFN half with in-kernel dropout
            # (ops/ffn_pallas_train.py) — XLA's conv-grad fusions run ~3x
            # off the MXU floor at [32,1024,256<->1024]; measured step
            # numbers in DESIGN.md. Opt out with STABLETTS_FFN_TRAIN=xla.
            from stabletts_tpu.ops.ffn_pallas_train import fused_adaln_ffn_train

            fw = mlp(x, mask, deterministic, params_only=True)
            rng = (
                self.make_rng("dropout") if self.p_dropout > 0.0 else None
            )
            x = fused_adaln_ffn_train(
                x, shift_mlp[:, 0, :], scale_mlp[:, 0, :], gate_mlp[:, 0, :],
                mask, *fw, dropout_rate=self.p_dropout, rng=rng,
            )
        else:
            x = x + gate_mlp * mlp(
                _modulate(norm2(x), shift_mlp, scale_mlp), mask, deterministic
            )
        return x


def _modulate(x, shift, scale):
    return x * (1 + scale) + shift


class FiLMLayer(nn.Module):
    """Feature-wise linear modulation of x by a conditioning vector
    (reference: models/estimator.py:20-33)."""

    in_channels: int

    @nn.compact
    def __call__(self, x, c):
        """x: [B, T, C], c: [B, cond] -> gamma * x + beta."""
        gb = nn.Dense(2 * self.in_channels, name="film")(c)[:, None, :]
        gamma, beta = jnp.split(gb, 2, axis=-1)
        return gamma * x + beta


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    """[B] timesteps -> [B, dim] sinusoidal embedding
    (reference: models/estimator.py:35-49)."""
    half_dim = dim // 2
    emb = math.log(10000.0) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    args = scale * t.astype(jnp.float32)[:, None] * freqs[None, :]
    # compute in f32 (sin/cos of large args), return in the caller's dtype so a
    # bf16 network is not promoted to f32 through the FiLM conditioning chain
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1).astype(t.dtype)


class TimestepEmbedding(nn.Module):
    """MLP over the sinusoidal embedding (reference: models/estimator.py:51-62)."""

    out_channels: int
    filter_channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.filter_channels, name="layer_0")(x)
        x = nn.silu(x)
        return nn.Dense(self.out_channels, name="layer_2")(x)
