"""Attention dispatch: fused packed-head Pallas kernel (TPU default), XLA
einsum (CPU default / full-bias fallback), stock jax flash (comparison).

The DiT attention at T≈1000 is the inference hot spot and is HBM-bound in
the einsum formulation (the [B, H, T, T] logits tensor is materialized).
The packed-head kernel in ops/attention_pallas.py consumes the projections'
native [B, T, H*D] layout (no transposes), keeps score tiles in VMEM, and
lifts the end-to-end synthesis bench ~38% on v5e — see that module and
docs/DESIGN.md for the measurements; ops/attention_pallas_train.py is its
differentiable + dropout counterpart used by the training path.

Padding semantics (all paths): padded/invalid KEY positions are excluded;
outputs at padded QUERY positions are garbage and must be masked by the
caller (all call sites already do).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

import os

_DEFAULT_IMPL = os.environ.get("STABLETTS_ATTN_IMPL", "auto")
_FLASH_BLOCK = 512
# below one 128-row lane tile the fused kernel is mostly padding compute;
# auto mode falls back to the XLA einsum path there
_FUSED_MIN_T = 128


def set_default_impl(impl: str) -> None:
    """Set the process-wide default attention implementation:
    'auto' | 'xla' | 'flash' | 'fused'."""
    global _DEFAULT_IMPL
    assert impl in ("auto", "xla", "flash", "fused")
    _DEFAULT_IMPL = impl


def resolve_impl(impl: Optional[str], seq_len: int) -> str:
    impl = impl or _DEFAULT_IMPL
    if impl != "auto":
        return impl
    # Measured on TPU v5e at [32, 1000, 4, 64] bf16: the packed-head Pallas
    # kernel (attention_pallas.py) is ~3x faster than the einsum path in
    # isolation (0.61 vs 1.82 ms) and lifts the end-to-end synthesis bench
    # 35% (2752 vs 2035 audio-s/s/chip), so it is the TPU default. CPU (and
    # any non-TPU backend) keeps the einsum path — Pallas TPU kernels don't
    # run there. Override via STABLETTS_ATTN_IMPL={xla,flash,fused}.
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    return "fused" if platform == "tpu" and seq_len >= _FUSED_MIN_T else "xla"


# back-compat private alias
_resolve_impl = resolve_impl


def _xla_attention(q, k, v, bias):
    """q/k/v: [B, T, H, D]; bias: [B, 1, Tq, Tk] additive or None."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if bias is not None:
        logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def _flash_attention(q, k, v, mask):
    """q/k/v: [B, T, H, D]; mask: [B, T] validity or None."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, t, h, d = q.shape
    scale = 1.0 / math.sqrt(d)
    t_pad = -(-t // _FLASH_BLOCK) * _FLASH_BLOCK

    def to_bhtd(x):
        x = jnp.swapaxes(x, 1, 2)  # [B, H, T, D]
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
        return x

    qb, kb, vb = to_bhtd(q), to_bhtd(k), to_bhtd(v)

    seg = None
    if mask is not None or t_pad != t:
        valid = jnp.ones((b, t), jnp.int32) if mask is None else (mask > 0).astype(jnp.int32)
        if t_pad != t:
            valid = jnp.pad(valid, ((0, 0), (0, t_pad - t)))
        seg = SegmentIds(q=valid, kv=valid)

    block = min(_FLASH_BLOCK, t_pad)
    sizes = BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block,
        block_k_dkv=block, block_q_dkv=block,
        block_k_major_dq=block, block_k_dq=block, block_q_dq=block,
    )
    out = flash_attention(
        qb, kb, vb, segment_ids=seg, causal=False, sm_scale=scale, block_sizes=sizes
    )
    out = jnp.swapaxes(out, 1, 2)  # [B, T_pad, H, D]
    return out[:, :t]


def masked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Self/cross attention on [B, T, H, D] inputs.

    Provide either `mask` ([B, T] validity — used by both paths) or a full
    additive `bias` ([B, 1, Tq, Tk] — forces the XLA path).
    """
    resolved = resolve_impl(impl, q.shape[1])
    if resolved == "fused" and bias is None and q.shape[1] == k.shape[1]:
        from stabletts_tpu.ops.attention_pallas import fused_attention

        # NOTE: read at TRACE time — changing it after a jitted caller has
        # compiled has no effect (same caveat as STABLETTS_ATTN_LAYOUT)
        raw = os.environ.get("STABLETTS_ATTN_BLK", "512")
        try:
            blk = int(raw)
        except ValueError:
            raise ValueError(
                f"STABLETTS_ATTN_BLK must be an integer >= 128, got {raw!r}"
            ) from None
        return fused_attention(q, k, v, mask, blk_q=blk)
    if resolved == "flash" and bias is None and q.shape[1] == k.shape[1]:
        return _flash_attention(q, k, v, mask)
    if bias is None and mask is not None:
        from stabletts_tpu.ops.mask import attn_bias_from_mask

        bias = attn_bias_from_mask(mask, dtype=q.dtype)
    return _xla_attention(q, k, v, bias)
