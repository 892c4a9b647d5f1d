"""Differentiable fused Pallas TPU kernel for the DiT block's ATTENTION half.

Training counterpart of ops/dit_attention_pallas.py, completing VERDICT r4
#4: with ops/ffn_pallas_train.py, BOTH halves of the DiT block now run as
single custom-VJP kernels in training. Per batch element, per launch:

    h        = modulate(LN(x), shift, scale)        # LN: no affine, f32
    q, k, v  = h @ Wq + bq, h @ Wk + bk, h @ Wv + bv
    qr, kr   = partial_rope(q), partial_rope(k)     # rotary_dim = D/2
    att      = dropout(softmax(qr kr^T / sqrt(D) + bias)) v   # per head
    out      = x + gate * (att @ Wo + bo) * mask

The hand-written backward recomputes h/q/k/v and the per-head softmax in
VMEM (flash-style recompute, same as ops/attention_pallas_train.py), then
emits dx, d{shift,scale,gate}, and all eight projection grads in ONE
launch; dW/db accumulate across batch grid cells into revisited f32
blocks. Dropout keep-masks regenerate from a per-cell PRNG seed with heads
consuming bits in a fixed order, so no [B,H,T,T] mask is stored.

RoPE backward: the neg-half map P is a signed permutation with P^T = -P,
so with q_r = q*cos + P(q)*sin the adjoint is dq = dq_r*cos - P(dq_r*sin)
— implemented with the same two lane rolls as the forward.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stabletts_tpu.ops.dit_attention_pallas import _rope_packed, _rope_tables


def _keep_mask(shape, rate: float):
    bits = pltpu.prng_random_bits(shape)
    u = pltpu.bitcast(bits, jnp.uint32)
    thresh = jnp.uint32(min(int(rate * float(2**32)), 2**32 - 1))
    return (u >= thresh).astype(jnp.float32)


def _rope_packed_t(dy, cosc, sinc, half, head_dim):
    """Adjoint of _rope_packed: dq = dy*cos - P(dy*sin).

    The sin multiply happens BEFORE the lane rolls here (the forward
    multiplies after), so rolled values from rotary lanes would land on
    pass-through lanes — the adjoint must be explicitly zeroed outside
    the rotary lanes (the forward gets that for free from sinc == 0)."""
    c = dy.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, dy.shape, 1) % head_dim
    dyf = dy.astype(jnp.float32)
    ds = dyf * sinc
    fwd = pltpu.roll(ds, half, 1)        # lane l <- ds[l - half]
    bwd = pltpu.roll(ds, c - half, 1)    # lane l <- ds[l + half]
    # -P(z) with P(z) = where(lane < half, -z[l+half], z[l-half])
    pt = jnp.where(lane < half, bwd, -fwd)
    pt = jnp.where(lane < 2 * half, pt, 0.0)
    return (dyf * cosc + pt).astype(dy.dtype)


def _recompute(x, mod_ref, w_refs, cos_ref, sin_ref, eps, head_dim, rotary_dim):
    """Shared forward math up to rope'd q/k and v. Returns intermediates."""
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref = w_refs
    shift = mod_ref[0, 0:1, :].astype(jnp.float32)
    scale = mod_ref[0, 1:2, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    n = (xf - mu) * rstd
    h = (n * (1.0 + scale) + shift).astype(x.dtype)
    q = jnp.dot(h, wq_ref[:], preferred_element_type=jnp.float32) + bq_ref[:][None, :]
    k = jnp.dot(h, wk_ref[:], preferred_element_type=jnp.float32) + bk_ref[:][None, :]
    v = (jnp.dot(h, wv_ref[:], preferred_element_type=jnp.float32)
         + bv_ref[:][None, :]).astype(x.dtype)
    half = rotary_dim // 2
    qr = _rope_packed(q.astype(x.dtype), cos_ref[:], sin_ref[:], half, head_dim)
    kr = _rope_packed(k.astype(x.dtype), cos_ref[:], sin_ref[:], half, head_dim)
    return xf, n, rstd, scale, h, qr, kr, v


def _head_attn(qr, kr, v, bias, sl, scale_a, rate):
    """One head's dropout(softmax) @ v with f32 stats; returns
    (att_h, p, keep, denom-normalized pieces for backward reuse)."""
    s = jax.lax.dot_general(
        qr[:, sl], kr[:, sl], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale_a + bias
    mx = jnp.max(s, axis=-1, keepdims=True)
    w = jnp.exp(s - mx)
    denom = jnp.sum(w, axis=-1, keepdims=True)
    p = w / denom
    if rate > 0.0:
        keep = _keep_mask(w.shape, rate) * (1.0 / (1.0 - rate))
        pd = p * keep
    else:
        keep = None
        pd = p
    att = jnp.dot(pd.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32)
    return att, p, keep


def _fwd_kernel(seed_ref, x_ref, mod_ref, mask_ref, bias_ref, cos_ref, sin_ref,
                wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                o_ref, *, n_heads, head_dim, rotary_dim, eps, rate):
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    x = x_ref[0]
    gate = mod_ref[0, 2:3, :].astype(jnp.float32)
    m = jnp.transpose(mask_ref[0])
    bias = bias_ref[0]
    xf, _, _, _, h, qr, kr, v = _recompute(
        x, mod_ref, (wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref),
        cos_ref, sin_ref, eps, head_dim, rotary_dim,
    )
    scale_a = 1.0 / math.sqrt(head_dim)
    outs = []
    for hh in range(n_heads):
        sl = slice(hh * head_dim, (hh + 1) * head_dim)
        att, _, _ = _head_attn(qr, kr, v, bias, sl, scale_a, rate)
        outs.append(att)
    att = jnp.concatenate(outs, axis=-1).astype(x.dtype)
    z = jnp.dot(att, wo_ref[:], preferred_element_type=jnp.float32) + bo_ref[:][None, :]
    o_ref[0] = (xf + gate * z * m).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, mod_ref, mask_ref, bias_ref, cos_ref, sin_ref,
                wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
                do_ref,
                dx_ref, dmod_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
                dwv_ref, dbv_ref, dwo_ref, dbo_ref,
                *, n_heads, head_dim, rotary_dim, eps, rate):
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                  dwo_ref, dbo_ref):
            r[:] = jnp.zeros_like(r)

    x = x_ref[0]
    in_dtype = x.dtype
    gate = mod_ref[0, 2:3, :].astype(jnp.float32)
    m = jnp.transpose(mask_ref[0])
    bias = bias_ref[0]
    do = do_ref[0].astype(jnp.float32)

    xf, n, rstd, scale, h, qr, kr, v = _recompute(
        x, mod_ref, (wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref),
        cos_ref, sin_ref, eps, head_dim, rotary_dim,
    )
    scale_a = 1.0 / math.sqrt(head_dim)

    # forward tail recompute + output-projection backward
    atts = []
    heads = []
    for hh in range(n_heads):
        sl = slice(hh * head_dim, (hh + 1) * head_dim)
        att, p, keep = _head_attn(qr, kr, v, bias, sl, scale_a, rate)
        atts.append(att)
        heads.append((p, keep))
    att = jnp.concatenate(atts, axis=-1).astype(in_dtype)
    z = jnp.dot(att, wo_ref[:], preferred_element_type=jnp.float32) + bo_ref[:][None, :]

    dgate = jnp.sum(do * z * m, axis=0, keepdims=True)
    dz = (do * gate * m).astype(in_dtype)
    dwo_ref[:] += jax.lax.dot_general(
        att, dz, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbo_ref[:] += jnp.sum(dz.astype(jnp.float32), axis=0)
    datt = jnp.dot(dz, jnp.transpose(wo_ref[:]), preferred_element_type=jnp.float32)

    dqrs, dkrs, dvs = [], [], []
    for hh in range(n_heads):
        sl = slice(hh * head_dim, (hh + 1) * head_dim)
        p, keep = heads[hh]
        pd = p * keep if rate > 0.0 else p
        datt_h = datt[:, sl].astype(in_dtype)
        dvs.append(jax.lax.dot_general(
            pd.astype(in_dtype), datt_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        dpd = jax.lax.dot_general(
            datt_h, v[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = dpd * keep if rate > 0.0 else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds.astype(in_dtype)
        dqrs.append(jnp.dot(ds, kr[:, sl], preferred_element_type=jnp.float32) * scale_a)
        dkrs.append(jax.lax.dot_general(
            ds, qr[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale_a)
    dqr = jnp.concatenate(dqrs, axis=-1).astype(in_dtype)
    dkr = jnp.concatenate(dkrs, axis=-1).astype(in_dtype)
    dv = jnp.concatenate(dvs, axis=-1).astype(in_dtype)

    half = rotary_dim // 2
    dq = _rope_packed_t(dqr, cos_ref[:], sin_ref[:], half, head_dim)
    dk = _rope_packed_t(dkr, cos_ref[:], sin_ref[:], half, head_dim)

    # projection backward: dh = Σ dproj @ W^T ; dW += h^T @ dproj
    dh = jnp.dot(dq, jnp.transpose(wq_ref[:]), preferred_element_type=jnp.float32)
    dh += jnp.dot(dk, jnp.transpose(wk_ref[:]), preferred_element_type=jnp.float32)
    dh += jnp.dot(dv, jnp.transpose(wv_ref[:]), preferred_element_type=jnp.float32)
    for dw_ref, db_ref, dproj in (
        (dwq_ref, dbq_ref, dq), (dwk_ref, dbk_ref, dk), (dwv_ref, dbv_ref, dv),
    ):
        dw_ref[:] += jax.lax.dot_general(
            h, dproj, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        db_ref[:] += jnp.sum(dproj.astype(jnp.float32), axis=0)

    # modulate + LN backward (no affine LN; same math as ffn_pallas_train)
    dh0 = dh
    dshift = jnp.sum(dh0, axis=0, keepdims=True)
    dscale = jnp.sum(dh0 * n, axis=0, keepdims=True)
    dn = dh0 * (1.0 + scale)
    c = x.shape[-1]
    dn_mean = jnp.sum(dn, axis=-1, keepdims=True) * (1.0 / c)
    dnn_mean = jnp.sum(dn * n, axis=-1, keepdims=True) * (1.0 / c)
    dx_ln = (dn - dn_mean - n * dnn_mean) * rstd
    dx_ref[0] = (do + dx_ln).astype(dx_ref.dtype)
    dmod_ref[0] = jnp.concatenate([dshift, dscale, dgate], axis=0).astype(
        dmod_ref.dtype
    )


def _specs(b, t, c):
    full = lambda s: pl.BlockSpec(s, lambda bi: tuple(0 for _ in s), memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, t, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 3, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, t), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    return full, xspec, mspec, kspec


_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16))
def _attn_core(x, mod, maskf, kbias, cosc, sinc, wq, bq, wk, bk, wv, bv,
               wo_bo, n_heads, rate, eps, interpret, seed):
    out, _ = _attn_fwd(x, mod, maskf, kbias, cosc, sinc, wq, bq, wk, bk,
                       wv, bv, wo_bo, n_heads, rate, eps, interpret, seed)
    return out


def _call_args(b, t, c, interpret, n_heads, head_dim, rotary_dim, rate, eps):
    full, xspec, mspec, kspec = _specs(b, t, c)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        xspec, mspec, kspec, kspec,
        full((t, c)), full((t, c)),
        full((c, c)), full((c,)), full((c, c)), full((c,)),
        full((c, c)), full((c,)), full((c, c)), full((c,)),
    ]
    kw = dict(n_heads=n_heads, head_dim=head_dim, rotary_dim=rotary_dim,
              eps=eps, rate=rate)
    return full, xspec, mspec, in_specs, kw


def _attn_fwd(x, mod, maskf, kbias, cosc, sinc, wq, bq, wk, bk, wv, bv,
              wo_bo, n_heads, rate, eps, interpret, seed):
    wo, bo = wo_bo
    b, t, c = x.shape
    head_dim = c // n_heads
    rotary_dim = int(head_dim * 0.5)
    full, xspec, mspec, in_specs, kw = _call_args(
        b, t, c, interpret, n_heads, head_dim, rotary_dim, rate, eps)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, **kw),
        grid=(b,),
        in_specs=in_specs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * c * 4 * c + 4 * b * n_heads * t * t * head_dim,
            bytes_accessed=2 * b * t * c * x.dtype.itemsize,
            transcendentals=b * n_heads * t * t,
        ),
        interpret=interpret,
    )(seed, x, mod, maskf, kbias, cosc, sinc, wq, bq, wk, bk, wv, bv, wo, bo)
    return out, (x, mod, maskf, kbias, cosc, sinc, wq, bq, wk, bk, wv, bv,
                 wo, bo, seed)


def _attn_bwd(n_heads, rate, eps, interpret, res, do):
    (x, mod, maskf, kbias, cosc, sinc, wq, bq, wk, bk, wv, bv, wo, bo,
     seed) = res
    b, t, c = x.shape
    head_dim = c // n_heads
    rotary_dim = int(head_dim * 0.5)
    full, xspec, mspec, in_specs, kw = _call_args(
        b, t, c, interpret, n_heads, head_dim, rotary_dim, rate, eps)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, **kw),
        grid=(b,),
        in_specs=in_specs + [xspec],
        out_specs=(
            xspec, mspec,
            full((c, c)), full((c,)), full((c, c)), full((c,)),
            full((c, c)), full((c,)), full((c, c)), full((c,)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, c), x.dtype),
            jax.ShapeDtypeStruct((b, 3, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * (2 * b * t * c * 4 * c + 4 * b * n_heads * t * t * head_dim),
            bytes_accessed=4 * b * t * c * x.dtype.itemsize,
            transcendentals=2 * b * n_heads * t * t,
        ),
        interpret=interpret,
    )(seed, x, mod, maskf, kbias, cosc, sinc, wq, bq, wk, bk, wv, bv, wo, bo,
      do)
    dx, dmod, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo = outs
    return (dx, dmod.astype(mod.dtype), None, None, None, None,
            dwq.astype(wq.dtype), dbq.astype(bq.dtype),
            dwk.astype(wk.dtype), dbk.astype(bk.dtype),
            dwv.astype(wv.dtype), dbv.astype(bv.dtype),
            (dwo.astype(wo.dtype), dbo.astype(bo.dtype)), None)


_attn_core.defvjp(_attn_fwd, _attn_bwd)


def fused_dit_attention_train(x, shift, scale, gate, mask,
                              wq, bq, wk, bk, wv, bv, wo, bo,
                              n_heads: int = 4, dropout_rate: float = 0.0,
                              rng=None, eps: float = 1e-5,
                              interpret: bool = False):
    """Differentiable fused DiT attention half. x: [B, T, C];
    shift/scale/gate: [B, C]; mask: [B, T] key validity (1 = valid);
    dense params [C, C]/[C].

    Returns x + gate * out_proj(attn(rope(qkv(mod(LN(x)))))) * mask,
    differentiable in x, the modulation vectors, and all projections.
    dropout_rate > 0 requires `rng`; the backward regenerates the same
    attention-weight dropout from a scalar seed. T must be a multiple of 8.
    """
    b, t, c = x.shape
    head_dim = c // n_heads
    rotary_dim = int(head_dim * 0.5)
    mod = jnp.stack([shift, scale, gate], axis=1)
    maskf = mask.astype(jnp.float32)[:, None, :]
    kbias = jnp.where(mask > 0, 0.0, _NEG).astype(jnp.float32)[:, None, :]
    cosc, sinc = _rope_tables(t, c, n_heads, head_dim, rotary_dim)
    if dropout_rate > 0.0:
        assert rng is not None, "dropout_rate > 0 requires an rng key"
        seed = jax.random.randint(rng, (1,), 0, jnp.iinfo(jnp.int32).max,
                                  jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    return _attn_core(x, mod, maskf, kbias, cosc, sinc, wq, bq, wk, bk,
                      wv, bv, (wo, bo), n_heads, float(dropout_rate), eps,
                      interpret, seed)
