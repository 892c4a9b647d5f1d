"""Differentiable fused Pallas TPU kernel for the estimator's mu prenet.

The prenet (reference: models/estimator.py:83-89) is three k=3 convs with
SiLU between them at filter width 1024:

    out = conv_c(silu(conv_b(silu(conv_a(mu)))))      # 128->1024->1024->256

After round 5 fused both DiT halves, this chain became the largest
XLA-side item in the train-step profile (~7 ms of 59 ms device: the
[3,1024,1024] weight-grad fusion alone is 3.5 ms, plus T-minor layout
fusions around every conv). This kernel runs the whole chain — forward
and hand-written backward (dmu, all six conv params, cross-batch
accumulated) — as one launch per direction, with the [T,1024]
intermediates VMEM-resident. Same structure as ops/ffn_pallas_train.py;
no dropout, no LN, unmasked (matching the reference's unmasked prenet).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stabletts_tpu.ops.ffn_pallas import _conv3, _shift_down, _shift_up


def _conv3_t(dz, w):
    """Adjoint of _conv3 wrt its input: dh = shift_up(dz)@w0^T + dz@w1^T
    + shift_down(dz)@w2^T (f32)."""
    dh = jnp.dot(dz, jnp.transpose(w[1]), preferred_element_type=jnp.float32)
    dh += jnp.dot(_shift_up(dz), jnp.transpose(w[0]),
                  preferred_element_type=jnp.float32)
    dh += jnp.dot(_shift_down(dz), jnp.transpose(w[2]),
                  preferred_element_type=jnp.float32)
    return dh


def _dw_acc(dw_ref, db_ref, h, dz):
    dw_ref[0] += jax.lax.dot_general(
        _shift_down(h), dz, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw_ref[1] += jax.lax.dot_general(
        h, dz, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dw_ref[2] += jax.lax.dot_general(
        _shift_up(h), dz, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(dz.astype(jnp.float32), axis=0)


def _fwd_kernel(mu_ref, wa_ref, ba_ref, wb_ref, bb_ref, wc_ref, bc_ref,
                o_ref):
    mu = mu_ref[0]
    y1 = _conv3(mu, wa_ref[:], ba_ref[:])
    h1 = jax.nn.silu(y1).astype(mu.dtype)
    y2 = _conv3(h1, wb_ref[:], bb_ref[:])
    h2 = jax.nn.silu(y2).astype(mu.dtype)
    o_ref[0] = _conv3(h2, wc_ref[:], bc_ref[:]).astype(o_ref.dtype)


def _silu_bwd(y, d):
    sig = jax.nn.sigmoid(y)
    return d * (sig * (1.0 + y * (1.0 - sig)))


def _bwd_kernel(mu_ref, wa_ref, ba_ref, wb_ref, bb_ref, wc_ref, bc_ref,
                do_ref,
                dmu_ref, dwa_ref, dba_ref, dwb_ref, dbb_ref, dwc_ref,
                dbc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dwa_ref, dba_ref, dwb_ref, dbb_ref, dwc_ref, dbc_ref):
            r[:] = jnp.zeros_like(r)

    mu = mu_ref[0]
    in_dtype = mu.dtype
    do = do_ref[0].astype(in_dtype)
    # recompute
    y1 = _conv3(mu, wa_ref[:], ba_ref[:])
    h1 = jax.nn.silu(y1).astype(in_dtype)
    y2 = _conv3(h1, wb_ref[:], bb_ref[:])
    h2 = jax.nn.silu(y2).astype(in_dtype)
    # backward
    _dw_acc(dwc_ref, dbc_ref, h2, do)
    dh2 = _conv3_t(do, wc_ref[:])
    dy2 = _silu_bwd(y2, dh2).astype(in_dtype)
    _dw_acc(dwb_ref, dbb_ref, h1, dy2)
    dh1 = _conv3_t(dy2, wb_ref[:])
    dy1 = _silu_bwd(y1, dh1).astype(in_dtype)
    _dw_acc(dwa_ref, dba_ref, mu, dy1)
    dmu_ref[0] = _conv3_t(dy1, wa_ref[:]).astype(dmu_ref.dtype)


def _specs(b, t, cin, f, cout):
    full = lambda s: pl.BlockSpec(s, lambda bi: tuple(0 for _ in s), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, t, cin), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, t, cout), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    wspecs = [
        full((3, cin, f)), full((f,)),
        full((3, f, f)), full((f,)),
        full((3, f, cout)), full((cout,)),
    ]
    return full, mspec, ospec, wspecs


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _prenet_core(mu, wa, ba, wb, bb, wc, bc, interpret):
    out, _ = _prenet_fwd(mu, wa, ba, wb, bb, wc, bc, interpret)
    return out


def _prenet_fwd(mu, wa, ba, wb, bb, wc, bc, interpret):
    b, t, cin = mu.shape
    f = wa.shape[-1]
    cout = wc.shape[-1]
    full, mspec, ospec, wspecs = _specs(b, t, cin, f, cout)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(b,),
        in_specs=[mspec] + wspecs,
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((b, t, cout), mu.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * 3 * (cin * f + f * f + f * cout),
            bytes_accessed=b * t * (cin + cout) * mu.dtype.itemsize,
            transcendentals=2 * b * t * f,
        ),
        interpret=interpret,
    )(mu, wa, ba, wb, bb, wc, bc)
    return out, (mu, wa, ba, wb, bb, wc, bc)


def _prenet_bwd(interpret, res, do):
    mu, wa, ba, wb, bb, wc, bc = res
    b, t, cin = mu.shape
    f = wa.shape[-1]
    cout = wc.shape[-1]
    full, mspec, ospec, wspecs = _specs(b, t, cin, f, cout)
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(b,),
        in_specs=[mspec] + wspecs + [ospec],
        out_specs=(
            mspec,
            full((3, cin, f)), full((f,)),
            full((3, f, f)), full((f,)),
            full((3, f, cout)), full((cout,)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, cin), mu.dtype),
            jax.ShapeDtypeStruct((3, cin, f), jnp.float32),
            jax.ShapeDtypeStruct((f,), jnp.float32),
            jax.ShapeDtypeStruct((3, f, f), jnp.float32),
            jax.ShapeDtypeStruct((f,), jnp.float32),
            jax.ShapeDtypeStruct((3, f, cout), jnp.float32),
            jax.ShapeDtypeStruct((cout,), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * b * t * 3 * (cin * f + f * f + f * cout),
            bytes_accessed=2 * b * t * (cin + cout) * mu.dtype.itemsize,
            transcendentals=4 * b * t * f,
        ),
        interpret=interpret,
    )(mu, wa, ba, wb, bb, wc, bc, do)
    dmu, dwa, dba, dwb, dbb, dwc, dbc = outs
    return (dmu, dwa.astype(wa.dtype), dba.astype(ba.dtype),
            dwb.astype(wb.dtype), dbb.astype(bb.dtype),
            dwc.astype(wc.dtype), dbc.astype(bc.dtype))


_prenet_core.defvjp(_prenet_fwd, _prenet_bwd)


def fused_prenet_train(mu, wa, ba, wb, bb, wc, bc, interpret: bool = False):
    """Differentiable fused mu prenet: mu [B, T, Cin]; conv params
    [3, Cin, F] / [3, F, F] / [3, F, Cout]. T must be a multiple of 8.
    Returns conv_c(silu(conv_b(silu(conv_a(mu))))) with full gradients."""
    if wa.shape[0] != 3:
        raise ValueError("fused_prenet_train hard-codes kernel_size 3")
    return _prenet_core(mu, wa, ba, wb, bb, wc, bc, interpret)
