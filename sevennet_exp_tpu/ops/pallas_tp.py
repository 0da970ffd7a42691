"""Pallas-fused uvu tensor-product kernels (the TPU analog of the
reference's cuEquivariance backend, sevenn/nn/cue_helper.py).

The convolution message  msg[e] = TP(x[src_e], Y(r_e); w_rad[e])  expands,
in ir_mul layout, into a static list of scalar-coefficient FMAs over
(E, mul) lane-aligned tiles. XLA materializes each concat branch to HBM
(re-reading inputs per output block); this kernel performs the whole
contraction in VMEM: one read of (xg, sh, w), one write of msg.

A custom VJP provides the fused backward (dxg, dsh, dw) in a second
kernel, so force computation (grad through the conv) stays fused too.

Falls back to the pure-XLA implementation (UVUTensorProductSpec.apply) on
non-TPU backends; equivalence is tested in interpret mode
(tests/test_pallas_tp.py), mirroring the reference's e3nn<->cueq
equivalence suite (tests/unit_tests/test_cueq.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tensor_product import UVUTensorProductSpec

# toggled by model config / tests
_INTERPRET = False
_ENABLED = False


def set_interpret(flag: bool):
    global _INTERPRET
    _INTERPRET = flag


def enable(flag: bool = True):
    """Turn the fused kernel on for subsequently-traced programs.

    NOTE: first-order differentiable (forces OK). Training (grad-of-grad)
    must run the XLA path; Trainer disables it during its traces.
    """
    global _ENABLED
    _ENABLED = flag


def is_enabled() -> bool:
    return _ENABLED


class disabled:
    """Context manager: force the XLA path while tracing (training)."""

    def __enter__(self):
        self._prev = _ENABLED
        enable(False)

    def __exit__(self, *a):
        enable(self._prev)


def best_block(e: int, row_bytes: int = 0) -> int:
    """Largest E-block that divides e and keeps the working set within a
    conservative VMEM budget (double-buffered in+out tiles)."""
    budget = 6 * 1024 * 1024
    for b in (1024, 512, 256, 128):
        if e % b != 0:
            continue
        if row_bytes and b * row_bytes > budget:
            continue
        return b
    return 0  # caller falls back to XLA


def spec_row_bytes(spec: UVUTensorProductSpec, dtype_bytes: int = 4) -> int:
    _, d3, w_numel = _plan(spec)
    return dtype_bytes * (
        spec.irreps_in1.dim + spec.irreps_in2.dim + w_numel + d3
    )


def _plan(spec: UVUTensorProductSpec):
    """Static contraction plan: per instruction
    (x_off, mul, sh_off, w_off, out_off, dim1, dim2, dim3, nonzeros)."""
    s1 = spec.irreps_in1.slices()
    s2 = spec.irreps_in2.slices()
    out_offsets = []
    off = 0
    for mul, ir in spec.irreps_out:
        out_offsets.append(off)
        off += mul * ir.dim
    d3_total = off
    plan = []
    w_off = 0
    for (n_i, nz), (i1, i2, k) in zip(
        spec.cg_nonzeros(), spec.instructions
    ):
        mul1, ir1 = spec.irreps_in1[i1]
        _, ir2 = spec.irreps_in2[i2]
        _, ir3 = spec.irreps_out[k]
        plan.append(dict(
            x_off=s1[i1].start, mul=mul1, sh_off=s2[i2].start,
            w_off=w_off, out_off=out_offsets[k],
            dim1=ir1.dim, dim2=ir2.dim, dim3=ir3.dim, nz=nz,
        ))
        w_off += mul1
    return plan, d3_total, w_off


def _fwd_kernel(plan, xg_ref, sh_ref, w_ref, out_ref):
    for p_ins in plan:
        mul = p_ins['mul']
        xo, so, wo, oo = (p_ins['x_off'], p_ins['sh_off'],
                          p_ins['w_off'], p_ins['out_off'])
        wn = w_ref[:, wo:wo + mul]
        acc = [None] * p_ins['dim3']
        cache = {}
        for (m, n, p, c) in p_ins['nz']:
            if (m, n) not in cache:
                xm = xg_ref[:, xo + m * mul: xo + (m + 1) * mul]
                yn = sh_ref[:, so + n: so + n + 1]
                cache[(m, n)] = xm * yn
            t = cache[(m, n)] * c
            acc[p] = t if acc[p] is None else acc[p] + t
        for p in range(p_ins['dim3']):
            a = acc[p]
            if a is None:
                a = jnp.zeros_like(wn)
            out_ref[:, oo + p * mul: oo + (p + 1) * mul] = a * wn


def _bwd_kernel(plan, g_ref, xg_ref, sh_ref, w_ref,
                dxg_ref, dsh_ref, dw_ref):
    dxg_ref[:, :] = jnp.zeros_like(dxg_ref)
    dsh_ref[:, :] = jnp.zeros_like(dsh_ref)
    for p_ins in plan:
        mul = p_ins['mul']
        xo, so, wo, oo = (p_ins['x_off'], p_ins['sh_off'],
                          p_ins['w_off'], p_ins['out_off'])
        wn = w_ref[:, wo:wo + mul]
        gw = {}   # cached g_p * wn
        dw_acc = None
        for (m, n, p, c) in p_ins['nz']:
            if p not in gw:
                gw[p] = g_ref[:, oo + p * mul: oo + (p + 1) * mul] * wn
            xm = xg_ref[:, xo + m * mul: xo + (m + 1) * mul]
            yn = sh_ref[:, so + n: so + n + 1]
            gp = g_ref[:, oo + p * mul: oo + (p + 1) * mul]
            # dxg_m += c * g_p * wn * y_n
            dxg_ref[:, xo + m * mul: xo + (m + 1) * mul] = (
                dxg_ref[:, xo + m * mul: xo + (m + 1) * mul]
                + gw[p] * yn * c
            )
            # dsh_n += c * sum_u(g_p * wn * x_m)
            dsh_ref[:, so + n: so + n + 1] = (
                dsh_ref[:, so + n: so + n + 1]
                + jnp.sum(gw[p] * xm, axis=1, keepdims=True) * c
            )
            # dw += c * g_p * x_m * y_n
            t = gp * xm * yn * c
            dw_acc = t if dw_acc is None else dw_acc + t
        dw_ref[:, wo:wo + mul] = (
            dw_acc if dw_acc is not None else jnp.zeros_like(wn)
        )


def _block_specs(widths, block_e):
    return [
        pl.BlockSpec((block_e, w), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
        for w in widths
    ]


@functools.lru_cache(maxsize=None)
def make_fused_tp(spec: UVUTensorProductSpec, block_e: int = 512):
    """Returns fused_tp(xg, sh, w) -> msg with custom VJP.

    Shapes: xg (E, D1), sh (E, F), w (E, W) with E % block_e == 0.
    """
    plan, d3, w_numel = _plan(spec)
    d1 = spec.irreps_in1.dim
    f = spec.irreps_in2.dim

    def fwd_call(xg, sh, w):
        e = xg.shape[0]
        assert e % block_e == 0, (e, block_e)
        grid = (e // block_e,)
        return pl.pallas_call(
            functools.partial(_fwd_kernel, plan),
            out_shape=jax.ShapeDtypeStruct((e, d3), xg.dtype),
            grid=grid,
            in_specs=_block_specs([d1, f, w_numel], block_e),
            out_specs=_block_specs([d3], block_e)[0],
            interpret=_INTERPRET,
        )(xg, sh, w)

    def bwd_call(xg, sh, w, g):
        e = xg.shape[0]
        grid = (e // block_e,)
        return pl.pallas_call(
            functools.partial(_bwd_kernel, plan),
            out_shape=(
                jax.ShapeDtypeStruct((e, d1), xg.dtype),
                jax.ShapeDtypeStruct((e, f), xg.dtype),
                jax.ShapeDtypeStruct((e, w_numel), xg.dtype),
            ),
            grid=grid,
            in_specs=_block_specs([d3, d1, f, w_numel], block_e),
            out_specs=tuple(_block_specs([d1, f, w_numel], block_e)),
            interpret=_INTERPRET,
        )(g, xg, sh, w)

    @jax.custom_vjp
    def fused_tp(xg, sh, w):
        return fwd_call(xg, sh, w)

    def fused_fwd(xg, sh, w):
        return fwd_call(xg, sh, w), (xg, sh, w)

    def fused_bwd(res, g):
        xg, sh, w = res
        return bwd_call(xg, sh, w, g)

    fused_tp.defvjp(fused_fwd, fused_bwd)
    return fused_tp
