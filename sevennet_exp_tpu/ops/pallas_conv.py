"""Fully-fused convolution-block kernel (Pallas, TPU).

Computes, per edge, in one VMEM-resident pass:

    w    = FullyConnectedNet(radial_embedding) * mask/denominator
    msg  = uvu-TP(x[src], Y(r); w)                 (wide, ~3136 ch)
    y    = self_interaction_2 linear (msg)          (narrow, ~424 ch)

and writes only `y` to HBM. This removes the dominant HBM traffic of the
conv block (the wide message write/scatter/read and the (E, weight_numel)
radial-weight array) -- the TPU answer to what cuEquivariance's fused
kernels do for the reference (sevenn/nn/cue_helper.py), plus the
scatter-linear commutation (linear maps commute with segment-sum, so
compressing before aggregation is exact; cf. interaction_blocks.py:78-84).

The custom VJP recomputes the radial MLP in the backward kernel and emits
(dxg, dsh, demb, dmaskscale=0) -- first-order only (forces). Training
(grad-of-grad) uses the XLA path (see train/trainer.py).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..irreps import Irrep
from .normalize import NORMALIZE2MOM_CST
from .tensor_product import (
    FullyConnectedNetSpec,
    LinearSpec,
    UVUTensorProductSpec,
)
from .wigner import wigner_3j

_INTERPRET = False


def set_interpret(flag: bool):
    global _INTERPRET
    _INTERPRET = flag


def is_enabled() -> bool:
    from . import pallas_tp
    return pallas_tp.is_enabled()


def _tp_plan(spec: UVUTensorProductSpec):
    s1 = spec.irreps_in1.slices()
    s2 = spec.irreps_in2.slices()
    # output slot offsets in the (virtual) wide message layout
    plan = []
    w_off = 0
    fan = {}
    for (i1, i2, k) in spec.instructions:
        fan[k] = fan.get(k, 0) + spec.irreps_in2[i2].mul
    for (i1, i2, k) in spec.instructions:
        mul1, ir1 = spec.irreps_in1[i1]
        _, ir2 = spec.irreps_in2[i2]
        mul3, ir3 = spec.irreps_out[k]
        alpha = math.sqrt((2 * ir3.l + 1) / fan[k])
        C = wigner_3j(ir1.l, ir2.l, ir3.l) * alpha
        nz = [
            (m, n, p, float(C[m, n, p]))
            for m in range(ir1.dim)
            for n in range(ir2.dim)
            for p in range(ir3.dim)
            if abs(C[m, n, p]) > 1e-12
        ]
        plan.append(dict(
            k=k, mul=mul1, x_off=s1[i1].start, sh_off=s2[i2].start,
            w_off=w_off, dim3=ir3.dim, ir3=ir3, nz=tuple(nz),
        ))
        w_off += mul1
    return plan, w_off


def _si2_plan(tp_spec: UVUTensorProductSpec, si2: LinearSpec):
    """Map TP output entries (k) to si2 output entries (j) with per-k
    row offsets into the si2 path weight matrices."""
    # si2 input = simplified tp irreps_out; per input-ir the rows of the
    # path weight stack in k order
    out_offsets = []
    off = 0
    for mul, ir in si2.irreps_out:
        out_offsets.append(off)
        off += mul * ir.dim
    d_out = off
    # per si2 path: (i_in entry of simplified irreps_in, j, mi, mo, alpha)
    # row position of each k inside its simplified input entry:
    simp = si2.irreps_in
    k_row = {}
    row_per_entry = {i: 0 for i in range(len(simp))}
    # match k entries (sorted unsimplified) to simplified entries in order
    si = 0
    consumed = 0
    for k, (mul_k, ir_k) in enumerate(tp_spec.irreps_out):
        while simp[si].ir != ir_k or consumed >= simp[si].mul:
            si += 1
            consumed = 0
        k_row[k] = (si, consumed)
        consumed += mul_k
    path_by_entry = {}
    for n, (i, j, mi, mo, alpha) in enumerate(si2.paths):
        path_by_entry[i] = (n, j, mi, mo, alpha)
    # per k: (path_idx, row_offset, j, mo, alpha, out_offset)
    per_k = {}
    for k, (mul_k, ir_k) in enumerate(tp_spec.irreps_out):
        si_idx, row = k_row[k]
        if si_idx not in path_by_entry:
            continue
        n, j, mi, mo, alpha = path_by_entry[si_idx]
        per_k[k] = dict(path=n, row=row, j=j, mo=mo, alpha=alpha,
                        out_off=out_offsets[j],
                        dim3=si2.irreps_out[j].ir.dim)
    return per_k, d_out


def _mlp_forward(emb, w0, w1, w2, act_name):
    cst = NORMALIZE2MOM_CST[act_name]
    h0, h1_in = None, None
    import jax.nn as jnn
    act = {'silu': jnn.silu, 'tanh': jnp.tanh, 'ssp':
           lambda x: jnn.softplus(x) - math.log(2.0)}.get(act_name, jnn.silu)
    pre0 = emb @ (w0 / math.sqrt(w0.shape[0]))
    h0 = act(pre0) * cst
    pre1 = h0 @ (w1 / math.sqrt(w1.shape[0]))
    h1 = act(pre1) * cst
    w = h1 @ (w2 / math.sqrt(w2.shape[0]))
    return w, (pre0, h0, pre1, h1)


def _act_grad(pre, act_name):
    import jax.nn as jnn
    cst = NORMALIZE2MOM_CST[act_name]
    if act_name == 'silu':
        s = jnn.sigmoid(pre)
        return (s + pre * s * (1 - s)) * cst
    if act_name == 'tanh':
        t = jnp.tanh(pre)
        return (1 - t * t) * cst
    if act_name == 'ssp':
        return jnn.sigmoid(pre) * cst
    raise ValueError(act_name)


@functools.lru_cache(maxsize=None)
def make_fused_conv(
    tp_spec: UVUTensorProductSpec,
    mlp_spec: FullyConnectedNetSpec,
    si2_spec: LinearSpec,
    block_e: int = 256,
):
    """fused(xg, sh, emb, maskscale, mlp_ws, si2_ws) -> y (E, d_out).

    mlp_ws: tuple of raw MLP weights (as stored, N(0,1) scale);
    si2_ws: tuple of si2 path weight matrices (as stored).
    """
    plan, w_numel = _tp_plan(tp_spec)
    per_k, d_out = _si2_plan(tp_spec, si2_spec)
    d1 = tp_spec.irreps_in1.dim
    f = tp_spec.irreps_in2.dim
    r = mlp_spec.hs[0]
    act_name = mlp_spec.act
    n_mlp = len(mlp_spec.hs) - 1
    assert n_mlp == 3, 'kernel assumes 2 hidden layers (reference default)'

    def fwd_kernel(xg_ref, sh_ref, emb_ref, ms_ref,
                   w0_ref, w1_ref, w2_ref, *si2_refs_and_out):
        si2_refs = si2_refs_and_out[:-1]
        out_ref = si2_refs_and_out[-1]
        w_rad, _ = _mlp_forward(
            emb_ref[...], w0_ref[...], w1_ref[...], w2_ref[...], act_name
        )
        w_rad = w_rad * ms_ref[...]
        out_acc = {}  # keyed by (offset, width)
        for p_ins in plan:
            mul = p_ins['mul']
            xo, so, wo = p_ins['x_off'], p_ins['sh_off'], p_ins['w_off']
            k = p_ins['k']
            wn = w_rad[:, wo:wo + mul]
            cache = {}
            acc = [None] * p_ins['dim3']
            for (m, n, p, c) in p_ins['nz']:
                if (m, n) not in cache:
                    cache[(m, n)] = (
                        xg_ref[:, xo + m * mul: xo + (m + 1) * mul]
                        * sh_ref[:, so + n: so + n + 1]
                    )
                t = cache[(m, n)] * c
                acc[p] = t if acc[p] is None else acc[p] + t
            if k not in per_k:
                continue
            info = per_k[k]
            W = si2_refs[info['path']][...]
            Wk = W[info['row']:info['row'] + mul, :] * info['alpha']
            mo = info['mo']
            oo = info['out_off']
            for p in range(p_ins['dim3']):
                a = acc[p]
                if a is None:
                    continue
                contrib = jnp.dot(a * wn, Wk,
                                  preferred_element_type=jnp.float32)
                key = (oo + p * mo, mo)
                if key in out_acc:
                    out_acc[key] = out_acc[key] + contrib
                else:
                    out_acc[key] = contrib
        out_ref[...] = jnp.zeros_like(out_ref)
        for (off, width), v in out_acc.items():
            out_ref[:, off:off + width] = v

    def bwd_kernel(g_ref, xg_ref, sh_ref, emb_ref, ms_ref,
                   w0_ref, w1_ref, w2_ref, *refs):
        si2_refs = refs[:-3]
        dxg_ref, dsh_ref, demb_ref = refs[-3:]
        w0, w1, w2 = w0_ref[...], w1_ref[...], w2_ref[...]
        w_rad, (pre0, h0, pre1, h1) = _mlp_forward(
            emb_ref[...], w0, w1, w2, act_name
        )
        ms = ms_ref[...]
        w_eff = w_rad * ms
        # register-resident accumulators, refs written ONCE at the end
        # (per-term ref read-modify-writes made the bwd 4x slower than
        # the fwd; mirror the fwd's out_acc pattern instead)
        dxg_acc = {}   # (x_off + m*mul, mul) -> (B, mul)
        dsh_acc = {}   # sh column index -> (B, 1)
        dw_eff_cols = {}
        for p_ins in plan:
            mul = p_ins['mul']
            xo, so, wo = p_ins['x_off'], p_ins['sh_off'], p_ins['w_off']
            k = p_ins['k']
            if k not in per_k:
                continue
            info = per_k[k]
            W = si2_refs[info['path']][...]
            Wk = W[info['row']:info['row'] + mul, :] * info['alpha']
            mo = info['mo']
            oo = info['out_off']
            wn = w_eff[:, wo:wo + mul]
            dw_acc = None
            xm_cache = {}
            xy_cache = {}
            sacc = {}  # n -> (B, mul) partial dsh, reduced ONCE at the end
            for p in range(p_ins['dim3']):
                # gradient wrt (acc_p * wn): g_p @ Wk^T
                gp = g_ref[:, oo + p * mo: oo + (p + 1) * mo]
                gm = jnp.dot(gp, Wk.T,
                             preferred_element_type=jnp.float32)
                gw = gm * wn
                gxm_cache = {}
                # recompute acc_p
                acc_p = None
                for (m, n, pp, c) in p_ins['nz']:
                    if pp != p:
                        continue
                    if m not in xm_cache:
                        xm_cache[m] = xg_ref[
                            :, xo + m * mul: xo + (m + 1) * mul]
                    xm = xm_cache[m]
                    yn = sh_ref[:, so + n: so + n + 1]
                    if (m, n) not in xy_cache:
                        xy_cache[(m, n)] = xm * yn
                    t = xy_cache[(m, n)] * c
                    acc_p = t if acc_p is None else acc_p + t
                    # dxg, dsh from gm * wn
                    kx = (xo + m * mul, mul)
                    v = gw * (yn * c)
                    dxg_acc[kx] = v if kx not in dxg_acc else dxg_acc[kx] + v
                    if m not in gxm_cache:
                        gxm_cache[m] = gw * xm
                    s = gxm_cache[m] * c
                    sacc[n] = s if n not in sacc else sacc[n] + s
                if acc_p is not None:
                    t = gm * acc_p
                    dw_acc = t if dw_acc is None else dw_acc + t
            for n, v in sacc.items():
                s = jnp.sum(v, axis=1, keepdims=True)
                kn = so + n
                dsh_acc[kn] = s if kn not in dsh_acc else dsh_acc[kn] + s
            if dw_acc is not None:
                key = (wo, mul)
                dw_eff_cols[key] = (
                    dw_acc if key not in dw_eff_cols
                    else dw_eff_cols[key] + dw_acc
                )
        dxg_ref[...] = jnp.zeros_like(dxg_ref)
        for (off, mul), v in dxg_acc.items():
            dxg_ref[:, off:off + mul] = dxg_ref[:, off:off + mul] + v
        dsh_ref[...] = jnp.zeros_like(dsh_ref)
        for n_col, v in dsh_acc.items():
            dsh_ref[:, n_col:n_col + 1] = dsh_ref[:, n_col:n_col + 1] + v
        # assemble dw_eff -> demb through the MLP (concat in column order;
        # pallas TPU has no scatter primitive)
        pieces = []
        for p_ins in plan:
            key = (p_ins['w_off'], p_ins['mul'])
            v = dw_eff_cols.get(key)
            if v is None:
                v = jnp.zeros((g_ref.shape[0], p_ins['mul']), jnp.float32)
            pieces.append(v)
        dw_eff = jnp.concatenate(pieces, axis=1)
        dw_rad = dw_eff * ms
        dh1 = jnp.dot(dw_rad, (w2 / math.sqrt(w2.shape[0])).T,
                      preferred_element_type=jnp.float32)
        dpre1 = dh1 * _act_grad(pre1, act_name)
        dh0 = jnp.dot(dpre1, (w1 / math.sqrt(w1.shape[0])).T,
                      preferred_element_type=jnp.float32)
        dpre0 = dh0 * _act_grad(pre0, act_name)
        demb_ref[...] = jnp.dot(
            dpre0, (w0 / math.sqrt(w0.shape[0])).T,
            preferred_element_type=jnp.float32,
        )

    n_si2 = len(si2_spec.paths)

    def _especs(widths, block):
        return [
            pl.BlockSpec((block, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for w in widths
        ]

    def _wspecs(shapes):
        return [
            pl.BlockSpec(s, lambda i: tuple(0 for _ in s),
                         memory_space=pltpu.VMEM)
            for s in shapes
        ]

    def fwd_call(xg, sh, emb, ms, mlp_ws, si2_ws):
        e = xg.shape[0]
        assert e % fwd_block == 0 and e % bwd_block == 0
        mlp_shapes = [w.shape for w in mlp_ws]
        si2_shapes = [w.shape for w in si2_ws]
        return pl.pallas_call(
            fwd_kernel,
            out_shape=jax.ShapeDtypeStruct((e, d_out), xg.dtype),
            grid=(e // fwd_block,),
            in_specs=(
                _especs([d1, f, r, 1], fwd_block)
                + _wspecs(mlp_shapes) + _wspecs(si2_shapes)
            ),
            out_specs=_especs([d_out], fwd_block)[0],
            interpret=_INTERPRET,
        )(xg, sh, emb, ms, *mlp_ws, *si2_ws)

    # block sizes are set by VMEM stack pressure, not by block_e: the
    # bwd keeps dxg/dsh accumulators + the xm cache resident (~2x the
    # fwd working set), and large-lmax specs (l3i5: d1=592,
    # w_numel=1600, ~2x the instruction count) carry far more live
    # temporaries per row (measured: 7net-0 mid-layer bwd needs ~21M at
    # block 128; l3i5 mid-layer ~30M at block 64; scoped-vmem limit 16M)
    width = d1 + d_out + w_numel
    fwd_block = min(block_e, 256 if width <= 2200 else 128)
    bwd_block = min(block_e, 64 if width <= 2200 else 16)

    def bwd_call(res, g):
        xg, sh, emb, ms, mlp_ws, si2_ws = res
        e = xg.shape[0]
        mlp_shapes = [w.shape for w in mlp_ws]
        si2_shapes = [w.shape for w in si2_ws]
        dxg, dsh, demb = pl.pallas_call(
            bwd_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((e, d1), xg.dtype),
                jax.ShapeDtypeStruct((e, f), xg.dtype),
                jax.ShapeDtypeStruct((e, r), xg.dtype),
            ),
            grid=(e // bwd_block,),
            in_specs=(
                _especs([d_out, d1, f, r, 1], bwd_block)
                + _wspecs(mlp_shapes) + _wspecs(si2_shapes)
            ),
            out_specs=tuple(_especs([d1, f, r], bwd_block)),
            interpret=_INTERPRET,
        )(g, xg, sh, emb, ms, *mlp_ws, *si2_ws)
        zeros_mlp = tuple(jnp.zeros_like(w) for w in mlp_ws)
        zeros_si2 = tuple(jnp.zeros_like(w) for w in si2_ws)
        return (dxg, dsh, demb, jnp.zeros_like(ms), zeros_mlp, zeros_si2)

    @jax.custom_vjp
    def fused(xg, sh, emb, ms, mlp_ws, si2_ws):
        return fwd_call(xg, sh, emb, ms, mlp_ws, si2_ws)

    def fused_fwd(xg, sh, emb, ms, mlp_ws, si2_ws):
        return (fwd_call(xg, sh, emb, ms, mlp_ws, si2_ws),
                (xg, sh, emb, ms, mlp_ws, si2_ws))

    fused.defvjp(fused_fwd, bwd_call)
    return fused, d_out
