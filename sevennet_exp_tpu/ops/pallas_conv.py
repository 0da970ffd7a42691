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

# MXU precision mode for the in-kernel dots. 'fp32' is the default and
# fastest-accurate choice: measured on v5e (tools/bench_kernel.py), the
# manual 'bf16x2' split (hi+lo bf16 halves, 3 cross products, ~16-bit
# mantissa) is ~7% SLOWER than Mosaic's native fp32 dot -- the VPU
# split/convert overhead outweighs the MXU pass savings, i.e. the
# kernel is not MXU-bound. 'bf16' is 1-pass (~1e-3 rel err), kept for
# throughput experiments only.
_DOT_MODE = 'fp32'

# Mosaic scoped-VMEM cap. The default (~16 MB) forces tiny backward
# blocks; raising the cap lets the bwd run at the same block size as
# the fwd.
_VMEM_LIMIT = 100 * 1024 * 1024


def set_interpret(flag: bool):
    global _INTERPRET
    _INTERPRET = flag


# CG contraction mode. Two survivors of the round-2..4 formulation
# ladder (full measurement records: NOTES_ROUND3/4.md, BENCH_NOTES.md):
#
# 'cmshared' (DEFAULT) = feature-major (column-major) TERMS kernels:
# all per-edge tensors are transposed ONCE in VMEM so every elementwise
# CG op runs (width, B) with the edge dim on the 128 lanes, and the
# per-(m, n) x*y products are cached and shared ACROSS instructions of
# the same input slice, fwd AND bwd. Measured (slope-timed, v5e,
# tools/bench_kernel.py E=44032, 2026-08-18): fwd 18.2 ns/row, fwd+bwd
# 33.3 -- the best of every formulation tried.
#
# 'terms' = the original edge-major per-(m, n, p) sliced VPU products
# (25% lane use at mul=32). Kept as the structurally-independent
# fallback / cross-check path; everything else it shares with cmshared
# is the plan, not the kernel body.
#
# Pruned after measurement (round 5; code removed, records kept):
# 'fullwidth'/'fwslim'/'fwhybrid'/'fwmixed' (edge-major St = sh @ CT
# with 0/1-matmul or slice-sum group reductions -- all within +-8%
# noise of 'terms' on the full step, and the St materialization is
# 15.6 of 29.3 ns/row in feature-major form), 'cm' (feature-major St:
# fwd 25.6 ns/row, fwd+bwd 39.0), 'cmhyb' (terms fwd + St bwd: 41.7,
# worse than either parent). The MXU-CG dense-operator alternative
# (tools/bench_cgmxu.py) re-measured 2026-08-18 on hardware: 2.1x
# slower AND numerically wrong (Mosaic sublane<->lane reshapes
# mis-order data) -- the round-3-verdict MXU hypothesis stays refuted
# by measurement.
import os as _os

_CG_MODE = _os.environ.get('SEVENNET_CG_MODE', 'cmshared')


def set_cg_mode(mode: str):
    """'cmshared' (default) | 'terms'. Affects newly built kernels
    only -- call make_fused_conv.cache_clear() to rebuild."""
    global _CG_MODE
    assert mode in ('terms', 'cmshared')
    _CG_MODE = mode


# geometry-fused kernels (GeomSpec below): opt-out knob. When off, the
# engines fall back to the XLA edge pipeline + non-geom fused kernels
# (the round-3 configuration) -- used by tests to cover both paths and
# as a production escape hatch.
_GEOM_ENABLED = _os.environ.get(
    'SEVENNET_GEOM_FUSED', '1').lower() not in ('0', 'false', 'off')


def set_geom_enabled(flag: bool):
    global _GEOM_ENABLED
    _GEOM_ENABLED = bool(flag)


def geom_enabled() -> bool:
    return _GEOM_ENABLED


# Dense whole-array path: geometry fusion is OFF by default there.
# EdgeEmbedding computes Bessel/SH once per force call and all layers
# share the arrays; the geom kernel recomputes geometry inside EVERY
# layer's fwd AND bwd kernel, which measured ~1 ms/step SLOWER at 1k
# on v5e (10.14 -> 9.07 ns/day, bench logs 2026-08-18). On the packed
# chunked path the trade flips: the shared arrays would be (E,
# n_basis+n_sh) HBM-resident columns, and in-kernel geometry replaces
# that traffic with a 3-column read -- geom stays default-on there.
_GEOM_DENSE = _os.environ.get(
    'SEVENNET_GEOM_DENSE', '0').lower() in ('1', 'true', 'on')


def set_geom_dense(flag: bool):
    global _GEOM_DENSE
    _GEOM_DENSE = bool(flag)


def geom_dense_enabled() -> bool:
    return _GEOM_DENSE


# Half-list radial MLP (dense whole-array path): the radial embedding
# is symmetric under edge reversal (|r_ij| == |r_ji| bitwise), so the
# per-layer radial MLP runs on the E/2 representative edges as one
# big XLA matmul chain and its rows are spread to both directed edges
# by a gather (ops/scatter.py::pair_spread). The conv kernels take the
# precomputed per-edge weights (ext_w) instead of running the MLP
# per block in-kernel -- a ~50% MAC cut on the model's single biggest
# FLOP consumer (the 66k-MAC/row radial MLP of the roofline audit,
# BENCH_NOTES.md round 4) and fewer narrow K=8 dots inside Mosaic.
#
# REFUTED on v5e (round-5 A/B, BENCH_NOTES.md "Half-list radial
# MLP"): 11.25 ns/day vs 25.2 at 1k -- 2.2x SLOWER despite the MAC
# cut. The ext_w kernels consume a materialized (E, ~1000) per-edge
# weight tensor (~131 MB/layer at E=32k) that the XLA MLP writes and
# the kernel re-reads every layer and again in the backward; the
# in-kernel MLP generates the same rows in VMEM from the (E, 8)
# embedding. At ~5% MXU utilization the kernels are bandwidth/VPU
# bound, so trading MACs for HBM round-trips loses. Kept as an
# opt-in escape hatch + the tested reference for a future pair-major
# kernel (which could share the weights in VMEM without the HBM
# round-trip, at the cost of a two-row aggregation contract).
_HALF_MLP = _os.environ.get(
    'SEVENNET_HALF_MLP', '0').lower() not in ('0', 'false', 'off')


def set_half_mlp(flag: bool):
    global _HALF_MLP
    _HALF_MLP = bool(flag)


def half_mlp_enabled() -> bool:
    # RESTRICTION (advisor round 4): half_pair_indices assumes no REAL
    # edge is a rev fixed point (rev[e] != e whenever mask[e] = 1).
    # This holds for the MIC neighbor lists and the brick grid built
    # in this repo (a self-image edge would need cell < 2*cutoff with
    # shift-vector lists, which no current builder produces); a real
    # self-paired edge would be silently dropped from the half list.
    # Re-check this contract before enabling on any new list builder.
    return _HALF_MLP and _CG_MODE == 'cmshared'


def set_dot_mode(mode: str):
    """'fp32' | 'bf16x2' | 'bf16' (see _DOT_MODE). Affects newly built
    kernels only -- call make_fused_conv.cache_clear() to rebuild."""
    global _DOT_MODE
    assert mode in ('fp32', 'bf16x2', 'bf16')
    _DOT_MODE = mode


# in-kernel dot precision, decoupled from jax_default_matmul_precision
# (the package defaults THAT to float32 for the XLA-side linears):
# 'highest' = true fp32 multi-pass MXU; 'default' = fast bf16-input
# single pass. Measured on the trained NaCl flagship vs analytic
# ground truth: bf16 kernel dots cost 0.00157 -> 0.00166 eV/A force
# RMSE (the dots contract small structural/weight operands into fp32
# accumulators) while fp32 kernel dots cost 2.3x the step time -- the
# accuracy lives in the XLA-side linears, the speed in the kernel.
_DOT_PRECISION = _os.environ.get('SEVENNET_CONV_DOT_PRECISION',
                                 'default')


def _dot_precision():
    return (jax.lax.Precision.DEFAULT if _DOT_PRECISION == 'default'
            else jax.lax.Precision.HIGHEST)


def _raw_dot(a, b):
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(),
    )


def _dotT(a, b):
    """Contract a's FIRST dim with b's first dim: (k, m) x (k, n) ->
    (m, n). The MXU takes transposed lhs natively, so feature-major
    kernels never materialize transposed constants."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(),
    )


def _dot(a, b):
    if _INTERPRET or _DOT_MODE == 'fp32':
        return _raw_dot(a, b)
    if _DOT_MODE == 'bf16':
        return _raw_dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
    bf = jnp.bfloat16
    a_hi = a.astype(bf)
    b_hi = b.astype(bf)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(bf)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(bf)
    return (_raw_dot(a_hi, b_hi) + _raw_dot(a_hi, b_lo)
            + _raw_dot(a_lo, b_hi))


def is_enabled() -> bool:
    from . import pallas_tp
    return pallas_tp.is_enabled()


# ---------------------------------------------------------------------
# In-kernel edge geometry ('geom' kernels): Bessel radial basis, cutoff
# envelope and real spherical harmonics computed INSIDE the conv kernel
# from the raw edge vector, with their VJPs to the edge vector folded
# into the kernel backward (jax.vjp over the traced geometry function).
# Removes the (E, f)/(E, nb) HBM round-trips, the XLA-side SH/radial
# fwd+VJP fusions, and shrinks the packed large-system feature block
# from nb+f columns to 3 (the edge vector) -- the fused-backward move
# the round-3 verdict asked for (reference analog: the manual
# layer-by-layer backward of pair_e3gnn_parallel.cpp:401-438).
# ---------------------------------------------------------------------

from dataclasses import dataclass as _dataclass


@_dataclass(frozen=True)
class GeomSpec:
    """Static geometry config (hashable: keys make_fused_conv's cache).

    Mirrors EdgeEmbedding (model/layers.py): emb_n = (2/rc) *
    sin(c_n r)/r * env(r) * mask; Y = component-normalized real SH of
    the (normalized) edge vector (reference edge_embedding.py:81-161).
    """
    cutoff: float
    num_basis: int
    lmax: int
    cutoff_kind: str            # 'poly' | 'xplor'
    cutoff_p: float = 6.0       # poly exponent
    cutoff_on: float = 0.0      # xplor r_on
    normalize: bool = True      # SH of v/|v|


def _sh_rows_fm(ux, uy, uz, lmax: int):
    """Feature-major real SH: three (1, B) rows -> (lmax+1)^2 (1, B)
    rows, identical math to ops/spherical.spherical_harmonics_cols."""
    from .spherical import _monomials, sh_coefficients
    rows = []
    for l in range(lmax + 1):
        coef = np.asarray(sh_coefficients(l)) * math.sqrt(2 * l + 1)
        mono_vals = []
        for a, b, c in _monomials(l):
            t = None
            if a:
                t = ux ** a
            if b:
                t = uy ** b if t is None else t * uy ** b
            if c:
                t = uz ** c if t is None else t * uz ** c
            mono_vals.append(t if t is not None else jnp.ones_like(ux))
        for m in range(2 * l + 1):
            acc = None
            for k, mv in enumerate(mono_vals):
                cc = float(coef[m, k])
                if abs(cc) < 1e-14:
                    continue
                term = mv * cc
                acc = term if acc is None else acc + term
            rows.append(acc if acc is not None else jnp.zeros_like(ux))
    return rows


def _geom_fm(vT, coeffs, spec: GeomSpec):
    """(3, B) edge vectors + (num_basis,) Bessel coeffs ->
    (embT (nb, B), shT (f, B)), feature-major, eps-guarded for padded
    rows (dummy vectors are r > 0 by the neighbor-stack contract, the
    eps only guards exact zeros)."""
    x, y, z = vT[0:1, :], vT[1:2, :], vT[2:3, :]
    r2 = x * x + y * y + z * z
    r = jnp.sqrt(r2 + 1e-30)
    inv_r = 1.0 / r
    if spec.cutoff_kind == 'poly':
        p = float(spec.cutoff_p)
        c0 = (p + 1.0) * (p + 2.0) / 2.0
        c1 = p * (p + 2.0)
        c2 = p * (p + 1.0) / 2.0
        rr = r * (1.0 / spec.cutoff)
        rp = rr ** p
        env = 1.0 - c0 * rp + c1 * rp * rr - c2 * rp * rr * rr
    elif spec.cutoff_kind == 'xplor':
        r_on2 = spec.cutoff_on ** 2
        rc2 = spec.cutoff ** 2
        smooth = ((rc2 - r2) ** 2 * (rc2 + 2.0 * r2 - 3.0 * r_on2)
                  / (rc2 - r_on2) ** 3)
        env = jnp.where(r < spec.cutoff_on, 1.0, smooth)
    else:
        raise ValueError(spec.cutoff_kind)
    pref = 2.0 / spec.cutoff
    scale = pref * inv_r * env
    emb_rows = [jnp.sin(coeffs[n] * r) * scale
                for n in range(spec.num_basis)]
    embT = jnp.concatenate(emb_rows, axis=0)
    if spec.normalize:
        ux, uy, uz = x * inv_r, y * inv_r, z * inv_r
    else:
        ux, uy, uz = x, y, z
    shT = jnp.concatenate(_sh_rows_fm(ux, uy, uz, spec.lmax), axis=0)
    return embT, shT


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
            dim1=ir1.dim, dim2=ir2.dim,
        ))
        w_off += mul1
    return plan, w_off


def _si2_groups(tp_spec: UVUTensorProductSpec, si2: LinearSpec):
    """Group-major view of the TP->si2 contraction: one group per si2
    output entry j, listing the TP output entries k that feed it in
    weight-row order. The si2 contraction for group j then becomes ONE
    (B, K_j) @ (K_j, mo) MXU matmul per output component p (K_j = total
    input multiplicity), instead of a small matmul per (k, p) -- the
    MXU-utilization move that sets the kernel's speed."""
    per_k, d_out = _si2_plan(tp_spec, si2)
    plan, _ = _tp_plan(tp_spec)
    by_k = {p['k']: p for p in plan}
    groups = {}
    for k, info in per_k.items():
        j = info['j']
        g = groups.setdefault(j, dict(
            path=info['path'], alpha=info['alpha'], mo=info['mo'],
            out_off=info['out_off'], dim3=info['dim3'], ks=[],
        ))
        assert g['path'] == info['path'], 'si2: >1 path per output entry'
        g['ks'].append((by_k[k], info['row']))
    out = []
    for j in sorted(groups):
        g = groups[j]
        g['ks'].sort(key=lambda t: t[1])
        # rows must tile [0, K_j) exactly
        off = 0
        for p_ins, row in g['ks']:
            assert row == off, 'si2 rows not contiguous'
            off += p_ins['mul']
        g['K'] = off
        out.append(g)
    return out, d_out


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
    import jax.nn as jnn
    act = {'silu': jnn.silu, 'tanh': jnp.tanh, 'ssp':
           lambda x: jnn.softplus(x) - math.log(2.0)}.get(act_name, jnn.silu)
    pre0 = _dot(emb, w0 / math.sqrt(w0.shape[0]))
    h0 = act(pre0) * cst
    pre1 = _dot(h0, w1 / math.sqrt(w1.shape[0]))
    h1 = act(pre1) * cst
    w = _dot(h1, w2 / math.sqrt(w2.shape[0]))
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


def _pow2_floor(k: int) -> int:
    return 1 << (max(1, k).bit_length() - 1)


def agg_block_unit(d: int, target: int = 256) -> int:
    """Edge-block size for the aggregated kernel: a power-of-2 multiple
    of d near ~target rows, floored at 8x d -- the kernel's node-row
    output block is (block/d, d_out) and Mosaic requires the sublane
    dim be a multiple of 8 (observed failure: regrown deg_cap=40 gave
    a (4, 576) output block). Power-of-2 multiples guarantee every
    smaller target's block divides the largest one, so one array
    padding serves all layer widths."""
    return d * max(8, _pow2_floor(target // d if target >= d else 1))


@functools.lru_cache(maxsize=None)
def make_fused_conv(
    tp_spec: UVUTensorProductSpec,
    mlp_spec: FullyConnectedNetSpec,
    si2_spec: LinearSpec,
    block_e: int = 1024,
    agg_d: int = 0,
    geom: 'GeomSpec | None' = None,
    ext_w: bool = False,
):
    """fused(xg, sh, emb, maskscale, mlp_ws, si2_ws) -> y, or -- with
    geom set -- fused(xg, edge_vec, maskscale, bessel_coeffs, mlp_ws,
    si2_ws) -> y with Bessel/cutoff/SH computed in-kernel and the
    backward emitting d(edge_vec) directly (see GeomSpec).

    mlp_ws: tuple of raw MLP weights (as stored, N(0,1) scale);
    si2_ws: tuple of si2 path weight matrices (as stored).

    agg_d > 0 activates the dense neighbor-grid contract (row i*D + k =
    atom i's k-th incident edge, ops/scatter.py): the kernel aggregates
    messages over each atom's D rows INSIDE the block and returns
    (E/D, d_out) node rows directly. The aggregation folds into the si2
    contraction as a block-diagonal ones matmul BEFORE the weight dot --
    a D-fold FLOP cut on the si2 stage, a D-fold cut in output HBM
    traffic, and no XLA-side reduction afterwards. The backward reads
    the D-fold smaller node cotangent and re-expands it on the MXU.
    """
    plan, w_numel = _tp_plan(tp_spec)
    groups, d_out = _si2_groups(tp_spec, si2_spec)
    d1 = tp_spec.irreps_in1.dim
    f = tp_spec.irreps_in2.dim
    r = mlp_spec.hs[0]
    act_name = mlp_spec.act
    n_mlp = len(mlp_spec.hs) - 1
    assert n_mlp == 3, 'kernel assumes 2 hidden layers (reference default)'
    n_si2 = len(si2_spec.paths)

    use_cm = _CG_MODE == 'cmshared'

    def _cg_acc(xg_ref, sh_ref, p_ins):
        """CG contraction for one instruction: list of dim3 (B, mul)."""
        mul = p_ins['mul']
        xo, so = p_ins['x_off'], p_ins['sh_off']
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
        return acc

    def fwd_kernel(xg_ref, sh_ref, emb_ref, ms_ref,
                   w0_ref, w1_ref, w2_ref, *rest):
        si2_refs = rest[:n_si2]
        out_ref = rest[-1]
        w_rad, _ = _mlp_forward(
            emb_ref[...], w0_ref[...], w1_ref[...], w2_ref[...], act_name
        )
        w_rad = w_rad * ms_ref[...]
        b = xg_ref.shape[0]
        if agg_d:
            # block-diagonal ones (B/D, B): one MXU matmul sums each
            # atom's D message rows; applied BEFORE the si2 weight dot
            # (legal: si2 is linear), cutting its FLOPs D-fold
            rows = b // agg_d
            A = (jax.lax.broadcasted_iota(jnp.int32, (rows, b), 1)
                 // agg_d
                 == jax.lax.broadcasted_iota(jnp.int32, (rows, b), 0)
                 ).astype(jnp.float32)
        out_ref[...] = jnp.zeros_like(out_ref)
        # group-major: per si2 output entry j, build the weighted message
        # pieces of all feeding instructions, concat along K, and run one
        # (B, K_j) @ (K_j, mo) matmul per output component p
        for grp in groups:
            W = si2_refs[grp['path']][...] * grp['alpha']
            mo, oo = grp['mo'], grp['out_off']
            accw = []  # per feeding k: list of dim3 (B, mul) * wn
            for p_ins, _row in grp['ks']:
                mul, wo = p_ins['mul'], p_ins['w_off']
                wn = w_rad[:, wo:wo + mul]
                acc = _cg_acc(xg_ref, sh_ref, p_ins)
                accw.append([
                    (a if a is not None
                     else jnp.zeros((b, mul), jnp.float32)) * wn
                    for a in acc
                ])
            for p in range(grp['dim3']):
                cat = (jnp.concatenate([aw[p] for aw in accw], axis=1)
                       if len(accw) > 1 else accw[0][p])
                if agg_d:
                    cat = _dot(A, cat)
                out_ref[:, oo + p * mo: oo + (p + 1) * mo] = _dot(cat, W)

    def bwd_kernel(g_ref, xg_ref, sh_ref, emb_ref, ms_ref,
                   w0_ref, w1_ref, w2_ref, *refs):
        si2_refs = refs[:n_si2]
        dxg_ref, dsh_ref, demb_ref = refs[-3:]
        w0, w1, w2 = w0_ref[...], w1_ref[...], w2_ref[...]
        w_rad, (pre0, h0, pre1, h1) = _mlp_forward(
            emb_ref[...], w0, w1, w2, act_name
        )
        ms = ms_ref[...]
        w_eff = w_rad * ms
        if agg_d:
            # expansion matrix (B, B/D): broadcast each atom's node
            # cotangent back to its D edge rows on the MXU
            bb = dxg_ref.shape[0]
            rows = bb // agg_d
            AT = (jax.lax.broadcasted_iota(jnp.int32, (bb, rows), 0)
                  // agg_d
                  == jax.lax.broadcasted_iota(jnp.int32, (bb, rows), 1)
                  ).astype(jnp.float32)
        # register-resident accumulators, refs written ONCE at the end
        dxg_acc = {}      # (offset, width) -> (B, width)
        dsh_acc = {}      # sh column index -> (B, 1)
        dw_eff_cols = {}
        for grp in groups:
            W = si2_refs[grp['path']][...] * grp['alpha']
            mo, oo = grp['mo'], grp['out_off']
            # one (B, mo) @ (mo, K_j) matmul per component p recovers the
            # message gradient for ALL feeding instructions at once
            gmcat = [
                _dot(g_ref[:, oo + p * mo: oo + (p + 1) * mo], W.T)
                for p in range(grp['dim3'])
            ]
            if agg_d:
                gmcat = [_dot(AT, gm) for gm in gmcat]
            for p_ins, row in grp['ks']:
                mul = p_ins['mul']
                xo, so, wo = (p_ins['x_off'], p_ins['sh_off'],
                              p_ins['w_off'])
                wn = w_eff[:, wo:wo + mul]
                gw = [gmcat[p][:, row:row + mul] * wn
                      for p in range(grp['dim3'])]
                xm_cache = {}
                xy_cache = {}
                gxm_cache = {}
                sacc = {}   # n -> (B, mul); lane-reduced ONCE per (k, n)
                dw_acc = None
                nz_by_p = {}
                for (m, n, p, c) in p_ins['nz']:
                    nz_by_p.setdefault(p, []).append((m, n, c))
                for p, terms in nz_by_p.items():
                    acc_p = None
                    for (m, n, c) in terms:
                        if m not in xm_cache:
                            xm_cache[m] = xg_ref[
                                :, xo + m * mul: xo + (m + 1) * mul]
                        xm = xm_cache[m]
                        yn = sh_ref[:, so + n: so + n + 1]
                        kx = (xo + m * mul, mul)
                        v = gw[p] * (yn * c)
                        dxg_acc[kx] = (v if kx not in dxg_acc
                                       else dxg_acc[kx] + v)
                        if (m, p) not in gxm_cache:
                            gxm_cache[(m, p)] = gw[p] * xm
                        s = gxm_cache[(m, p)] * c
                        sacc[n] = s if n not in sacc else sacc[n] + s
                        if (m, n) not in xy_cache:
                            xy_cache[(m, n)] = xm * yn
                        t = xy_cache[(m, n)] * c
                        acc_p = t if acc_p is None else acc_p + t
                    # radial-weight gradient: dw_k = sum_p gm_p * acc_p
                    if acc_p is not None:
                        t = gmcat[p][:, row:row + mul] * acc_p
                        dw_acc = t if dw_acc is None else dw_acc + t
                for n, v in sacc.items():
                    s = jnp.sum(v, axis=1, keepdims=True)
                    kn = so + n
                    dsh_acc[kn] = (s if kn not in dsh_acc
                                   else dsh_acc[kn] + s)
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
                v = jnp.zeros((dxg_ref.shape[0], p_ins['mul']),
                              jnp.float32)
            pieces.append(v)
        dw_eff = jnp.concatenate(pieces, axis=1)
        dw_rad = dw_eff * ms
        dh1 = _dot(dw_rad, (w2 / math.sqrt(w2.shape[0])).T)
        dpre1 = dh1 * _act_grad(pre1, act_name)
        dh0 = _dot(dpre1, (w1 / math.sqrt(w1.shape[0])).T)
        dpre0 = dh0 * _act_grad(pre0, act_name)
        demb_ref[...] = _dot(dpre0, (w0 / math.sqrt(w0.shape[0])).T)

    # ---- feature-major ('cm') kernels ---------------------------------
    # Same math, transposed layout: per-edge tensors become (width, B)
    # with the edge dim on the 128 lanes. One VMEM transpose per input
    # replaces thousands of quarter-full vregs; MXU dots take the
    # transposed operand natively (_dotT).

    def _pad_rows_cm(v, off, total):
        """Zero-pad a (rows, B) block to (total, B) at row offset off.
        Static-shape concat: Mosaic has no dynamic_update_slice, so row
        accumulation into a fixed-height array is pad + add instead."""
        b = v.shape[1]
        pieces = []
        if off > 0:
            pieces.append(jnp.zeros((off, b), jnp.float32))
        pieces.append(v)
        tail = total - off - v.shape[0]
        if tail > 0:
            pieces.append(jnp.zeros((tail, b), jnp.float32))
        return (jnp.concatenate(pieces, axis=0) if len(pieces) > 1
                else pieces[0])

    def _assemble_rows(acc, total, b):
        """Offset-keyed (rows, B) blocks -> one (total, B) array.
        Keys must be non-overlapping (one CG path family per input
        slice); gaps zero-fill."""
        pieces = []
        pos = 0
        for (off, w) in sorted(acc):
            assert off >= pos, 'overlapping row blocks'
            if off > pos:
                pieces.append(jnp.zeros((off - pos, b), jnp.float32))
            pieces.append(acc[(off, w)])
            pos = off + w
        if pos < total:
            pieces.append(jnp.zeros((total - pos, b), jnp.float32))
        return (jnp.concatenate(pieces, axis=0) if len(pieces) > 1
                else pieces[0])

    def _cg_acc_cm(xgT, shT, p_ins, cache=None):
        """CG contraction, feature-major: list of dim3 (mul, B).

        cache: optional dict shared ACROSS instructions ('cmshared'):
        keyed by absolute (x row block, sh column), so instructions on
        the same input slice reuse each other's x*y products."""
        mul = p_ins['mul']
        xo, so = p_ins['x_off'], p_ins['sh_off']
        if cache is None:
            cache = {}
        acc = [None] * p_ins['dim3']
        for (m, n, p, c) in p_ins['nz']:
            key = (xo + m * mul, mul, so + n)
            if key not in cache:
                cache[key] = (
                    xgT[xo + m * mul: xo + (m + 1) * mul, :]
                    * shT[so + n: so + n + 1, :]
                )
            t = cache[key] * c
            acc[p] = t if acc[p] is None else acc[p] + t
        return acc

    def _cm_fwd_core(xgT, shT, w_radT, b, si2_refs):
        """Shared cm forward: weighted CG messages -> (agg) -> si2.
        Returns the (n_rows, d_out) output block (row-major)."""
        if agg_d:
            rows = b // agg_d
            # lane aggregation: catT (K, B) @ AT (B, B/D) sums each
            # atom's D edge lanes on the MXU
            AT = (jax.lax.broadcasted_iota(jnp.int32, (b, rows), 0)
                  // agg_d
                  == jax.lax.broadcasted_iota(jnp.int32, (b, rows), 1)
                  ).astype(jnp.float32)
        out_blocks = {}
        xy_shared = {}
        for grp in groups:
            W = si2_refs[grp['path']][...] * grp['alpha']   # (K, mo)
            mo, oo = grp['mo'], grp['out_off']
            accw = []
            for p_ins, _row in grp['ks']:
                mul, wo = p_ins['mul'], p_ins['w_off']
                wnT = w_radT[wo:wo + mul, :]
                acc = _cg_acc_cm(xgT, shT, p_ins, xy_shared)
                accw.append([
                    (a if a is not None
                     else jnp.zeros((mul, b), jnp.float32)) * wnT
                    for a in acc
                ])
            for p in range(grp['dim3']):
                catT = (jnp.concatenate([aw[p] for aw in accw], axis=0)
                        if len(accw) > 1 else accw[0][p])   # (K, B)
                if agg_d:
                    catT = _dot(catT, AT)
                out_blocks[(oo + p * mo, mo)] = _dotT(W, catT)
        out_rows = next(iter(out_blocks.values())).shape[1]
        return _assemble_rows(out_blocks, d_out, out_rows).T

    def fwd_kernel_cm(xg_ref, sh_ref, emb_ref, ms_ref,
                      w0_ref, w1_ref, w2_ref, *rest):
        si2_refs = rest[:n_si2]
        out_ref = rest[-1]
        w_rad, _ = _mlp_forward(
            emb_ref[...], w0_ref[...], w1_ref[...], w2_ref[...], act_name
        )
        w_radT = (w_rad * ms_ref[...]).T        # (w_numel, B)
        xgT = xg_ref[...].T                     # (d1, B)
        shT = sh_ref[...].T                     # (f, B)
        out_ref[...] = _cm_fwd_core(
            xgT, shT, w_radT, xg_ref.shape[0], si2_refs
        )

    def _cm_bwd_core(gT, xgT, shT, w_effT, b, si2_refs):
        """Shared cm backward: returns (dxgT (d1, B) assembled,
        dshT (f, B), dw_effT (w_numel, B))."""
        if agg_d:
            rows = b // agg_d
            # expansion: (K, rows) @ E (rows, B) broadcasts node
            # cotangents back to edge lanes
            E = (jax.lax.broadcasted_iota(jnp.int32, (rows, b), 1)
                 // agg_d
                 == jax.lax.broadcasted_iota(jnp.int32, (rows, b), 0)
                 ).astype(jnp.float32)
        dxg_acc = {}       # (x offset, width) -> (width, B)
        dshT = jnp.zeros((f, b), jnp.float32)
        dw_eff_cols = {}
        xm_shared = {}     # x row block -> (mul, B)   (cross-instruction)
        xy_shared = {}     # (x row block, sh col) -> (mul, B)
        for grp in groups:
            W = si2_refs[grp['path']][...] * grp['alpha']   # (K, mo)
            mo, oo = grp['mo'], grp['out_off']
            gmcatT = [
                _raw_dot(W, gT[oo + p * mo: oo + (p + 1) * mo, :])
                for p in range(grp['dim3'])
            ]                                   # (K, rows)
            if agg_d:
                gmcatT = [_dot(gm, E) for gm in gmcatT]      # (K, B)
            for p_ins, row in grp['ks']:
                mul = p_ins['mul']
                xo, so, wo = (p_ins['x_off'], p_ins['sh_off'],
                              p_ins['w_off'])
                wnT = w_effT[wo:wo + mul, :]
                gwT = [gmcatT[p][row:row + mul, :] * wnT
                       for p in range(grp['dim3'])]
                gxm_cache = {}
                sacc = {}
                dw_acc = None
                nz_by_p = {}
                for (m, n, p, c) in p_ins['nz']:
                    nz_by_p.setdefault(p, []).append((m, n, c))
                for p, terms in nz_by_p.items():
                    acc_p = None
                    for (m, n, c) in terms:
                        kx = (xo + m * mul, mul)
                        if kx not in xm_shared:
                            xm_shared[kx] = xgT[
                                xo + m * mul: xo + (m + 1) * mul, :]
                        xm = xm_shared[kx]
                        yn = shT[so + n: so + n + 1, :]
                        v = gwT[p] * (yn * c)
                        dxg_acc[kx] = (v if kx not in dxg_acc
                                       else dxg_acc[kx] + v)
                        if (m, p) not in gxm_cache:
                            gxm_cache[(m, p)] = gwT[p] * xm
                        s = gxm_cache[(m, p)] * c
                        sacc[n] = s if n not in sacc else sacc[n] + s
                        kxy = kx + (so + n,)
                        if kxy not in xy_shared:
                            xy_shared[kxy] = xm * yn
                        t = xy_shared[kxy] * c
                        acc_p = t if acc_p is None else acc_p + t
                    if acc_p is not None:
                        t = gmcatT[p][row:row + mul, :] * acc_p
                        dw_acc = t if dw_acc is None else dw_acc + t
                for n, v in sacc.items():
                    s = jnp.sum(v, axis=0, keepdims=True)    # (1, B)
                    dshT = dshT + _pad_rows_cm(s, so + n, f)
                if dw_acc is not None:
                    key = (wo, mul)
                    dw_eff_cols[key] = (
                        dw_acc if key not in dw_eff_cols
                        else dw_eff_cols[key] + dw_acc
                    )
        pieces = []
        for p_ins in plan:
            v = dw_eff_cols.get((p_ins['w_off'], p_ins['mul']))
            if v is None:
                v = jnp.zeros((p_ins['mul'], b), jnp.float32)
            pieces.append(v)
        dw_effT = jnp.concatenate(pieces, axis=0)           # (wn, B)
        return _assemble_rows(dxg_acc, d1, b), dshT, dw_effT

    def bwd_kernel_cm(g_ref, xg_ref, sh_ref, emb_ref, ms_ref,
                      w0_ref, w1_ref, w2_ref, *refs):
        si2_refs = refs[:n_si2]
        dxg_ref, dsh_ref, demb_ref = refs[-3:]
        w0, w1, w2 = w0_ref[...], w1_ref[...], w2_ref[...]
        w_rad, (pre0, h0, pre1, h1) = _mlp_forward(
            emb_ref[...], w0, w1, w2, act_name
        )
        ms = ms_ref[...]
        w_effT = (w_rad * ms).T
        xgT = xg_ref[...].T
        shT = sh_ref[...].T
        gT = g_ref[...].T                       # (d_out, rows)
        b = xg_ref.shape[0]
        dxgT, dshT, dw_effT = _cm_bwd_core(
            gT, xgT, shT, w_effT, b, si2_refs
        )
        dxg_ref[...] = dxgT.T
        dsh_ref[...] = dshT.T
        dw_rad = dw_effT.T * ms
        dh1 = _dot(dw_rad, (w2 / math.sqrt(w2.shape[0])).T)
        dpre1 = dh1 * _act_grad(pre1, act_name)
        dh0 = _dot(dpre1, (w1 / math.sqrt(w1.shape[0])).T)
        dpre0 = dh0 * _act_grad(pre0, act_name)
        demb_ref[...] = _dot(dpre0, (w0 / math.sqrt(w0.shape[0])).T)

    # ---- external-weight kernels (ext_w): the radial MLP runs
    # OUTSIDE the kernel (one big XLA matmul chain over the half
    # list, see half_mlp_enabled above); the kernel consumes the
    # already-scaled per-edge weights and its backward emits dw_eff
    # rows for XLA to route through the MLP/pair-gather VJPs --------

    def fwd_kernel_cm_w(xg_ref, sh_ref, weff_ref, *rest):
        si2_refs = rest[:n_si2]
        out_ref = rest[-1]
        out_ref[...] = _cm_fwd_core(
            xg_ref[...].T, sh_ref[...].T, weff_ref[...].T,
            xg_ref.shape[0], si2_refs,
        )

    def bwd_kernel_cm_w(g_ref, xg_ref, sh_ref, weff_ref, *refs):
        si2_refs = refs[:n_si2]
        dxg_ref, dsh_ref, dweff_ref = refs[-3:]
        dxgT, dshT, dw_effT = _cm_bwd_core(
            g_ref[...].T, xg_ref[...].T, sh_ref[...].T,
            weff_ref[...].T, xg_ref.shape[0], si2_refs,
        )
        dxg_ref[...] = dxgT.T
        dsh_ref[...] = dshT.T
        dweff_ref[...] = dw_effT.T

    # ---- geometry-fused kernels ('geom'): edge vector in, Bessel +
    # cutoff + SH computed in-kernel; backward emits d(edge_vec)
    # directly via jax.vjp over the traced geometry ------------------

    def _mlp_fm(embT, w0, w1, w2):
        """Feature-major radial MLP: (nb, B) -> (w_numel, B); hiddens
        kept feature-major so no transposes appear anywhere."""
        cst = NORMALIZE2MOM_CST[act_name]
        import jax.nn as jnn
        act = {'silu': jnn.silu, 'tanh': jnp.tanh, 'ssp':
               lambda v: jnn.softplus(v) - math.log(2.0)
               }.get(act_name, jnn.silu)
        pre0 = _dotT(w0 / math.sqrt(w0.shape[0]), embT)
        h0 = act(pre0) * cst
        pre1 = _dotT(w1 / math.sqrt(w1.shape[0]), h0)
        h1 = act(pre1) * cst
        wT = _dotT(w2 / math.sqrt(w2.shape[0]), h1)
        return wT, (pre0, h0, pre1, h1)

    def fwd_kernel_geom(xg_ref, vec_ref, ms_ref, cf_ref,
                        w0_ref, w1_ref, w2_ref, *rest):
        si2_refs = rest[:n_si2]
        out_ref = rest[-1]
        vT = vec_ref[...].T                     # (3, B)
        coeffs = cf_ref[...][0]                 # (nb,)
        embT, shT = _geom_fm(vT, coeffs, geom)
        w_radT, _ = _mlp_fm(embT, w0_ref[...], w1_ref[...], w2_ref[...])
        w_radT = w_radT * ms_ref[...].T
        xgT = xg_ref[...].T
        out_ref[...] = _cm_fwd_core(
            xgT, shT, w_radT, xg_ref.shape[0], si2_refs
        )

    def bwd_kernel_geom(g_ref, xg_ref, vec_ref, ms_ref, cf_ref,
                        w0_ref, w1_ref, w2_ref, *refs):
        si2_refs = refs[:n_si2]
        dxg_ref, dvec_ref = refs[-2:]
        w0, w1, w2 = w0_ref[...], w1_ref[...], w2_ref[...]
        vT = vec_ref[...].T
        coeffs = cf_ref[...][0]
        (embT, shT), geom_vjp = jax.vjp(
            lambda v: _geom_fm(v, coeffs, geom), vT
        )
        w_radT, (pre0, h0, pre1, h1) = _mlp_fm(embT, w0, w1, w2)
        msT = ms_ref[...].T                     # (1, B)
        w_effT = w_radT * msT
        xgT = xg_ref[...].T
        gT = g_ref[...].T
        b = xg_ref.shape[0]
        dxgT, dshT, dw_effT = _cm_bwd_core(
            gT, xgT, shT, w_effT, b, si2_refs
        )
        dxg_ref[...] = dxgT.T
        # radial chain, feature-major
        dw_radT = dw_effT * msT
        dh1 = _raw_dot(w2 / math.sqrt(w2.shape[0]), dw_radT)
        dpre1 = dh1 * _act_grad(pre1, act_name)
        dh0 = _raw_dot(w1 / math.sqrt(w1.shape[0]), dpre1)
        dpre0 = dh0 * _act_grad(pre0, act_name)
        dembT = _raw_dot(w0 / math.sqrt(w0.shape[0]), dpre0)
        dvT, = geom_vjp((dembT, dshT))
        dvec_ref[...] = dvT.T

    if use_cm:
        fwd_kernel = fwd_kernel_cm
        bwd_kernel = bwd_kernel_cm

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

    _cparams = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)

    def _pad_rows(a, ep, fill=0.0):
        """Pad edge-row arrays to the block-aligned count ep. Pad rows
        are inert: ms rows are zero (w_eff -> 0 kills their messages
        fwd and bwd) and padded output/cotangent rows are sliced off."""
        e = a.shape[0]
        if e == ep:
            return a
        if fill == 0.0:
            pad = jnp.zeros((ep - e,) + a.shape[1:], a.dtype)
        else:
            pad = jnp.full((ep - e,) + a.shape[1:], fill, a.dtype)
        return jnp.concatenate([a, pad], axis=0)

    def _pad_e(e):
        """Smallest block-aligned row count >= e. Lets callers use
        blocks that do not divide the natural row count (e.g. E=32000
        with 1024-row blocks): pad rows cost <= one extra block."""
        unit = fwd_block * bwd_block // math.gcd(fwd_block, bwd_block)
        return -(-e // unit) * unit

    def fwd_call(xg, sh, emb, ms, mlp_ws, si2_ws):
        e = xg.shape[0]
        ep = _pad_e(e)
        if ep != e:
            xg, sh, emb, ms = (_pad_rows(xg, ep), _pad_rows(sh, ep),
                               _pad_rows(emb, ep), _pad_rows(ms, ep))
            out = fwd_call(xg, sh, emb, ms, mlp_ws, si2_ws)
            return out[:e // agg_d if agg_d else e]
        mlp_shapes = [w.shape for w in mlp_ws]
        si2_shapes = [w.shape for w in si2_ws]
        n_out = e // agg_d if agg_d else e
        out_rows = fwd_block // agg_d if agg_d else fwd_block
        return pl.pallas_call(
            fwd_kernel,
            out_shape=jax.ShapeDtypeStruct((n_out, d_out), xg.dtype),
            grid=(e // fwd_block,),
            in_specs=(
                _especs([d1, f, r, 1], fwd_block)
                + _wspecs(mlp_shapes) + _wspecs(si2_shapes)
            ),
            out_specs=_especs([d_out], out_rows)[0],
            interpret=_INTERPRET,
            compiler_params=_cparams,
        )(xg, sh, emb, ms, *mlp_ws, *si2_ws)

    # block sizes: the bwd carries ~2x the fwd working set (accumulators
    # + caches); with the raised scoped-VMEM cap both run at large
    # blocks. Large-lmax specs (l3i5: d1=592, w_numel=1600, ~2x the
    # instruction count) still need smaller blocks. Aggregated kernels
    # need edge blocks that are multiples of agg_d.
    import os
    width = d1 + d_out + w_numel
    # 1024-row blocks measured +4% over 256 on the 1k bench (v5e,
    # 2026-08-19: 25.11 vs 24.19 ns/day; 2048 regressed to 24.77) --
    # wider node-row outputs lift the narrow-N agg/si2 dots. Row
    # padding (_pad_e) makes non-dividing row counts legal.
    #
    # PER-VARIANT: the geom kernels compute Bessel/cutoff/SH (and
    # their VJPs) in-kernel, so their live per-row scratch is much
    # larger than the plain kernels'; at 1024-row blocks the geom bwd
    # blew XLA's 16 MiB scoped-VMEM budget around the custom call
    # (28.19 MiB measured on the round-4 driver bench, the 97k leg's
    # compile failure). The geom kernels stay at the round-3/4
    # measured-good 256 rows (97k 1.50 s/step); _fits_scoped_vmem
    # below enforces the calibrated budget for every variant.
    fwd_target = 1024 if width <= 2200 else 128
    bwd_target = 1024 if width <= 2200 else 64
    if geom is not None:
        fwd_target = min(fwd_target, 256)
        bwd_target = min(bwd_target, 256)

    def _fits_scoped_vmem(rows: int, is_bwd: bool) -> bool:
        """Calibrated scoped-VMEM model for XLA's fusion around the
        pallas custom call. XLA's default scoped budget is 16 MiB
        (raisable via --xla_tpu_scoped_vmem_limit_kib, NOT via the
        Mosaic vmem_limit_bytes compiler param). Calibration point:
        geom bwd, d1=480, agg mid layer, 1024 rows -> 28.19 MiB
        (round-4 driver bench OOM), i.e. ~27.5 KiB/row; the model
        below reproduces it with a 3.4x Mosaic-scratch margin over
        the raw double-buffered block IO. Plain (precomputed sh/emb)
        kernels measured fine at 1024 rows on v5e, margin 1.6x."""
        if geom is not None:
            # calibration: geom bwd, 1024 rows, d1=480 -> 28.19 MiB
            # measured (round-4 driver OOM) => margin 3.4
            in_row, out_row = d1 + 3 + 1, (d1 + 3) if is_bwd else 0
            margin = 3.4
        elif ext_w:
            # bound: ext_w bwd at 1024 rows, deg 32, COMPILED AND RAN
            # on v5e (round-4 driver bench, 1k half-MLP leg) => actual
            # margin <= 0.82 for its ~2370 f32/row; 0.75 keeps that
            # known-good config legal while still capping growth
            in_row = d1 + f + w_numel
            out_row = (d1 + f + w_numel) if is_bwd else 0
            margin = 0.75
        else:
            # bound: plain agg bwd at 1024 rows compiled and ran on
            # v5e (the +4% 1k measurement, commit 11ac76b)
            in_row = d1 + f + r + 1
            out_row = (d1 + f + r) if is_bwd else 0
            margin = 1.6
        if is_bwd:
            in_row += -(-d_out // max(agg_d, 1))
        else:
            out_row += -(-d_out // max(agg_d, 1))
        est = 2 * 4 * rows * (in_row + out_row) * margin
        return est <= 15.5 * 2 ** 20

    def _shrink_to_fit(rows: int, is_bwd: bool) -> int:
        while rows > (agg_d or 8) and not _fits_scoped_vmem(rows, is_bwd):
            rows //= 2
        if agg_d:
            rows = agg_block_unit(agg_d, rows)
        return max(rows, agg_d or 8)

    if agg_d:
        fwd_block = agg_block_unit(agg_d, min(block_e, fwd_target))
        bwd_block = agg_block_unit(agg_d, min(block_e, bwd_target))
    else:
        fwd_block = min(block_e, fwd_target)
        bwd_block = min(block_e, bwd_target)
    fwd_block = _shrink_to_fit(fwd_block, is_bwd=False)
    bwd_block = _shrink_to_fit(bwd_block, is_bwd=True)
    # perf-tuning overrides (benchmarks only; normal paths use
    # defaults). Snap to a legal block: aggregated kernels need the
    # edge block to be a multiple of agg_d with the node-row output
    # block a multiple of 8 sublanes -- a raw override (e.g. 1024 at
    # deg_cap 28) silently mis-slices the output grid otherwise
    # (caught 2026-08-18: dF jumped 300x with no error raised).
    def _snap(v):
        v = int(v)
        return agg_block_unit(agg_d, v) if agg_d else max(8, v)
    fwd_block = _snap(os.environ.get('SEVENNET_CONV_FWD_BLOCK',
                                     fwd_block))
    bwd_block = _snap(os.environ.get('SEVENNET_CONV_BWD_BLOCK',
                                     bwd_block))

    def bwd_call(res, g):
        xg, sh, emb, ms, mlp_ws, si2_ws = res
        e = xg.shape[0]
        ep = _pad_e(e)
        if ep != e:
            gp = _pad_rows(g, ep // agg_d if agg_d else ep)
            res_p = (_pad_rows(xg, ep), _pad_rows(sh, ep),
                     _pad_rows(emb, ep), _pad_rows(ms, ep),
                     mlp_ws, si2_ws)
            out = bwd_call(res_p, gp)
            return (out[0][:e], out[1][:e], out[2][:e],
                    jnp.zeros_like(ms)) + out[4:]
        mlp_shapes = [w.shape for w in mlp_ws]
        si2_shapes = [w.shape for w in si2_ws]
        g_rows = bwd_block // agg_d if agg_d else bwd_block
        dxg, dsh, demb = pl.pallas_call(
            bwd_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((e, d1), xg.dtype),
                jax.ShapeDtypeStruct((e, f), xg.dtype),
                jax.ShapeDtypeStruct((e, r), xg.dtype),
            ),
            grid=(e // bwd_block,),
            in_specs=(
                _especs([d_out], g_rows)
                + _especs([d1, f, r, 1], bwd_block)
                + _wspecs(mlp_shapes) + _wspecs(si2_shapes)
            ),
            out_specs=tuple(_especs([d1, f, r], bwd_block)),
            interpret=_INTERPRET,
            compiler_params=_cparams,
        )(g, xg, sh, emb, ms, *mlp_ws, *si2_ws)
        zeros_mlp = tuple(jnp.zeros_like(w) for w in mlp_ws)
        zeros_si2 = tuple(jnp.zeros_like(w) for w in si2_ws)
        return (dxg, dsh, demb, jnp.zeros_like(ms), zeros_mlp, zeros_si2)

    def fwd_call_geom(xg, vec, ms, coeffs, mlp_ws, si2_ws):
        e = xg.shape[0]
        ep = _pad_e(e)
        if ep != e:
            # pad vec with unit x-vectors: r=0 rows would NaN the
            # in-kernel Bessel/SH; ms=0 kills their messages anyway
            vp = jnp.concatenate([vec, jnp.tile(jnp.asarray(
                [[1.0, 0.0, 0.0]], vec.dtype), (ep - e, 1))])
            out = fwd_call_geom(_pad_rows(xg, ep), vp,
                                _pad_rows(ms, ep), coeffs,
                                mlp_ws, si2_ws)
            return out[:e // agg_d if agg_d else e]
        mlp_shapes = [w.shape for w in mlp_ws]
        si2_shapes = [w.shape for w in si2_ws]
        n_out = e // agg_d if agg_d else e
        out_rows = fwd_block // agg_d if agg_d else fwd_block
        cf = coeffs.reshape(1, -1)
        return pl.pallas_call(
            fwd_kernel_geom,
            out_shape=jax.ShapeDtypeStruct((n_out, d_out), xg.dtype),
            grid=(e // fwd_block,),
            in_specs=(
                _especs([d1, 3, 1], fwd_block)
                + _wspecs([cf.shape])
                + _wspecs(mlp_shapes) + _wspecs(si2_shapes)
            ),
            out_specs=_especs([d_out], out_rows)[0],
            interpret=_INTERPRET,
            compiler_params=_cparams,
        )(xg, vec, ms, cf, *mlp_ws, *si2_ws)

    def bwd_call_geom(res, g):
        xg, vec, ms, coeffs, mlp_ws, si2_ws = res
        e = xg.shape[0]
        ep = _pad_e(e)
        if ep != e:
            vp = jnp.concatenate([vec, jnp.tile(jnp.asarray(
                [[1.0, 0.0, 0.0]], vec.dtype), (ep - e, 1))])
            gp = _pad_rows(g, ep // agg_d if agg_d else ep)
            out = bwd_call_geom(
                (_pad_rows(xg, ep), vp, _pad_rows(ms, ep), coeffs,
                 mlp_ws, si2_ws), gp)
            return (out[0][:e], out[1][:e],
                    jnp.zeros_like(ms)) + out[3:]
        mlp_shapes = [w.shape for w in mlp_ws]
        si2_shapes = [w.shape for w in si2_ws]
        g_rows = bwd_block // agg_d if agg_d else bwd_block
        cf = coeffs.reshape(1, -1)
        dxg, dvec = pl.pallas_call(
            bwd_kernel_geom,
            out_shape=(
                jax.ShapeDtypeStruct((e, d1), xg.dtype),
                jax.ShapeDtypeStruct((e, 3), xg.dtype),
            ),
            grid=(e // bwd_block,),
            in_specs=(
                _especs([d_out], g_rows)
                + _especs([d1, 3, 1], bwd_block)
                + _wspecs([cf.shape])
                + _wspecs(mlp_shapes) + _wspecs(si2_shapes)
            ),
            out_specs=tuple(_especs([d1, 3], bwd_block)),
            interpret=_INTERPRET,
            compiler_params=_cparams,
        )(g, xg, vec, ms, cf, *mlp_ws, *si2_ws)
        zeros_mlp = tuple(jnp.zeros_like(w) for w in mlp_ws)
        zeros_si2 = tuple(jnp.zeros_like(w) for w in si2_ws)
        return (dxg, dvec, jnp.zeros_like(ms), jnp.zeros_like(coeffs),
                zeros_mlp, zeros_si2)

    def fwd_call_w(xg, sh, weff, si2_ws):
        e = xg.shape[0]
        ep = _pad_e(e)
        if ep != e:
            out = fwd_call_w(_pad_rows(xg, ep), _pad_rows(sh, ep),
                             _pad_rows(weff, ep), si2_ws)
            return out[:e // agg_d if agg_d else e]
        si2_shapes = [w.shape for w in si2_ws]
        n_out = e // agg_d if agg_d else e
        out_rows = fwd_block // agg_d if agg_d else fwd_block
        return pl.pallas_call(
            fwd_kernel_cm_w,
            out_shape=jax.ShapeDtypeStruct((n_out, d_out), xg.dtype),
            grid=(e // fwd_block,),
            in_specs=(
                _especs([d1, f, w_numel], fwd_block)
                + _wspecs(si2_shapes)
            ),
            out_specs=_especs([d_out], out_rows)[0],
            interpret=_INTERPRET,
            compiler_params=_cparams,
        )(xg, sh, weff, *si2_ws)

    def bwd_call_w(res, g):
        xg, sh, weff, si2_ws = res
        e = xg.shape[0]
        ep = _pad_e(e)
        if ep != e:
            gp = _pad_rows(g, ep // agg_d if agg_d else ep)
            out = bwd_call_w((_pad_rows(xg, ep), _pad_rows(sh, ep),
                              _pad_rows(weff, ep), si2_ws), gp)
            return (out[0][:e], out[1][:e], out[2][:e]) + out[3:]
        si2_shapes = [w.shape for w in si2_ws]
        g_rows = bwd_block // agg_d if agg_d else bwd_block
        dxg, dsh, dweff = pl.pallas_call(
            bwd_kernel_cm_w,
            out_shape=(
                jax.ShapeDtypeStruct((e, d1), xg.dtype),
                jax.ShapeDtypeStruct((e, f), xg.dtype),
                jax.ShapeDtypeStruct((e, w_numel), xg.dtype),
            ),
            grid=(e // bwd_block,),
            in_specs=(
                _especs([d_out], g_rows)
                + _especs([d1, f, w_numel], bwd_block)
                + _wspecs(si2_shapes)
            ),
            out_specs=tuple(_especs([d1, f, w_numel], bwd_block)),
            interpret=_INTERPRET,
            compiler_params=_cparams,
        )(g, xg, sh, weff, *si2_ws)
        zeros_si2 = tuple(jnp.zeros_like(w) for w in si2_ws)
        return (dxg, dsh, dweff, zeros_si2)

    if ext_w:
        assert use_cm, 'ext_w kernels are feature-major (cm) only'
        assert geom is None

        @jax.custom_vjp
        def fusedw(xg, sh, weff, si2_ws):
            return fwd_call_w(xg, sh, weff, si2_ws)

        def fusedw_fwd(xg, sh, weff, si2_ws):
            return (fwd_call_w(xg, sh, weff, si2_ws),
                    (xg, sh, weff, si2_ws))

        fusedw.defvjp(fusedw_fwd, bwd_call_w)
        fusedw.fwd_only = fwd_call_w
        fusedw.bwd_only = bwd_call_w
        fusedw.blocks = (fwd_block, bwd_block)
        fusedw.scoped_vmem_fits = _fits_scoped_vmem
        return fusedw, d_out

    if geom is not None:
        assert use_cm, 'geom kernels are feature-major (cm) only'

        @jax.custom_vjp
        def fusedg(xg, vec, ms, coeffs, mlp_ws, si2_ws):
            return fwd_call_geom(xg, vec, ms, coeffs, mlp_ws, si2_ws)

        def fusedg_fwd(xg, vec, ms, coeffs, mlp_ws, si2_ws):
            return (fwd_call_geom(xg, vec, ms, coeffs, mlp_ws, si2_ws),
                    (xg, vec, ms, coeffs, mlp_ws, si2_ws))

        fusedg.defvjp(fusedg_fwd, bwd_call_geom)
        fusedg.fwd_only = fwd_call_geom
        fusedg.bwd_only = bwd_call_geom
        fusedg.blocks = (fwd_block, bwd_block)
        fusedg.scoped_vmem_fits = _fits_scoped_vmem
        return fusedg, d_out

    @jax.custom_vjp
    def fused(xg, sh, emb, ms, mlp_ws, si2_ws):
        return fwd_call(xg, sh, emb, ms, mlp_ws, si2_ws)

    def fused_fwd(xg, sh, emb, ms, mlp_ws, si2_ws):
        return (fwd_call(xg, sh, emb, ms, mlp_ws, si2_ws),
                (xg, sh, emb, ms, mlp_ws, si2_ws))

    fused.defvjp(fused_fwd, bwd_call)
    # raw entries for callers that orchestrate their own VJP (the
    # packed-chunked conv path wraps gather+unpack+kernel in ONE
    # custom_vjp so remat never recomputes the kernel forward --
    # bwd_only(res=(xg, sh, emb, ms, mlp_ws, si2_ws), g) -> cotangents)
    fused.fwd_only = fwd_call
    fused.bwd_only = bwd_call
    fused.blocks = (fwd_block, bwd_block)
    fused.scoped_vmem_fits = _fits_scoped_vmem
    return fused, d_out
