"""Equivariant primitives: Linear, uvu TensorProduct, FullyConnectedTP, Gate.

Torch-free JAX reimplementation of the e3nn building blocks SevenNet uses
(reference sevenn/nn/convolution.py, linear.py, self_connection.py,
equivariant_gate.py). Normalization conventions match e3nn >= 0.5:

  - irrep_normalization='component': per-path factor sqrt(2*l_out+1) on the
    unit-Frobenius-norm wigner-3j kernel.
  - path_normalization='element': divide by sqrt(sum of fan-in elements over
    all paths feeding the same output slot).
  - weights are initialized ~ N(0,1); the normalization factors are applied
    in the forward pass (so stored weights are directly interchangeable with
    e3nn state dicts).

TPU layout: features use **ir_mul** order -- within each (mul, ir) entry
the flat index is m * mul + u, i.e. the multiplicity (up to 128 channels)
is the minor/lane dimension. Linears then become (rows x mul) matmuls on
the MXU, and Clebsch-Gordan contractions expand into a static list of
nonzero-coefficient FMAs over (E, mul) arrays on the VPU -- no tiny
3x5-shaped contractions. This is internal only: e3nn checkpoint weights
are m-agnostic, so stored weights are unaffected (the opposite of e3nn's
mul_ir layout, cf. cuEquivariance's layout option in the reference
cue_helper.py).

All specs are built once at model-construction time (static metadata +
numpy constants); `apply` functions are pure and jit-friendly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..irreps import Irrep, Irreps, MulIrrep
from .normalize import normalized_activation
from .wigner import wigner_3j

Array = jnp.ndarray
Params = Dict[str, Array]


# ---------------------------------------------------------------------------
# Linear (e3nn o3.Linear)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class LinearSpec:
    """e3nn o3.Linear over simplified irreps (one path per matching ir)."""
    irreps_in: Irreps
    irreps_out: Irreps
    biases: bool = False
    # per-path: (i_in, i_out, mul_in, mul_out, alpha)
    paths: Tuple[Tuple[int, int, int, int, float], ...] = field(default=None)  # type: ignore

    def __post_init__(self):
        irreps_in = Irreps(self.irreps_in).simplify()
        irreps_out = Irreps(self.irreps_out).simplify()
        object.__setattr__(self, 'irreps_in', irreps_in)
        object.__setattr__(self, 'irreps_out', irreps_out)
        paths = []
        # fan-in per output slot (path_normalization='element')
        fan_in = [0] * len(irreps_out)
        for j, (mul_out, ir_out) in enumerate(irreps_out):
            for i, (mul_in, ir_in) in enumerate(irreps_in):
                if ir_in == ir_out:
                    fan_in[j] += mul_in
        for i, (mul_in, ir_in) in enumerate(irreps_in):
            for j, (mul_out, ir_out) in enumerate(irreps_out):
                if ir_in == ir_out:
                    alpha = 1.0 / math.sqrt(fan_in[j]) if fan_in[j] > 0 else 0.0
                    paths.append((i, j, mul_in, mul_out, alpha))
        object.__setattr__(self, 'paths', tuple(paths))

    @property
    def weight_numel(self) -> int:
        n = sum(mi * mo for _, _, mi, mo, _ in self.paths)
        if self.biases:
            n += sum(
                mul for mul, ir in self.irreps_out if ir == Irrep(0, 1)
            )
        return n

    def init(self, key) -> Params:
        params: Params = {}
        keys = jax.random.split(key, max(len(self.paths), 1))
        for n, (i, j, mi, mo, _) in enumerate(self.paths):
            params[f'w{n}'] = jax.random.normal(keys[n], (mi, mo))
        if self.biases:
            for j, (mul, ir) in enumerate(self.irreps_out):
                if ir == Irrep(0, 1):
                    params[f'b{j}'] = jnp.zeros((mul,))
        return params

    def apply(self, params: Params, x: Array, skip_bias: bool = False) -> Array:
        """x: (..., dim) in ir_mul layout; one MXU matmul per path."""
        in_slices = self.irreps_in.slices()
        lead = x.shape[:-1]
        out_blocks: List[Optional[Array]] = [None] * len(self.irreps_out)
        for n, (i, j, mi, mo, alpha) in enumerate(self.paths):
            dim = self.irreps_in[i].ir.dim
            xi = x[..., in_slices[i]]
            # (..., m, u) -> rows (...*m, u) @ (u, v)
            xi = xi.reshape((-1, mi))
            w = params[f'w{n}'].astype(x.dtype) * alpha
            o = (xi @ w).reshape(lead + (dim, mo))
            if out_blocks[j] is None:
                out_blocks[j] = o
            else:
                out_blocks[j] = out_blocks[j] + o
        outs = []
        for j, (mul, ir) in enumerate(self.irreps_out):
            blk = out_blocks[j]
            if blk is None:
                blk = jnp.zeros(lead + (ir.dim, mul), dtype=x.dtype)
            if (self.biases and not skip_bias and ir == Irrep(0, 1)
                    and f'b{j}' in params):
                blk = blk + params[f'b{j}'].astype(x.dtype)
            outs.append(blk.reshape(lead + (mul * ir.dim,)))
        return jnp.concatenate(outs, axis=-1)

    def bias_vector(self, params: Params, dtype) -> Optional[Array]:
        """Full-width bias (ir_mul layout) or None."""
        if not self.biases:
            return None
        pieces = []
        any_bias = False
        for j, (mul, ir) in enumerate(self.irreps_out):
            if ir == Irrep(0, 1) and f'b{j}' in params:
                pieces.append(params[f'b{j}'].astype(dtype))
                any_bias = True
            else:
                pieces.append(jnp.zeros((mul * ir.dim,), dtype))
        return jnp.concatenate(pieces) if any_bias else None


# ---------------------------------------------------------------------------
# uvu TensorProduct with per-edge external weights (the convolution kernel)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class UVUTensorProductSpec:
    """e3nn TensorProduct(irreps_x, irreps_filter, irreps_mid, 'uvu' instrs,
    shared_weights=False, internal_weights=False).

    Instruction generation mirrors reference sevenn/nn/convolution.py:60-81:
    nested loop over (i_x, j_filter), keep ir_out contained in irreps_out,
    sort output irreps, then (v0.11+) sort instructions by i_out.
    """
    irreps_in1: Irreps
    irreps_in2: Irreps
    irreps_out_filter: Irreps  # which ir are kept (drop l>lmax etc.)
    # derived:
    irreps_out: Irreps = field(default=None)  # type: ignore  # sorted, unsimplified
    instructions: Tuple[Tuple[int, int, int], ...] = field(default=None)  # type: ignore
    # pre-sort order (v<=0.10 checkpoint weight layout; cf. reference
    # scripts/backward_compatibility.py:74-155 sort_old_convolution)
    instructions_unsorted: Tuple[Tuple[int, int, int], ...] = field(default=None)  # type: ignore
    weight_numel: int = field(default=None)  # type: ignore

    def __post_init__(self):
        irreps_x = Irreps(self.irreps_in1)
        irreps_filter = Irreps(self.irreps_in2)
        keep = Irreps(self.irreps_out_filter)
        instructions = []
        irreps_mid: List[MulIrrep] = []
        weight_numel = 0
        for i, (mul_x, ir_x) in enumerate(irreps_x):
            for j, (_, ir_f) in enumerate(irreps_filter):
                for ir_out in ir_x * ir_f:
                    if ir_out in keep:
                        k = len(irreps_mid)
                        weight_numel += mul_x
                        irreps_mid.append(MulIrrep(mul_x, ir_out))
                        instructions.append((i, j, k))
        srt, p, _ = Irreps(irreps_mid).sort()
        instructions = [(i1, i2, p[k]) for (i1, i2, k) in instructions]
        unsorted = tuple(instructions)
        instructions = sorted(instructions, key=lambda t: t[2])
        object.__setattr__(self, 'irreps_in1', irreps_x)
        object.__setattr__(self, 'irreps_in2', irreps_filter)
        object.__setattr__(self, 'irreps_out', srt)
        object.__setattr__(self, 'instructions', tuple(instructions))
        object.__setattr__(self, 'instructions_unsorted', unsorted)
        object.__setattr__(self, 'weight_numel', weight_numel)

    def alphas(self) -> List[float]:
        """Per-instruction sqrt(alpha), e3nn component/element normalization.

        num_elements('uvu') = mul of in2 (==1 for SH filters); fan-in per
        output slot sums num_elements over instructions hitting that slot.
        """
        fan = {}
        for (i1, i2, k) in self.instructions:
            fan[k] = fan.get(k, 0) + self.irreps_in2[i2].mul
        out = []
        for (i1, i2, k) in self.instructions:
            l3 = self.irreps_out[k].ir.l
            out.append(math.sqrt((2 * l3 + 1) / fan[k]))
        return out

    def cg_nonzeros(self) -> List[Tuple[int, Tuple[Tuple[int, int, int, float], ...]]]:
        """Per instruction: static list of nonzero CG entries (m, n, p, c)."""
        alphas = self.alphas()
        res = []
        for n_i, (i1, i2, k) in enumerate(self.instructions):
            ir1 = self.irreps_in1[i1].ir
            ir2 = self.irreps_in2[i2].ir
            ir3 = self.irreps_out[k].ir
            C = wigner_3j(ir1.l, ir2.l, ir3.l) * alphas[n_i]
            nz = []
            for m in range(ir1.dim):
                for n in range(ir2.dim):
                    for p in range(ir3.dim):
                        c = C[m, n, p]
                        if abs(c) > 1e-12:
                            nz.append((m, n, p, float(c)))
            res.append((n_i, tuple(nz)))
        return res

    def apply(self, x: Array, y: Array, w: Array) -> Array:
        """x: (..., dim1) ir_mul layout, y: (..., dim2) SH (mul 1),
        w: (..., weight_numel).

        CG contraction as a static sum of scalar-coefficient FMAs over
        (..., mul) arrays: VPU-shaped, no small-dim matmuls.
        """
        s1 = self.irreps_in1.slices()
        s2 = self.irreps_in2.slices()
        nonzeros = self.cg_nonzeros()
        w_off = 0
        blocks: List[Optional[List[Optional[Array]]]] = [
            None] * len(self.irreps_out)
        for (n_i, nz), (i1, i2, k) in zip(nonzeros, self.instructions):
            mul1, ir1 = self.irreps_in1[i1]
            mul3, ir3 = self.irreps_out[k]
            o1 = s1[i1].start
            o2 = s2[i2].start
            wn = w[..., w_off:w_off + mul1]
            w_off += mul1
            # group nonzeros by (m, n) so each x*y product is formed once
            prod_cache = {}
            acc: List[Optional[Array]] = [None] * ir3.dim
            for (m, n, p, c) in nz:
                key = (m, n)
                if key not in prod_cache:
                    xm = x[..., o1 + m * mul1: o1 + (m + 1) * mul1]
                    yn = y[..., o2 + n: o2 + n + 1]
                    prod_cache[key] = xm * yn
                t = prod_cache[key] * c
                acc[p] = t if acc[p] is None else acc[p] + t
            # per-edge weights (same for all p)
            outp = [
                (a if a is not None
                 else jnp.zeros(x.shape[:-1] + (mul1,), x.dtype)) * wn
                for a in acc
            ]
            if blocks[k] is None:
                blocks[k] = outp
            else:
                blocks[k] = [b + o for b, o in zip(blocks[k], outp)]
        outs = []
        for k, (mul, ir) in enumerate(self.irreps_out):
            assert blocks[k] is not None
            outs.extend(blocks[k])
        return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# FullyConnectedTensorProduct (self-connection intro, 'nequip' type)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FullyConnectedTPSpec:
    """e3nn FullyConnectedTensorProduct: 'uvw' paths, internal weights."""
    irreps_in1: Irreps
    irreps_in2: Irreps
    irreps_out: Irreps
    instructions: Tuple[Tuple[int, int, int], ...] = field(default=None)  # type: ignore

    def __post_init__(self):
        in1 = Irreps(self.irreps_in1).simplify()
        in2 = Irreps(self.irreps_in2).simplify()
        out = Irreps(self.irreps_out).simplify()
        instrs = []
        for i1, (m1, ir1) in enumerate(in1):
            for i2, (m2, ir2) in enumerate(in2):
                for k, (m3, ir3) in enumerate(out):
                    if ir3 in ir1 * ir2:
                        instrs.append((i1, i2, k))
        object.__setattr__(self, 'irreps_in1', in1)
        object.__setattr__(self, 'irreps_in2', in2)
        object.__setattr__(self, 'irreps_out', out)
        object.__setattr__(self, 'instructions', tuple(instrs))

    def alphas(self) -> List[float]:
        fan = {}
        for (i1, i2, k) in self.instructions:
            fan[k] = fan.get(k, 0) + (
                self.irreps_in1[i1].mul * self.irreps_in2[i2].mul
            )
        res = []
        for (i1, i2, k) in self.instructions:
            l3 = self.irreps_out[k].ir.l
            res.append(math.sqrt((2 * l3 + 1) / fan[k]))
        return res

    @property
    def weight_numel(self) -> int:
        return sum(
            self.irreps_in1[i1].mul
            * self.irreps_in2[i2].mul
            * self.irreps_out[k].mul
            for (i1, i2, k) in self.instructions
        )

    def init(self, key) -> Params:
        params: Params = {}
        keys = jax.random.split(key, max(len(self.instructions), 1))
        for n, (i1, i2, k) in enumerate(self.instructions):
            shape = (
                self.irreps_in1[i1].mul,
                self.irreps_in2[i2].mul,
                self.irreps_out[k].mul,
            )
            params[f'w{n}'] = jax.random.normal(keys[n], shape)
        return params

    def apply(self, params: Params, x: Array, y: Array) -> Array:
        """ir_mul layout; CG expanded over nonzeros, weight contraction
        ('uvw') as einsum rows x (u*v) @ (u*v, w) on the MXU."""
        s1 = self.irreps_in1.slices()
        s2 = self.irreps_in2.slices()
        alphas = self.alphas()
        lead = x.shape[:-1]
        # per output entry: list of ir3.dim accumulators of shape (..., mul3)
        blocks: List[Optional[List[Optional[Array]]]] = [
            None] * len(self.irreps_out)
        for n, (i1, i2, k) in enumerate(self.instructions):
            m1, ir1 = self.irreps_in1[i1]
            m2, ir2 = self.irreps_in2[i2]
            m3, ir3 = self.irreps_out[k]
            C = wigner_3j(ir1.l, ir2.l, ir3.l) * alphas[n]
            w = params[f'w{n}'].astype(x.dtype)
            o1, o2 = s1[i1].start, s2[i2].start
            acc: List[Optional[Array]] = [None] * ir3.dim
            for m in range(ir1.dim):
                xm = x[..., o1 + m * m1: o1 + (m + 1) * m1]
                for n2 in range(ir2.dim):
                    cvec = C[m, n2]
                    if not np.any(np.abs(cvec) > 1e-12):
                        continue
                    yn = y[..., o2 + n2 * m2: o2 + (n2 + 1) * m2]
                    # t[..., w'] = sum_{u,v} x[...,u] y[...,v] w[u,v,w']
                    t = jnp.einsum('...u,...v,uvw->...w', xm, yn, w)
                    for p in range(ir3.dim):
                        c = float(cvec[p])
                        if abs(c) > 1e-12:
                            tc = t * c
                            acc[p] = tc if acc[p] is None else acc[p] + tc
            outp = [
                a if a is not None
                else jnp.zeros(lead + (m3,), x.dtype) for a in acc
            ]
            if blocks[k] is None:
                blocks[k] = outp
            else:
                blocks[k] = [b + o for b, o in zip(blocks[k], outp)]
        outs = []
        for k, (mul, ir) in enumerate(self.irreps_out):
            blk = blocks[k]
            if blk is None:
                blk = [jnp.zeros(lead + (mul,), x.dtype)
                       for _ in range(ir.dim)]
            outs.extend(blk)
        return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# Gate (e3nn nn.Gate), built like reference sevenn/nn/equivariant_gate.py
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GateSpec:
    """Gate over irreps_x: scalars activated, l>0 gated by extra scalars.

    irreps_in  = sort-simplify(scalars + gates) + gated   (e3nn _Sortcut)
    irreps_out = scalars + gated (== irreps_x given sorted input)
    """
    irreps_x: Irreps
    act_scalar: Any  # {parity: activation name}; stored as sorted tuple
    act_gate: Any
    irreps_in: Irreps = field(default=None)  # type: ignore
    # extraction index maps (static): list of (offset, mul*dim) into irreps_in
    scalar_slices: Tuple[Tuple[int, int], ...] = field(default=None)  # type: ignore
    gate_slices: Tuple[Tuple[int, int], ...] = field(default=None)  # type: ignore
    gated_offset: int = field(default=None)  # type: ignore
    scalars: Irreps = field(default=None)  # type: ignore
    gates: Irreps = field(default=None)  # type: ignore
    gated: Irreps = field(default=None)  # type: ignore

    def __post_init__(self):
        for f_name in ('act_scalar', 'act_gate'):
            v = getattr(self, f_name)
            if isinstance(v, dict):
                object.__setattr__(self, f_name, tuple(sorted(v.items())))
        irreps_x = Irreps(self.irreps_x)
        scalars = Irreps([mi for mi in irreps_x if mi.ir.l == 0])
        gated = Irreps([mi for mi in irreps_x if mi.ir.l > 0])
        gates_p = 1 if Irrep(0, 1) in scalars else -1
        gates = Irreps([(mul, Irrep(0, gates_p)) for mul, _ in gated])
        # e3nn _Sortcut: simplify each, concat, sort (stable), simplify
        sc = scalars.simplify()
        gt = gates.simplify()
        cat = sc + gt
        srt, p, inv = cat.sort()
        head = srt.simplify()
        irreps_in = head + gated
        # index maps: positions of each original entry inside sorted layout
        srt_slices = cat_slices = None
        # offsets of sorted entries
        offs = []
        o = 0
        for mi in srt:
            offs.append(o)
            o += mi.dim
        # entry e of cat lands at sorted position p[e]
        entry_slice = {}
        for e in range(len(cat)):
            entry_slice[e] = (offs[p[e]], cat[e].dim)
        scalar_slices = tuple(entry_slice[e] for e in range(len(sc)))
        gate_slices = tuple(
            entry_slice[e] for e in range(len(sc), len(sc) + len(gt))
        )
        object.__setattr__(self, 'irreps_x', irreps_x)
        object.__setattr__(self, 'irreps_in', irreps_in)
        object.__setattr__(self, 'scalar_slices', scalar_slices)
        object.__setattr__(self, 'gate_slices', gate_slices)
        object.__setattr__(self, 'gated_offset', head.dim)
        object.__setattr__(self, 'scalars', sc)
        object.__setattr__(self, 'gates', gt)
        object.__setattr__(self, 'gated', gated)

    @property
    def irreps_out(self) -> Irreps:
        return self.scalars + self.gated

    def apply(self, x: Array) -> Array:
        act_scalar = dict(self.act_scalar)
        act_gate = dict(self.act_gate)
        outs = []
        # scalars
        for (off, ln), (mul, ir) in zip(self.scalar_slices, self.scalars):
            act = normalized_activation(act_scalar[ir.p])
            outs.append(act(x[..., off:off + ln]))
        # gates
        gate_vals = []
        for (off, ln), (mul, ir) in zip(self.gate_slices, self.gates):
            act = normalized_activation(act_gate[ir.p])
            gate_vals.append(act(x[..., off:off + ln]))
        if gate_vals:
            gates = jnp.concatenate(gate_vals, axis=-1)
            o = self.gated_offset
            g_off = 0
            for mul, ir in self.gated:
                # ir_mul layout: (..., dim, mul) gated channel-wise
                blk = x[..., o:o + mul * ir.dim]
                blk = blk.reshape(blk.shape[:-1] + (ir.dim, mul))
                g = gates[..., g_off:g_off + mul]
                blk = blk * g[..., None, :]
                outs.append(blk.reshape(blk.shape[:-2] + (mul * ir.dim,)))
                o += mul * ir.dim
                g_off += mul
        return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# FullyConnectedNet (e3nn radial MLP: no biases, variance-preserving)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FullyConnectedNetSpec:
    """e3nn nn.FullyConnectedNet(hs, act): x -> act(x @ W / sqrt(h_in)) ...

    Last layer has no activation. Weights init ~ N(0,1). The activation is
    normalize2mom-rescaled. Note f(0) == 0 for silu/tanh/ssp, so a zero
    input row (padded edge) yields exactly zero weights.
    """
    hs: Tuple[int, ...]
    act: str

    def init(self, key) -> Params:
        params: Params = {}
        keys = jax.random.split(key, len(self.hs) - 1)
        for i in range(len(self.hs) - 1):
            params[f'w{i}'] = jax.random.normal(
                keys[i], (self.hs[i], self.hs[i + 1])
            )
        return params

    def apply(self, params: Params, x: Array) -> Array:
        act = normalized_activation(self.act)
        n = len(self.hs) - 1
        for i in range(n):
            w = params[f'w{i}'] / math.sqrt(self.hs[i])
            x = x @ w.astype(x.dtype)
            if i < n - 1:
                x = act(x)
        return x
