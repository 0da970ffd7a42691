"""Functional model layers operating on the shared data dict.

Mirrors the behavioral contract of reference sevenn/nn/* modules: every
layer reads/writes string-keyed tensors (reference _const.py:63
AtomGraphDataType). Here each layer is a frozen dataclass with
``init(key) -> (params, trainable_mask)`` and ``apply(params, data) ->
data``; the whole model is a pure function suitable for jit/grad.

TPU-native deviations from the reference:
  - static shapes: padded nodes/edges are masked via NODE_MASK/EDGE_MASK
    (replaces torch dynamic shapes);
  - force/stress come from one jax.grad program (see model.py), not a
    trailing autograd module.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import _keys as KEY
from ..irreps import Irreps
from ..ops import pallas_conv, pallas_tp
from ..ops.radial import BesselBasis, PolynomialCutoff, XPLORCutoff
from ..ops.spherical import spherical_harmonics
from ..ops.scatter import gather_rev, scatter_sum
from ..ops.tensor_product import (
    FullyConnectedNetSpec,
    FullyConnectedTPSpec,
    GateSpec,
    LinearSpec,
    UVUTensorProductSpec,
)

Array = jnp.ndarray
Params = Dict[str, Any]


def _no_params(key):
    return {}, {}


def geom_packed_ok(model) -> bool:
    """Whether a model can run the geometry-fused packed regime
    (EDGE_GEOM_PACKED): every convolution carries a GeomSpec and the
    pallas kernels + geom knob are live. Engines call this ONCE per
    instance -- the answer bakes into their jitted programs."""
    convs = [l for _, l in model.layers
             if isinstance(l, IrrepsConvolution)]
    return (
        pallas_conv.geom_enabled()
        and pallas_conv.is_enabled()
        and bool(convs)
        and all(l.geom is not None for l in convs)
    )


@dataclass(frozen=True)
class EdgeEmbedding:
    """EDGE_VEC -> EDGE_LENGTH, EDGE_EMBEDDING (bessel*envelope*mask),
    EDGE_ATTR (real SH). Reference sevenn/nn/edge_embedding.py:190-217."""
    basis: BesselBasis
    cutoff_fn: Any  # PolynomialCutoff | XPLORCutoff
    lmax_edge: int
    parity: int  # -1 if is_parity else 1
    normalize_sph: bool = True

    @property
    def irreps_out(self) -> Irreps:
        return Irreps.spherical_harmonics(self.lmax_edge, self.parity)

    def init(self, key):
        p = self.basis.init()
        return p, {'coeffs': self.basis.trainable}

    def apply(self, params, data):
        # geometry-fused convs read the raw edge vector and these
        # coefficients; on paths where every conv takes the fused
        # kernel, the emb/sh computed below are dead code XLA removes
        data[KEY.EDGE_BESSEL_COEFFS] = params['coeffs']
        if KEY.EDGE_VEC_COLS in data:
            # packed large-system path: the whole edge pipeline flows
            # as 1-D columns (an (E, W) array lane-pads W -> 128 on
            # TPU, 14-128x memory at 100k atoms); the only resident
            # per-edge feature array is the dense-packed block consumed
            # chunk-wise by the convolutions
            from ..ops.spherical import spherical_harmonics_cols

            vx, vy, vz = data[KEY.EDGE_VEC_COLS]
            if data.get(KEY.EDGE_GEOM_PACKED):
                # geometry-fused regime: pack only the 3 vector
                # columns; Bessel/cutoff/SH happen inside the conv
                # kernels (ops/pallas_conv.GeomSpec)
                from ..ops.scatter import pack_cols
                g = data[KEY.EDGE_PACK_G]
                data[KEY.EDGE_VEC_PACKED] = pack_cols([vx, vy, vz], g)
                return data
            r = jnp.sqrt(vx * vx + vy * vy + vz * vz)
            data[KEY.EDGE_LENGTH] = r
            env = self.cutoff_fn.apply(r)
            if KEY.EDGE_MASK in data:
                env = env * data[KEY.EDGE_MASK]
            pref = 2.0 / self.basis.cutoff
            coeffs = params['coeffs'].astype(r.dtype)
            emb_cols = [
                pref * jnp.sin(coeffs[n] * r) / r * env
                for n in range(self.basis.num_basis)
            ]
            sh_cols = spherical_harmonics_cols(
                self.lmax_edge, vx, vy, vz,
                normalize=self.normalize_sph,
                normalization='component',
            )
            g = data[KEY.EDGE_PACK_G]
            from ..ops.scatter import pack_cols
            data[KEY.EDGE_FEAT_PACKED] = pack_cols(
                emb_cols + sh_cols, g
            )
            return data
        rvec = data[KEY.EDGE_VEC]
        r = jnp.sqrt(jnp.sum(rvec * rvec, axis=-1))
        data[KEY.EDGE_LENGTH] = r
        emb = self.basis.apply(params, r) * self.cutoff_fn.apply(r)[..., None]
        if KEY.EDGE_MASK in data:
            emb = emb * data[KEY.EDGE_MASK][..., None]
        data[KEY.EDGE_EMBEDDING] = emb
        data[KEY.EDGE_ATTR] = spherical_harmonics(
            self.lmax_edge, rvec, normalize=self.normalize_sph,
            normalization='component',
        )
        return data


@dataclass(frozen=True)
class MultiCutoffEdgeEmbedding:
    """Per-layer cutoff radii (reference edge_embedding.py:220-257).

    The reference filters the edge list per cutoff with boolean indexing
    (dynamic shapes); the TPU-native equivalent keeps ONE static edge
    list and emits, per unique cutoff c, a masked radial embedding
    `edge_embedding{c}` and mask `edge_mask{c}`. Convolutions at cutoff
    c fold the mask into their per-edge radial weights, so messages
    beyond c are exactly zero — numerically identical to the filtered
    list. EDGE_ATTR (spherical harmonics) is shared across cutoffs.
    """
    bases: Tuple[Any, ...]        # one BesselBasis per unique cutoff
    cutoff_fns: Tuple[Any, ...]   # matching envelope per unique cutoff
    lmax_edge: int
    parity: int
    normalize_sph: bool = True

    @property
    def irreps_out(self) -> Irreps:
        return Irreps.spherical_harmonics(self.lmax_edge, self.parity)

    def init(self, key):
        p, m = {}, {}
        for basis in self.bases:
            sub = basis.init()
            p[f'c{basis.cutoff}'] = sub
            m[f'c{basis.cutoff}'] = {'coeffs': basis.trainable}
        return p, m

    def apply(self, params, data):
        if KEY.EDGE_VEC_COLS in data:
            # packed large-system layout: reconstruct the (E, 3) array
            # (multi-cutoff at 100k-scale pays the lane padding; the
            # packed fast path currently covers plain EdgeEmbedding)
            data = dict(data)
            data[KEY.EDGE_VEC] = jnp.stack(
                data[KEY.EDGE_VEC_COLS], axis=1
            )
            data.pop(KEY.CONV_CHUNK_ROWS, None)
        rvec = data[KEY.EDGE_VEC]
        r = jnp.sqrt(jnp.sum(rvec * rvec, axis=-1))
        data[KEY.EDGE_LENGTH] = r
        base_mask = data.get(KEY.EDGE_MASK)
        for basis, env in zip(self.bases, self.cutoff_fns):
            c = basis.cutoff
            mask = (r <= c).astype(r.dtype)
            if base_mask is not None:
                mask = mask * base_mask
            emb = (basis.apply(params[f'c{c}'], r)
                   * env.apply(r)[..., None] * mask[..., None])
            data[KEY.EDGE_EMBEDDING + str(c)] = emb
            data[KEY.EDGE_MASK + str(c)] = mask
        data[KEY.EDGE_ATTR] = spherical_harmonics(
            self.lmax_edge, rvec, normalize=self.normalize_sph,
            normalization='component',
        )
        return data


@dataclass(frozen=True)
class OnehotEmbedding:
    """Type index -> one-hot (reference sevenn/nn/node_embedding.py:15-54)."""
    num_classes: int
    key_x: str = KEY.NODE_FEATURE
    key_out: Optional[str] = None
    key_save: Optional[str] = KEY.ATOM_TYPE
    key_additional: Optional[str] = KEY.NODE_ATTR

    init = staticmethod(_no_params)

    def apply(self, params, data):
        inp = data[self.key_x]
        embd = jax.nn.one_hot(inp, self.num_classes, dtype=jnp.float32)
        data[self.key_out or self.key_x] = embd
        if self.key_additional is not None:
            data[self.key_additional] = embd
        if self.key_save is not None:
            data[self.key_save] = inp
        return data


@dataclass(frozen=True)
class IrrepsLinear:
    """e3nn o3.Linear on a data key (reference sevenn/nn/linear.py:14-101).

    With num_modalities > 1, the per-structure modality one-hot is appended
    to the input scalars (reference linear.py:65-101).
    """
    spec: LinearSpec
    key_in: str
    key_out: Optional[str] = None
    num_modalities: int = 0

    def init(self, key):
        p = self.spec.init(key)
        return p, {k: True for k in p}

    def apply(self, params, data):
        x = data[self.key_in]
        if self.num_modalities > 1:
            modal_onehot = jax.nn.one_hot(
                data[KEY.MODAL_TYPE], self.num_modalities, dtype=x.dtype
            )
            if modal_onehot.ndim == x.ndim:  # per-graph -> per-node
                modal_onehot = modal_onehot[data[KEY.BATCH]]
            x = jnp.concatenate([x, modal_onehot], axis=-1)
        data[self.key_out or self.key_in] = self.spec.apply(params, x)
        return data


@dataclass(frozen=True)
class SelfConnectionIntro:
    """FCTP(x, node_attr) -> SELF_CONNECTION_TEMP
    (reference sevenn/nn/self_connection.py:10-64, 'nequip' type)."""
    spec: FullyConnectedTPSpec
    key_x: str = KEY.NODE_FEATURE
    key_operand: str = KEY.NODE_ATTR

    def init(self, key):
        p = self.spec.init(key)
        return p, {k: True for k in p}

    def apply(self, params, data):
        data[KEY.SELF_CONNECTION_TEMP] = self.spec.apply(
            params, data[self.key_x], data[self.key_operand]
        )
        return data


@dataclass(frozen=True)
class SelfConnectionLinearIntro:
    """Linear(x) -> SELF_CONNECTION_TEMP (reference self_connection.py:68-108,
    'linear' type; used by 7net-0)."""
    spec: LinearSpec
    key_x: str = KEY.NODE_FEATURE

    def init(self, key):
        p = self.spec.init(key)
        return p, {k: True for k in p}

    def apply(self, params, data):
        data[KEY.SELF_CONNECTION_TEMP] = self.spec.apply(
            params, data[self.key_x]
        )
        return data


@dataclass(frozen=True)
class SelfConnectionOutro:
    """x += SELF_CONNECTION_TEMP (reference self_connection.py:112-128)."""
    key_x: str = KEY.NODE_FEATURE

    init = staticmethod(_no_params)

    def apply(self, params, data):
        data[self.key_x] = data[self.key_x] + data[KEY.SELF_CONNECTION_TEMP]
        del data[KEY.SELF_CONNECTION_TEMP]
        return data


@dataclass(frozen=True)
class IrrepsConvolution:
    """Message passing + self_interaction_2, one block.

    Reference semantics (sevenn/nn/convolution.py:29-137 then
    interaction_blocks.py:78-84): msg = TP(x[src], Y(r); MLP(radial)),
    x' = linear(scatter_sum(msg)/denominator). Index convention
    (convolution.py:125-127): edge_index[1] = message source (neighbor),
    edge_index[0] = destination (center).

    Two execution paths, numerically identical (linear maps commute with
    segment_sum; 1/denominator folds into the per-edge radial weights):
      - XLA: TP -> scatter -> linear (2nd-order differentiable: training)
      - Pallas fused (MD/inference): radial-MLP + TP + compressing linear
        in one VMEM pass; only (E, d_in)/(E, d_out) touch HBM.
    si2 params live under this layer's name as the 'si2' subtree.
    """
    tp: UVUTensorProductSpec
    weight_nn: FullyConnectedNetSpec
    si2: Optional[LinearSpec]
    denominator: float
    train_denominator: bool = False
    key_x: str = KEY.NODE_FEATURE
    key_filter: str = KEY.EDGE_ATTR
    key_weight_input: str = KEY.EDGE_EMBEDDING
    key_edge_idx: str = KEY.EDGE_IDX
    key_mask: str = KEY.EDGE_MASK
    # geometry-fused kernels (ops/pallas_conv.GeomSpec): Bessel +
    # cutoff + SH inside the conv kernel, backward emits d(edge_vec).
    # Set by model/build.py for single-cutoff standard embeddings;
    # forces/inference path only (weights get no grad through it).
    geom: Optional[Any] = None

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = {
            'weight_nn': self.weight_nn.init(k1),
            'denominator': jnp.array([self.denominator], dtype=jnp.float32),
        }
        mask = {
            'weight_nn': {k: True for k in p['weight_nn']},
            'denominator': self.train_denominator,
        }
        if self.si2 is not None:
            si2_p = self.si2.init(k2)
            p['si2'] = si2_p
            mask['si2'] = {k: True for k in si2_p}
        return p, mask

    def _fused_eligible(self, rows: int, dd) -> bool:
        return (
            self.si2 is not None
            and pallas_conv.is_enabled()
            and rows % (
                pallas_conv.agg_block_unit(dd) if dd else 256
            ) == 0
            and len(self.weight_nn.hs) == 4
            and not self.si2.biases
        )

    def _rows_to_nodes(self, params, xg, sh, emb, scale, dd):
        """Per-edge rows (dense-grid contract, ops/scatter.py) -> node
        rows (rows/dd, d_out): fused kernel with in-kernel aggregation,
        or the XLA path with a reshape-reduction. Shared by the
        whole-array and the memory-chunked execution paths."""
        x_dtype = xg.dtype
        if self._fused_eligible(xg.shape[0], dd):
            mlp_ws = tuple(
                params['weight_nn'][f'w{i}'].astype(x_dtype)
                for i in range(len(self.weight_nn.hs) - 1)
            )
            si2_ws = tuple(
                params['si2'][f'w{n}'].astype(x_dtype)
                for n in range(len(self.si2.paths))
            )
            fused, _ = pallas_conv.make_fused_conv(
                self.tp, self.weight_nn, self.si2, agg_d=dd
            )
            return fused(xg, sh, emb, scale, mlp_ws, si2_ws)
        w = self.weight_nn.apply(params['weight_nn'], emb) * scale
        message = self.tp.apply(xg, sh, w)
        agg = message.reshape(
            (message.shape[0] // dd, dd) + message.shape[1:]
        ).sum(axis=1)
        if self.si2 is None:
            return agg
        return self.si2.apply(params['si2'], agg, skip_bias=True)

    def _rows_to_nodes_extw(self, params, xg, sh, w_eff, dd):
        """External-weight variant of _rows_to_nodes: the per-edge
        radial weights (already mask/denominator-scaled) are computed
        outside the kernel -- on the E/2 half list as one big XLA
        matmul chain (see apply) -- and the kernel runs the pure CG
        contraction + si2 + aggregation."""
        si2_ws = tuple(
            params['si2'][f'w{n}'].astype(xg.dtype)
            for n in range(len(self.si2.paths))
        )
        fusedw, _ = pallas_conv.make_fused_conv(
            self.tp, self.weight_nn, self.si2, agg_d=dd, ext_w=True
        )
        return fusedw(xg, sh, w_eff.astype(xg.dtype), si2_ws)

    def _half_mlp_w(self, params, data, emb, scale, rev, x_dtype):
        """Per-edge radial weights via the half list: MLP on the E/2
        representative rows (|r| is reversal-symmetric, so emb rows
        pair up bitwise), spread to both directed edges by a gather
        with a scatter-free VJP, then mask/denominator-scaled. Halves
        the radial-MLP MACs -- the largest single FLOP consumer in the
        roofline audit (BENCH_NOTES.md round 4)."""
        from ..ops.scatter import (half_gather, half_pair_indices,
                                   pair_spread)

        half = data.get(KEY.EDGE_HALF)
        pair = data.get(KEY.EDGE_PAIR)
        if half is None:
            half, pair = half_pair_indices(rev)
            data[KEY.EDGE_HALF] = half
            data[KEY.EDGE_PAIR] = pair
        # scatter-free representative gather: a plain emb[half] would
        # VJP into a scatter-add over (E, n_basis) on every force
        # backward (advisor round 4)
        emb_half = half_gather(emb, half, pair)
        w_half = self.weight_nn.apply(params['weight_nn'], emb_half)
        return pair_spread(w_half.astype(x_dtype), pair, half,
                           rev) * scale

    def _geom_eligible(self, data, rows: int, dd) -> bool:
        return (
            self.geom is not None
            and pallas_conv.geom_enabled()
            and KEY.EDGE_BESSEL_COEFFS in data
            and self._fused_eligible(rows, dd)
        )

    def _rows_to_nodes_geom(self, params, xg, vec, coeffs, scale, dd):
        """Geometry-fused variant of _rows_to_nodes: raw edge vectors
        in, Bessel/cutoff/SH computed inside the kernel."""
        x_dtype = xg.dtype
        mlp_ws = tuple(
            params['weight_nn'][f'w{i}'].astype(x_dtype)
            for i in range(len(self.weight_nn.hs) - 1)
        )
        si2_ws = tuple(
            params['si2'][f'w{n}'].astype(x_dtype)
            for n in range(len(self.si2.paths))
        )
        fusedg, _ = pallas_conv.make_fused_conv(
            self.tp, self.weight_nn, self.si2, agg_d=dd or 0,
            geom=self.geom,
        )
        return fusedg(xg, vec.astype(x_dtype), scale,
                      coeffs.astype(x_dtype), mlp_ws, si2_ws)

    def _apply_geom_packed(self, params, data, x, edge_src, rev, dd,
                           denom, chunk_rows, vpacked):
        """Geometry-fused packed-chunked execution (large systems):
        the only resident per-edge array is the 3-column packed edge
        vector (vs n_basis+n_sh columns on the EDGE_FEAT_PACKED path);
        each chunk gathers neighbor features, unpacks its vector
        slice, and runs the geom kernel -- Bessel/cutoff/SH computed
        in-kernel, backward emitting d(edge_vec) directly, no XLA-side
        SH/radial fwd+VJP fusions (the fused force backward of the
        reference's manual layer-by-layer MD backward,
        pair_e3gnn_parallel.cpp:401-438).

        CONTRACT: inference/forces-only like the EDGE_FEAT_PACKED
        fused path -- cotangents flow to (x, vec_packed) alone; the
        closed-over weights and Bessel coefficients get no parameter
        gradient (training uses the XLA path)."""
        from ..ops.scatter import pack_cols, unpack_cols

        pg = data[KEY.EDGE_PACK_G]
        mask1d = data[self.key_mask]
        coeffs = jax.lax.stop_gradient(
            data[KEY.EDGE_BESSEL_COEFFS].astype(x.dtype))
        rows = edge_src.shape[0]
        n_chunks, rem = divmod(rows, chunk_rows)
        full = rows - rem

        def unpack_chunk(x, src_c, vpk_c, mask_c):
            # barrier: keeps XLA from fusing the slices into the pallas
            # custom call's scoped VMEM (see EDGE_FEAT_PACKED path)
            xg, vpk_c, mask_c = jax.lax.optimization_barrier(
                (x[src_c], vpk_c, mask_c)
            )
            vec_c = unpack_cols(vpk_c, pg, 3)
            scale_c = (mask_c[:, None] / denom).astype(x.dtype)
            return xg, vec_c, scale_c

        fused_ok = (
            self._geom_eligible(data, chunk_rows, dd)
            and (rem == 0 or self._fused_eligible(rem, dd))
            and rev is not None
        )
        if fused_ok:
            mlp_ws = tuple(
                jax.lax.stop_gradient(
                    params['weight_nn'][f'w{i}'].astype(x.dtype))
                for i in range(len(self.weight_nn.hs) - 1)
            )
            si2_ws = tuple(
                jax.lax.stop_gradient(
                    params['si2'][f'w{n}'].astype(x.dtype))
                for n in range(len(self.si2.paths))
            )
            fusedg, _ = pallas_conv.make_fused_conv(
                self.tp, self.weight_nn, self.si2, agg_d=dd,
                geom=self.geom,
            )

            def chunk_fwd(x, src_c, vpk_c, mask_c):
                xg, vec_c, scale_c = unpack_chunk(
                    x, src_c, vpk_c, mask_c
                )
                return fusedg.fwd_only(
                    xg, vec_c, scale_c, coeffs, mlp_ws, si2_ws
                )

            def chunk_bwd(x, src_c, vpk_c, mask_c, g_c):
                xg, vec_c, scale_c = unpack_chunk(
                    x, src_c, vpk_c, mask_c
                )
                dxg, dvec = fusedg.bwd_only(
                    (xg, vec_c, scale_c, coeffs, mlp_ws, si2_ws),
                    g_c,
                )[:2]
                dpk = pack_cols([dvec[:, i] for i in range(3)], pg)
                return dxg, dpk

            @jax.custom_vjp
            def conv_scan(x, vpacked):
                def body(_, i):
                    sl = lambda a, k: jax.lax.dynamic_slice_in_dim(
                        a, i * k, k
                    )
                    return None, chunk_fwd(
                        x, sl(edge_src, chunk_rows),
                        sl(vpacked, chunk_rows // pg),
                        sl(mask1d, chunk_rows),
                    )

                _, ys = jax.lax.scan(
                    body, None, jnp.arange(n_chunks, dtype=jnp.int32)
                )
                o = ys.reshape((-1,) + ys.shape[2:])
                if rem:
                    o = jnp.concatenate([
                        o,
                        chunk_fwd(x, edge_src[full:],
                                  vpacked[full // pg:],
                                  mask1d[full:]),
                    ])
                return o

            def cs_fwd(x, vpacked):
                return conv_scan(x, vpacked), (x, vpacked)

            def cs_bwd(res, g):
                x, vpacked = res

                def body(_, i):
                    sl = lambda a, k: jax.lax.dynamic_slice_in_dim(
                        a, i * k, k
                    )
                    return None, chunk_bwd(
                        x, sl(edge_src, chunk_rows),
                        sl(vpacked, chunk_rows // pg),
                        sl(mask1d, chunk_rows),
                        sl(g, chunk_rows // dd),
                    )

                _, (dxgs, dpks) = jax.lax.scan(
                    body, None, jnp.arange(n_chunks, dtype=jnp.int32)
                )
                dxg = dxgs.reshape(-1, dxgs.shape[-1])
                dvpk = dpks.reshape(-1, dpks.shape[-1])
                if rem:
                    dxg_r, dpk_r = chunk_bwd(
                        x, edge_src[full:], vpacked[full // pg:],
                        mask1d[full:], g[full // dd:],
                    )
                    dxg = jnp.concatenate([dxg, dxg_r])
                    dvpk = jnp.concatenate([dvpk, dpk_r])
                # dx[v] = sum over v's grid rows of dxg[rev] (see the
                # EDGE_FEAT_PACKED path)
                dxr = dxg[rev]
                dx = dxr.reshape(rows // dd, dd,
                                 dxr.shape[-1]).sum(axis=1)
                return dx[:x.shape[0]], dvpk

            conv_scan.defvjp(cs_fwd, cs_bwd)
            out = conv_scan(x, vpacked)
        else:
            # XLA fallback: _geom_fm is plain jnp, so the same in-chunk
            # geometry math runs as an XLA fusion with remat
            @jax.checkpoint
            def piece(x, src_c, vpk_c, mask_c):
                xg, vec_c, scale_c = unpack_chunk(
                    x, src_c, vpk_c, mask_c
                )
                embT, shT = pallas_conv._geom_fm(
                    vec_c.T, coeffs, self.geom
                )
                return self._rows_to_nodes(
                    params, xg, shT.T, embT.T, scale_c, dd
                )

            def body(_, i):
                sl = lambda a, k: jax.lax.dynamic_slice_in_dim(
                    a, i * k, k
                )
                return None, piece(
                    x, sl(edge_src, chunk_rows),
                    sl(vpacked, chunk_rows // pg),
                    sl(mask1d, chunk_rows),
                )

            _, out = jax.lax.scan(
                body, None, jnp.arange(n_chunks, dtype=jnp.int32),
            )
            out = out.reshape((-1,) + out.shape[2:])
            if rem:
                out = jnp.concatenate([
                    out,
                    piece(x, edge_src[full:], vpacked[full // pg:],
                          mask1d[full:]),
                ])
        out = out[:x.shape[0]]
        if self.si2 is not None:
            bias = self.si2.bias_vector(params['si2'], out.dtype)
            if bias is not None:
                out = out + bias
        data[self.key_x] = out
        return data

    def apply(self, params, data):
        x = data[self.key_x]
        edge_idx = data[self.key_edge_idx]
        edge_src = edge_idx[1]
        edge_dst = edge_idx[0]
        # EDGE_REV present => symmetric dst-sorted list: gather with a
        # scatter-free transpose and matching forward aggregation
        # (dense reshape-reduction when the dense grid layout is used)
        rev = data.get(KEY.EDGE_REV)
        dd = data.get(KEY.EDGE_DENSE_D)
        denom = params['denominator'].astype(x.dtype)
        packed = data.get(KEY.EDGE_FEAT_PACKED)

        chunk_rows = data.get(KEY.CONV_CHUNK_ROWS) if dd else None
        vpacked = data.get(KEY.EDGE_VEC_PACKED)
        if chunk_rows and vpacked is not None and self.geom is not None:
            return self._apply_geom_packed(
                params, data, x, edge_src, rev, dd, denom, chunk_rows,
                vpacked,
            )
        if chunk_rows and packed is not None:
            # packed memory-chunked execution (large systems): the only
            # resident per-edge array is the dense-packed feature block
            # (narrow (E, W) arrays lane-pad W -> 128: GBs at 100k
            # atoms); each remat'd chunk unpacks its slice, builds the
            # mask/denominator scale, gathers neighbor features, and
            # runs the kernel
            from ..ops.scatter import pack_cols, unpack_cols

            pg = data[KEY.EDGE_PACK_G]
            mask1d = data[self.key_mask]
            n_emb = self.weight_nn.hs[0]
            n_sh = self.tp.irreps_in2.dim
            rows = edge_src.shape[0]
            n_chunks, rem = divmod(rows, chunk_rows)

            def unpack_chunk(x, src_c, packed_c, mask_c):
                # barrier: keeps XLA from fusing the slices into the
                # pallas custom call's scoped VMEM (see below)
                xg, packed_c, mask_c = jax.lax.optimization_barrier(
                    (x[src_c], packed_c, mask_c)
                )
                feat = unpack_cols(packed_c, pg, n_emb + n_sh)
                emb_c = feat[:, :n_emb]
                sh_c = feat[:, n_emb:]
                scale_c = (mask_c[:, None] / denom).astype(x.dtype)
                return xg, sh_c, emb_c, scale_c

            @jax.checkpoint
            def piece(x, src_c, packed_c, mask_c):
                xg, sh_c, emb_c, scale_c = unpack_chunk(
                    x, src_c, packed_c, mask_c
                )
                return self._rows_to_nodes(
                    params, xg, sh_c, emb_c, scale_c, dd
                )

            full = rows - rem
            fused_ok = (
                self._fused_eligible(chunk_rows, dd)
                and (rem == 0 or self._fused_eligible(rem, dd))
                and rev is not None
            )
            if fused_ok:
                # one custom_vjp over the WHOLE chunk scan (gather +
                # unpack + kernel). Two wins over jax.checkpoint around
                # each chunk:
                #  - no kernel-FORWARD recompute in the backward (the
                #    kernel's VJP only needs its inputs; the backward
                #    recomputes just the cheap gather+unpack prefix)
                #  - scatter-free x cotangent: per-chunk dxg rides out
                #    of the backward scan as a stacked (E, d1) buffer
                #    and ONE global rev-gather reshape-reduction
                #    replaces n_chunks scatter-adds into (and full-size
                #    accumulations of) (N, d1) cotangents
                # CONTRACT: the packed/chunked fused path is
                # inference/forces-only -- conv_scan's custom_vjp
                # returns cotangents for (x, packed) alone, so the
                # closed-over weights get NO parameter gradient.
                # stop_gradient makes that explicit (training uses the
                # XLA path; train_denominator likewise never reaches
                # here).
                mlp_ws = tuple(
                    jax.lax.stop_gradient(
                        params['weight_nn'][f'w{i}'].astype(x.dtype))
                    for i in range(len(self.weight_nn.hs) - 1)
                )
                si2_ws = tuple(
                    jax.lax.stop_gradient(
                        params['si2'][f'w{n}'].astype(x.dtype))
                    for n in range(len(self.si2.paths))
                )
                fused, _ = pallas_conv.make_fused_conv(
                    self.tp, self.weight_nn, self.si2, agg_d=dd
                )

                def chunk_fwd(x, src_c, packed_c, mask_c):
                    xg, sh_c, emb_c, scale_c = unpack_chunk(
                        x, src_c, packed_c, mask_c
                    )
                    return fused.fwd_only(
                        xg, sh_c, emb_c, scale_c, mlp_ws, si2_ws
                    )

                def chunk_bwd(x, src_c, packed_c, mask_c, g_c):
                    xg, sh_c, emb_c, scale_c = unpack_chunk(
                        x, src_c, packed_c, mask_c
                    )
                    dxg, dsh, demb = fused.bwd_only(
                        (xg, sh_c, emb_c, scale_c, mlp_ws, si2_ws),
                        g_c,
                    )[:3]
                    dfeat = jnp.concatenate([demb, dsh], axis=1)
                    dpk = pack_cols(
                        [dfeat[:, i] for i in range(n_emb + n_sh)],
                        pg,
                    )
                    return dxg, dpk

                @jax.custom_vjp
                def conv_scan(x, packed):
                    def body(_, i):
                        sl = lambda a, k: jax.lax.dynamic_slice_in_dim(
                            a, i * k, k
                        )
                        return None, chunk_fwd(
                            x, sl(edge_src, chunk_rows),
                            sl(packed, chunk_rows // pg),
                            sl(mask1d, chunk_rows),
                        )

                    _, ys = jax.lax.scan(
                        body, None, jnp.arange(n_chunks, dtype=jnp.int32)
                    )
                    o = ys.reshape((-1,) + ys.shape[2:])
                    if rem:
                        o = jnp.concatenate([
                            o,
                            chunk_fwd(x, edge_src[full:],
                                      packed[full // pg:],
                                      mask1d[full:]),
                        ])
                    return o

                def cs_fwd(x, packed):
                    return conv_scan(x, packed), (x, packed)

                def cs_bwd(res, g):
                    x, packed = res

                    def body(_, i):
                        sl = lambda a, k: jax.lax.dynamic_slice_in_dim(
                            a, i * k, k
                        )
                        return None, chunk_bwd(
                            x, sl(edge_src, chunk_rows),
                            sl(packed, chunk_rows // pg),
                            sl(mask1d, chunk_rows),
                            sl(g, chunk_rows // dd),
                        )

                    _, (dxgs, dpks) = jax.lax.scan(
                        body, None, jnp.arange(n_chunks, dtype=jnp.int32)
                    )
                    dxg = dxgs.reshape(-1, dxgs.shape[-1])
                    dpacked = dpks.reshape(-1, dpks.shape[-1])
                    if rem:
                        dxg_r, dpk_r = chunk_bwd(
                            x, edge_src[full:], packed[full // pg:],
                            mask1d[full:], g[full // dd:],
                        )
                        dxg = jnp.concatenate([dxg, dxg_r])
                        dpacked = jnp.concatenate([dpacked, dpk_r])
                    # dx[v] = sum_{e: src[e]=v} dxg[e]
                    #       = sum over v's grid rows of dxg[rev]
                    # (symmetric dst-sorted list; pad rows are masked
                    # self-edges with zero dxg)
                    dxr = dxg[rev]
                    dx = dxr.reshape(rows // dd, dd,
                                     dxr.shape[-1]).sum(axis=1)
                    return dx[:x.shape[0]], dpacked

                conv_scan.defvjp(cs_fwd, cs_bwd)
                out = conv_scan(x, packed)
            else:
                def body(_, i):
                    sl = lambda a, k: jax.lax.dynamic_slice_in_dim(
                        a, i * k, k
                    )
                    return None, piece(
                        x, sl(edge_src, chunk_rows),
                        sl(packed, chunk_rows // pg),
                        sl(mask1d, chunk_rows),
                    )

                _, out = jax.lax.scan(
                    body, None, jnp.arange(n_chunks, dtype=jnp.int32),
                )
                out = out.reshape((-1,) + out.shape[2:])
                if rem:
                    out = jnp.concatenate([
                        out,
                        piece(x, edge_src[full:],
                              packed[full // pg:], mask1d[full:]),
                    ])
            out = out[:x.shape[0]]
            if self.si2 is None:
                data[self.key_x] = out
                return data
            bias = self.si2.bias_vector(params['si2'], out.dtype)
            if bias is not None:
                out = out + bias
            data[self.key_x] = out
            return data

        sh = data[self.key_filter]
        emb = data[self.key_weight_input]
        scale = jnp.ones((edge_src.shape[0], 1), x.dtype) / denom
        if self.key_mask in data:
            scale = scale * data[self.key_mask][..., None]

        if chunk_rows:
            # memory-chunked execution (large systems): scan over row
            # chunks, rematerializing the gathered neighbor features and
            # the kernel forward in the backward pass -- peak memory per
            # layer drops from O(E x d1) to O(chunk x d1) (the TPU
            # analog of the reference's per-batch segmenting; enables
            # the 100k-atom single-chip regime)
            rows = edge_src.shape[0]
            n_chunks, rem = divmod(rows, chunk_rows)

            @jax.checkpoint
            def piece(x, src_c, sh_c, emb_c, scale_c):
                # barrier: without it XLA fuses the scan dynamic-slices
                # into the pallas custom call, staging whole chunk
                # tensors in scoped VMEM (observed 32 MB > 16 MB cap at
                # 100k atoms); the barrier pins them to HBM buffers
                xg, sh_c, emb_c, scale_c = jax.lax.optimization_barrier(
                    (x[src_c], sh_c, emb_c, scale_c)
                )
                return self._rows_to_nodes(
                    params, xg, sh_c, emb_c, scale_c, dd
                )

            def body(_, i):
                # dynamic_slice, NOT stacked scan-xs: narrow (E, 9/8/1)
                # edge arrays lane-pad 14-16x on TPU, so a stacked
                # (n_chunks, chunk, W) copy costs GBs at 100k atoms
                sl = lambda a: jax.lax.dynamic_slice_in_dim(
                    a, i * chunk_rows, chunk_rows
                )
                return None, piece(x, sl(edge_src), sl(sh), sl(emb),
                                   sl(scale))

            full = rows - rem
            _, out = jax.lax.scan(
                body, None, jnp.arange(n_chunks, dtype=jnp.int32),
            )
            out = out.reshape((-1,) + out.shape[2:])
            if rem:
                out = jnp.concatenate([
                    out,
                    piece(x, edge_src[full:], sh[full:], emb[full:],
                          scale[full:]),
                ])
            out = out[:x.shape[0]]
        elif dd is not None and rev is not None:
            xg = gather_rev(x, edge_src, rev, edge_dst, dense_d=dd)
            if (pallas_conv.geom_dense_enabled()
                    and self._geom_eligible(data, xg.shape[0], dd)
                    and KEY.EDGE_VEC in data):
                out = self._rows_to_nodes_geom(
                    params, xg, data[KEY.EDGE_VEC],
                    data[KEY.EDGE_BESSEL_COEFFS], scale, dd,
                )
            elif (pallas_conv.half_mlp_enabled()
                    and self._fused_eligible(xg.shape[0], dd)):
                w_eff = self._half_mlp_w(params, data, emb, scale, rev,
                                         x.dtype)
                out = self._rows_to_nodes_extw(params, xg, sh, w_eff, dd)
            else:
                out = self._rows_to_nodes(params, xg, sh, emb, scale, dd)
            out = out[:x.shape[0]]
        else:
            xg = gather_rev(x, edge_src, rev, edge_dst) \
                if rev is not None else x[edge_src]
            if self._fused_eligible(xg.shape[0], None):
                mlp_ws = tuple(
                    params['weight_nn'][f'w{i}'].astype(x.dtype)
                    for i in range(len(self.weight_nn.hs) - 1)
                )
                si2_ws = tuple(
                    params['si2'][f'w{n}'].astype(x.dtype)
                    for n in range(len(self.si2.paths))
                )
                fused, _ = pallas_conv.make_fused_conv(
                    self.tp, self.weight_nn, self.si2
                )
                y = fused(xg, sh, emb, scale, mlp_ws, si2_ws)
                out = scatter_sum(y, edge_dst, x.shape[0],
                                  sorted=rev is not None)
            else:
                w = self.weight_nn.apply(params['weight_nn'], emb) * scale
                message = self.tp.apply(xg, sh, w)
                agg = scatter_sum(message, edge_dst, x.shape[0],
                                  sorted=rev is not None)
                if self.si2 is None:
                    data[self.key_x] = agg
                    return data
                out = self.si2.apply(params['si2'], agg, skip_bias=True)
        if self.si2 is None:
            data[self.key_x] = out
            return data
        bias = self.si2.bias_vector(params['si2'], out.dtype)
        if bias is not None:
            out = out + bias
        data[self.key_x] = out
        return data


@dataclass(frozen=True)
class EquivariantGate:
    """Gate nonlinearity (reference sevenn/nn/equivariant_gate.py:13-62)."""
    spec: GateSpec
    key_x: str = KEY.NODE_FEATURE

    init = staticmethod(_no_params)

    def apply(self, params, data):
        data[self.key_x] = self.spec.apply(data[self.key_x])
        return data


@dataclass(frozen=True)
class Rescale:
    """atomic_E = scaled * scale + shift (reference sevenn/nn/scale.py:22-56)."""
    shift: float
    scale: float
    train_shift_scale: bool = False
    key_in: str = KEY.SCALED_ATOMIC_ENERGY
    key_out: str = KEY.ATOMIC_ENERGY

    def init(self, key):
        p = {
            'shift': jnp.array([self.shift], dtype=jnp.float32),
            'scale': jnp.array([self.scale], dtype=jnp.float32),
        }
        m = {'shift': self.train_shift_scale, 'scale': self.train_shift_scale}
        return p, m

    def apply(self, params, data):
        data[self.key_out] = (
            data[self.key_in] * params['scale'] + params['shift']
        )
        return data


@dataclass(frozen=True)
class SpeciesWiseRescale:
    """Per-species shift/scale indexed by ATOM_TYPE
    (reference sevenn/nn/scale.py:60-161)."""
    shift: Tuple[float, ...]
    scale: Tuple[float, ...]
    train_shift_scale: bool = False
    key_in: str = KEY.SCALED_ATOMIC_ENERGY
    key_out: str = KEY.ATOMIC_ENERGY
    key_indices: str = KEY.ATOM_TYPE

    def init(self, key):
        p = {
            'shift': jnp.asarray(self.shift, dtype=jnp.float32),
            'scale': jnp.asarray(self.scale, dtype=jnp.float32),
        }
        m = {'shift': self.train_shift_scale, 'scale': self.train_shift_scale}
        return p, m

    def apply(self, params, data):
        idx = data[self.key_indices]
        shift = params['shift'][idx][..., None]
        scale = params['scale'][idx][..., None]
        data[self.key_out] = data[self.key_in] * scale + shift
        return data


@dataclass(frozen=True)
class ModalWiseRescale:
    """Per-(modality, species) shift/scale (reference scale.py:165-361)."""
    shift: Tuple  # (n_modal, n_types) or (n_types,)
    scale: Tuple
    use_modal_wise_shift: bool = False
    use_modal_wise_scale: bool = False
    train_shift_scale: bool = False
    key_in: str = KEY.SCALED_ATOMIC_ENERGY
    key_out: str = KEY.ATOMIC_ENERGY

    def init(self, key):
        p = {
            'shift': jnp.asarray(np.array(self.shift), dtype=jnp.float32),
            'scale': jnp.asarray(np.array(self.scale), dtype=jnp.float32),
        }
        m = {'shift': self.train_shift_scale, 'scale': self.train_shift_scale}
        return p, m

    def apply(self, params, data):
        atom_idx = data[KEY.ATOM_TYPE]
        modal_idx = data[KEY.MODAL_TYPE]
        if modal_idx.ndim > 0 and modal_idx.shape[0] != atom_idx.shape[0]:
            modal_idx = modal_idx[data[KEY.BATCH]]
        shift = (
            params['shift'][modal_idx, atom_idx]
            if self.use_modal_wise_shift else params['shift'][atom_idx]
        )
        scale = (
            params['scale'][modal_idx, atom_idx]
            if self.use_modal_wise_scale else params['scale'][atom_idx]
        )
        data[self.key_out] = (
            data[self.key_in] * scale[..., None] + shift[..., None]
        )
        return data


@dataclass(frozen=True)
class AtomReduce:
    """Masked per-graph sum of atomic energies
    (reference sevenn/nn/linear.py:104-141)."""
    key_in: str = KEY.ATOMIC_ENERGY
    key_out: str = KEY.PRED_TOTAL_ENERGY
    constant: float = 1.0

    init = staticmethod(_no_params)

    def apply(self, params, data):
        src = data[self.key_in][..., 0]
        if KEY.NODE_MASK in data:
            src = src * data[KEY.NODE_MASK]
        num_graphs = data[KEY.NUM_ATOMS].shape[0]
        out = scatter_sum(src, data[KEY.BATCH], num_graphs)
        data[self.key_out] = out * self.constant
        return data


@dataclass(frozen=True)
class FCNReadout:
    """Scalar MLP readout option (reference sevenn/nn/linear.py:145-180)."""
    spec: FullyConnectedNetSpec
    key_in: str = KEY.NODE_FEATURE
    key_out: str = KEY.SCALED_ATOMIC_ENERGY

    def init(self, key):
        p = self.spec.init(key)
        return p, {k: True for k in p}

    def apply(self, params, data):
        data[self.key_out] = self.spec.apply(params, data[self.key_in])
        return data
