"""Grimme DFT-D3 two-body dispersion in pure JAX (TPU-native).

Capability parity with the reference's CUDA LAMMPS pair style
(`pair_d3.cu` / `pair_d3.h`, reference sevenn/pair_e3gnn): coordination-
number-dependent C6 via Gaussian interpolation over Grimme's reference
pairs, zero / Becke-Johnson damping with the published per-functional
parameter tables, all-pairs summation over lattice replicas, FP32.

TPU-first design differences from the CUDA port:

* **One energy program + autodiff.** The reference hand-writes three
  force kernels plus a dC6/dCN chain-rule kernel
  (pair_d3.cu:1273-1998). Here the total energy is a single jitted
  function of (positions, lattice, strain); forces and stress come from
  ``jax.grad`` — including the C6(CN) chain rule — for free.
* **Chunked replica scans.** The (i, j, tau) triple loop becomes a
  ``lax.scan`` over chunks of lattice shifts with an (N, N) pairwise
  block per chunk — dense, masked, MXU/VPU-friendly, static shapes.
  Memory stays bounded at one chunk; ``jax.checkpoint`` on the chunk
  body keeps the backward pass at the same footprint.
* **Log-sum-exp stabilized C6 weights.** The reference carries a
  ``c6mem`` fallback for when all Gaussian weights underflow in FP32
  (pair_d3.cu:827). Subtracting the max exponent before ``exp`` is
  equivalent and branch-free.
* The reference leaves modified-zero-damping forces unimplemented
  (pair_d3.cu:1550-1553 "Not implemented yet"); here ``damp_zerom`` /
  ``damp_bjm`` work fully since forces are autodiff.

Parameter tables (r0ab, c6ab reference points, r2r4, rcov) are Grimme
et al.'s published D3 data (J. Chem. Phys. 132, 154104 (2010)), stored
in ``d3_params.npz`` (see tools/extract_d3_params.py). Units follow the
reference: internal math in Hartree atomic units, API in eV / Angstrom
(AU_TO_ANG / AU_TO_EV, pair_d3.h:113-114).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

AU_TO_ANG = 0.52917726
AU_TO_EV = 27.21138505
K1 = 16.0
K3 = -4.0  # Gaussian C6-interpolation exponent (pair_d3.h:117)
MAXC = 5

_PARAMS_PATH = os.path.join(os.path.dirname(__file__), 'd3_params.npz')


# ---------------------------------------------------------------------------
# Per-functional damping parameters.
# (rs6, s18, rs18, s6) per functional; alp = 14, s6 = 1 unless noted.
# Values are the published D3 parametrizations as carried by the
# reference's setfuncpar (pair_d3.cu:422-648).
# ---------------------------------------------------------------------------

_ZERO = {
    'slater-dirac-exchange': (0.999, -1.957, 0.697, 1.0),
    'b-lyp': (1.094, 1.682, 1.0, 1.0),
    'b-p': (1.139, 1.683, 1.0, 1.0),
    'b97-d': (0.892, 0.909, 1.0, 1.0),
    'revpbe': (0.923, 1.010, 1.0, 1.0),
    'pbe': (1.217, 0.722, 1.0, 1.0),
    'pbesol': (1.345, 0.612, 1.0, 1.0),
    'rpw86-pbe': (1.224, 0.901, 1.0, 1.0),
    'rpbe': (0.872, 0.514, 1.0, 1.0),
    'tpss': (1.166, 1.105, 1.0, 1.0),
    'b3-lyp': (1.261, 1.703, 1.0, 1.0),
    'pbe0': (1.287, 0.928, 1.0, 1.0),
    'hse06': (1.129, 0.109, 1.0, 1.0),
    'revpbe38': (1.021, 0.862, 1.0, 1.0),
    'pw6b95': (1.532, 0.862, 1.0, 1.0),
    'tpss0': (1.252, 1.242, 1.0, 1.0),
    'b2-plyp': (1.427, 1.022, 1.0, 0.64),
    'pwpb95': (1.557, 0.705, 1.0, 0.82),
    'b2gp-plyp': (1.586, 0.760, 1.0, 0.56),
    'ptpss': (1.541, 0.879, 1.0, 0.75),
    'hf': (1.158, 1.746, 1.0, 1.0),
    'mpwlyp': (1.239, 1.098, 1.0, 1.0),
    'bpbe': (1.087, 2.033, 1.0, 1.0),
    'bh-lyp': (1.370, 1.442, 1.0, 1.0),
    'tpssh': (1.223, 1.219, 1.0, 1.0),
    'pwb6k': (1.660, 0.550, 1.0, 1.0),
    'b1b95': (1.613, 1.868, 1.0, 1.0),
    'bop': (0.929, 1.975, 1.0, 1.0),
    'o-lyp': (0.806, 1.764, 1.0, 1.0),
    'o-pbe': (0.837, 2.055, 1.0, 1.0),
    'ssb': (1.215, 0.663, 1.0, 1.0),
    'revssb': (1.221, 0.560, 1.0, 1.0),
    'otpss': (1.128, 1.494, 1.0, 1.0),
    'b3pw91': (1.176, 1.775, 1.0, 1.0),
    'revpbe0': (0.949, 0.792, 1.0, 1.0),
    'pbe38': (1.333, 0.998, 1.0, 1.0),
    'mpw1b95': (1.605, 1.118, 1.0, 1.0),
    'mpwb1k': (1.671, 1.061, 1.0, 1.0),
    'bmk': (1.931, 2.168, 1.0, 1.0),
    'cam-b3lyp': (1.378, 1.217, 1.0, 1.0),
    'lc-wpbe': (1.355, 1.279, 1.0, 1.0),
    'm05': (1.373, 0.595, 1.0, 1.0),
    'm052x': (1.417, 0.000, 1.0, 1.0),
    'm06l': (1.581, 0.000, 1.0, 1.0),
    'm06': (1.325, 0.000, 1.0, 1.0),
    'm062x': (1.619, 0.000, 1.0, 1.0),
    'm06hf': (1.446, 0.000, 1.0, 1.0),
    'hcth120': (1.221, 1.206, 1.0, 1.0),
}

_BJ = {
    'b-p': (0.3946, 3.2822, 4.8516, 1.0),
    'b-lyp': (0.4298, 2.6996, 4.2359, 1.0),
    'revpbe': (0.5238, 2.3550, 3.5016, 1.0),
    'rpbe': (0.1820, 0.8318, 4.0094, 1.0),
    'b97-d': (0.5545, 2.2609, 3.2297, 1.0),
    'pbe': (0.4289, 0.7875, 4.4407, 1.0),
    'rpw86-pbe': (0.4613, 1.3845, 4.5062, 1.0),
    'b3-lyp': (0.3981, 1.9889, 4.4211, 1.0),
    'tpss': (0.4535, 1.9435, 4.4752, 1.0),
    'hf': (0.3385, 0.9171, 2.8830, 1.0),
    'tpss0': (0.3768, 1.2576, 4.5865, 1.0),
    'pbe0': (0.4145, 1.2177, 4.8593, 1.0),
    'hse06': (0.383, 2.310, 5.685, 1.0),
    'revpbe38': (0.4309, 1.4760, 3.9446, 1.0),
    'pw6b95': (0.2076, 0.7257, 6.3750, 1.0),
    # canonical Grimme s6 = 0.64 for b2-plyp; the reference's switch has
    # the assignment after `break` (pair_d3.cu:537, dead code, s6 stays 1)
    'b2-plyp': (0.3065, 0.9147, 5.0570, 0.64),
    'dsd-blyp': (0.0000, 0.2130, 6.0519, 0.50),
    'dsd-blyp-fc': (0.0009, 0.2112, 5.9807, 0.50),
    'bop': (0.4870, 3.2950, 3.5043, 1.0),
    'mpwlyp': (0.4831, 2.0077, 4.5323, 1.0),
    'o-lyp': (0.5299, 2.6205, 2.8065, 1.0),
    'pbesol': (0.4466, 2.9491, 6.1742, 1.0),
    'bpbe': (0.4567, 4.0728, 4.3908, 1.0),
    'opbe': (0.5512, 3.3816, 2.9444, 1.0),
    'ssb': (-0.0952, -0.1744, 5.2170, 1.0),
    'revssb': (0.4720, 0.4389, 4.0986, 1.0),
    'otpss': (0.4634, 2.7495, 4.3153, 1.0),
    'b3pw91': (0.4312, 2.8524, 4.4693, 1.0),
    'bh-lyp': (0.2793, 1.0354, 4.9615, 1.0),
    'revpbe0': (0.4679, 1.7588, 3.7619, 1.0),
    'tpssh': (0.4529, 2.2382, 4.6550, 1.0),
    'mpw1b95': (0.1955, 1.0508, 6.4177, 1.0),
    'pwb6k': (0.1805, 0.9383, 7.7627, 1.0),
    'b1b95': (0.2092, 1.4507, 5.5545, 1.0),
    'bmk': (0.1940, 2.0860, 5.9197, 1.0),
    'cam-b3lyp': (0.3708, 2.0674, 5.4743, 1.0),
    'lc-wpbe': (0.3919, 1.8541, 5.0897, 1.0),
    'b2gp-plyp': (0.0000, 0.2597, 6.3332, 0.560),
    'ptpss': (0.0000, 0.2804, 6.5745, 0.750),
    'pwpb95': (0.0000, 0.2904, 7.3141, 0.820),
    'hf/mixed': (0.5607, 3.9027, 4.5622, 1.0),
    'hf/sv': (0.4249, 2.1849, 4.2783, 1.0),
    'hf/minis': (0.1702, 0.9841, 3.8506, 1.0),
    'b3-lyp/6-31gd': (0.5014, 4.0672, 4.8409, 1.0),
    'hcth120': (0.3563, 1.0821, 4.3359, 1.0),
    'pw1pw': (0.3807, 2.3363, 5.8844, 1.0),
    'pwgga': (0.2211, 2.6910, 6.7278, 1.0),
    'hsesol': (0.4650, 2.9215, 6.2003, 1.0),
    'hf3c': (0.4171, 0.8777, 2.9149, 1.0),
    'hf3cv': (0.3063, 0.5022, 3.9856, 1.0),
    'pbeh3c': (0.4860, 0.0000, 4.5000, 1.0),
    'pbeh-3c': (0.4860, 0.0000, 4.5000, 1.0),
}

_ZEROM = {
    'b2-plyp': (1.313134, 0.717543, 0.016035, 0.640000),
    'b3-lyp': (1.338153, 1.532981, 0.013988, 1.0),
    'b97-d': (1.151808, 1.020078, 0.035964, 1.0),
    'b-lyp': (1.279637, 1.841686, 0.014370, 1.0),
    'b-p': (1.233460, 1.945174, 0.000000, 1.0),
    'pbe': (2.340218, 0.000000, 0.129434, 1.0),
    'pbe0': (2.077949, 0.000081, 0.116755, 1.0),
    'lc-wpbe': (1.366361, 1.280619, 0.003160, 1.0),
}

_BJM = {
    'b2-plyp': (0.486434, 0.672820, 3.656466, 0.640000),
    'b3-lyp': (0.278672, 1.466677, 4.606311, 1.0),
    'b97-d': (0.240184, 1.206988, 3.864426, 1.0),
    'b-lyp': (0.448486, 1.875007, 3.610679, 1.0),
    'b-p': (0.821850, 3.140281, 2.728151, 1.0),
    'pbe': (0.012092, 0.358940, 5.938951, 1.0),
    'pbe0': (0.007912, 0.528823, 6.162326, 1.0),
    'lc-wpbe': (0.563761, 0.906564, 3.593680, 1.0),
}

DAMPING_TABLES = {
    'damp_zero': _ZERO,
    'damp_bj': _BJ,
    'damp_zerom': _ZEROM,
    'damp_bjm': _BJM,
}


class D3Damping(NamedTuple):
    """Resolved damping parameters (pair_d3.cu:638-648)."""
    kind: str  # 'zero' | 'bj' | 'zerom' | 'bjm'
    s6: float
    s8: float
    rs6: float   # a1 for bj-type damping
    rs8: float   # a2 for bj-type damping
    alp: float


def get_damping_params(damping: str, functional: str) -> D3Damping:
    if damping not in DAMPING_TABLES:
        raise ValueError(
            f'unknown damping {damping!r}; choose from {list(DAMPING_TABLES)}')
    table = DAMPING_TABLES[damping]
    functional = functional.lower()
    if functional not in table:
        raise ValueError(
            f'functional {functional!r} has no {damping} parameters')
    rs6, s18, rs18, s6 = table[functional]
    return D3Damping(damping[5:], s6, s18, rs6, rs18, 14.0)


class D3Tables(NamedTuple):
    """Per-atom-type slices of the Grimme tables (host-prepared).

    T = number of distinct chemical types in the system, mirroring the
    reference's coeff() type-indexed copies (pair_d3.cu:349-366,763-766).
    """
    r0ab: jnp.ndarray   # (T, T) bohr
    rcov: jnp.ndarray   # (T,) bohr (k2-scaled covalent radii)
    r2r4: jnp.ndarray   # (T,) sqrt(Q) factors for C8
    c6ref: jnp.ndarray  # (T, T, MAXC, MAXC) C6 reference values, NaN=absent
    cnref_i: jnp.ndarray  # (T, T, MAXC, MAXC) CN_i at each reference
    cnref_j: jnp.ndarray  # (T, T, MAXC, MAXC)


@functools.lru_cache(maxsize=1)
def _raw_tables() -> Dict[str, np.ndarray]:
    with np.load(_PARAMS_PATH) as f:
        return {k: f[k] for k in f.files}


def build_tables(atomic_numbers: Sequence[int], dtype=np.float32) -> D3Tables:
    """Slice the 94-element master tables down to the system's types."""
    raw = _raw_tables()
    z = np.asarray(atomic_numbers, dtype=np.int64)
    if (z < 1).any() or (z > 94).any():
        raise ValueError(f'D3 parameters exist only for Z in [1, 94]: {z}')
    idx = z - 1
    return D3Tables(
        r0ab=jnp.asarray(raw['r0ab'][np.ix_(idx, idx)], dtype),
        rcov=jnp.asarray(raw['rcov'][idx], dtype),
        r2r4=jnp.asarray(raw['r2r4'][idx], dtype),
        c6ref=jnp.asarray(raw['c6'][np.ix_(idx, idx)], dtype),
        cnref_i=jnp.asarray(raw['cn_i'][np.ix_(idx, idx)], dtype),
        cnref_j=jnp.asarray(raw['cn_j'][np.ix_(idx, idx)], dtype),
    )


def lattice_shifts(
    cell_ang: np.ndarray, pbc, r_cut_ang: float, chunk: int = 16,
) -> np.ndarray:
    """Integer lattice shifts covering r_cut (host-side, static count).

    Equivalent to the reference's rep_vdw/rep_cn tau enumeration
    (pair_d3.cu:1020-1046): per-axis replica count from the
    perpendicular cell heights, zero along non-periodic axes. Padded to
    a multiple of ``chunk`` with sentinel shifts (they land beyond the
    cutoff and are masked; padding keeps the scan shape static).
    """
    cell = np.asarray(cell_ang, dtype=np.float64)
    pbc = np.asarray(pbc, dtype=bool)
    rep = np.zeros(3, dtype=np.int64)
    if pbc.any():
        if abs(np.linalg.det(cell)) < 1e-10:
            raise ValueError('periodic system needs a non-singular cell')
        inv = np.linalg.inv(cell)
        heights = 1.0 / np.linalg.norm(inv, axis=0)  # distance between planes
        rep = np.where(pbc, np.floor(r_cut_ang / heights).astype(np.int64) + 1, 0)
    grids = [np.arange(-r, r + 1) for r in rep]
    shifts = np.stack(np.meshgrid(*grids, indexing='ij'), -1).reshape(-1, 3)
    # zero shift first so the self-pair mask only needs chunk 0
    order = np.argsort(np.abs(shifts).sum(1), kind='stable')
    shifts = shifts[order]
    n = len(shifts)
    pad = (-n) % chunk
    if pad:
        sentinel = np.full((pad, 3), 2 * int(rep.max()) + 9, dtype=np.int64)
        shifts = np.concatenate([shifts, sentinel], 0)
    return shifts.astype(np.float64)


def _pair_dist2(pos, lat, tau_frac):
    """(C, N, N) squared distances r_ij = x_j - x_i + tau for a shift chunk."""
    tau = tau_frac @ lat  # (C, 3)
    rij = (pos[None, None, :, :] - pos[None, :, None, :]
           + tau[:, None, None, :])
    return jnp.sum(rij * rij, axis=-1)


def coordination_numbers(pos, lat, tidx, tables: D3Tables,
                         shifts_cn, cn_thr: float) -> jnp.ndarray:
    """Fractional coordination numbers (pair_d3.cu:1051-1106).

    cn_i = sum_{j,tau != self} 1 / (1 + exp(-K1 ((rcov_i + rcov_j)/r - 1)))
    """
    n = pos.shape[0]
    rcov_sum = tables.rcov[tidx][:, None] + tables.rcov[tidx][None, :]
    eye = jnp.eye(n, dtype=bool)

    @jax.checkpoint
    def body(cn, chunk):
        tau_frac, is_first = chunk
        r2 = _pair_dist2(pos, lat, tau_frac)
        self_zero = is_first[:, None, None] & eye[None]
        ok = (r2 <= cn_thr) & ~self_zero
        r = jnp.sqrt(jnp.where(ok, r2, 1.0))
        damp = 1.0 / (1.0 + jnp.exp(-K1 * (rcov_sum[None] / r - 1.0)))
        return cn + jnp.sum(jnp.where(ok, damp, 0.0), axis=(0, 2)), None

    n_chunks = shifts_cn.shape[0]
    is_first = jnp.zeros((n_chunks, shifts_cn.shape[1]), bool).at[0, 0].set(True)
    cn0 = jnp.zeros((n,), pos.dtype)
    cn, _ = jax.lax.scan(body, cn0, (shifts_cn, is_first))
    return cn


def c6_atom_factors(cn, tidx, tables: D3Tables):
    """Per-ATOM factorization of the Gaussian C6 interpolation.

    Grimme's reference grid is separable: cnref_i[t1, t2, k, l] depends
    only on (t1, k), cnref_j only on (t2, l), and validity factorizes
    as valid_i[k] & valid_j[l] (asserted over the full 94-element table
    in tests/test_d3.py). Hence

        L_kl   = w_i[k] * w_j[l],
        C6_ij  = (w_i^T C6REF[ti, tj] w_j) / (s_i * s_j),

    with w_i[k] = exp(K3 (cn_i - cnref(ti)[k])^2) and s_i = sum_k w_i.
    Per-atom max-stabilization is EXACTLY the old joint-max version
    (max_{kl}(a_k + b_l) = max_k a_k + max_l b_l) and any per-atom
    rescale cancels in num/den -- this replaces the (N, N, MAXC, MAXC)
    pairwise weight tensor (the reference's 46,340-atom cap analog,
    pair_d3.cu:808-905) with (N, MAXC) per-atom factors.

    Returns UNNORMALIZED (w (N, MAXC), u (N, T, MAXC)) with
    u[i, t, l] = sum_k w_i[k] * c6ref[ti, t, k, l]; callers compute
    s = w.sum(-1) and C6_ij = dot(u[i, tj], w_j) / (s_i * s_j)."""
    # per-type reference grid (T small): valid (T, MAXC) and cn refs
    finite = jnp.isfinite(tables.c6ref)                  # (T, T, C, C)
    valid_tk = jnp.any(finite, axis=(1, 3))              # (T, C)
    cnref_tk = jnp.max(
        jnp.where(finite, tables.cnref_i, -jnp.inf), axis=(1, 3)
    )
    cnref_tk = jnp.where(valid_tk, cnref_tk, 0.0)
    v = valid_tk[tidx]                                   # (N, C)
    d = (cn[:, None] - cnref_tk[tidx]) ** 2
    logw = jnp.where(v, K3 * d, -jnp.inf)
    m = jnp.max(logw, axis=-1, keepdims=True)
    w = jnp.where(v, jnp.exp(logw - jnp.maximum(m, -1e30)), 0.0)
    c6p = jnp.where(finite, tables.c6ref, 0.0)
    # u[i, t, l] = sum_k w[i, k] c6p[ti, t, k, l]
    u = jnp.einsum('ik,itkl->itl', w, c6p[tidx])
    return w, u


def interpolate_c6(cn, tidx, tables: D3Tables) -> jnp.ndarray:
    """(N, N) C6 from Gaussian interpolation over reference pairs.

    C6_ij = sum_kl L_kl c6ref_kl / sum_kl L_kl,
    L_kl = exp(K3 [(cn_i - cnref_i_kl)^2 + (cn_j - cnref_j_kl)^2]),
    stabilized by subtracting the max exponent (replaces the reference's
    c6mem underflow fallback, pair_d3.cu:808-905). Computed in factored
    per-atom form (see c6_atom_factors): T masked (N, MAXC) matmuls on
    the MXU instead of an (N, N, MAXC, MAXC) weight tensor."""
    w, u = c6_atom_factors(cn, tidx, tables)
    # normalize per atom BEFORE the pair contraction: the matmul then
    # works at C6 scale (better fp32 rounding) and C6_ij =
    # (u_i/s_i) . (w_j/s_j) needs no pairwise denominator
    s = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-30)
    wn = w / s
    un = u / s[..., None]
    c6 = jnp.zeros((cn.shape[0], cn.shape[0]), cn.dtype)
    for t in range(tables.rcov.shape[0]):
        c6 = c6 + jnp.where(
            tidx[None, :] == t, un[:, t, :] @ wn.T, 0.0
        )
    return c6


def dispersion_energy(pos, lat, tidx, tables: D3Tables, damping: D3Damping,
                      shifts_vdw, shifts_cn,
                      rthr: float = 9000.0, cn_thr: float = 1600.0):
    """Total two-body D3 dispersion energy in Hartree.

    pos (N,3) bohr / lat (3,3) bohr rows / tidx (N,) type indices.
    shifts_* are (n_chunks, chunk, 3) fractional lattice multiples with
    the zero shift at [0, 0] (see lattice_shifts). Matches the summation
    of pair_d3.cu:1273-1505 (zero) / :1558-1768 (bj); energy only —
    derivatives come from jax.grad.
    """
    n = pos.shape[0]
    cn = coordination_numbers(pos, lat, tidx, tables, shifts_cn, cn_thr)
    c6 = interpolate_c6(cn, tidx, tables)                      # (N, N)
    r42 = tables.r2r4[tidx][:, None] * tables.r2r4[tidx][None, :]
    c8 = 3.0 * c6 * r42
    r0 = tables.r0ab[tidx[:, None], tidx[None, :]]             # (N, N)
    eye = jnp.eye(n, dtype=bool)
    s6, s8, alp = damping.s6, damping.s8, damping.alp

    if damping.kind in ('bj', 'bjm'):
        a1, a2 = damping.rs6, damping.rs8
        rr = a1 * jnp.sqrt(3.0 * r42) + a2                     # a1 sqrt(C8/C6) + a2
        rr2 = rr * rr
        rr6 = rr2 * rr2 * rr2
        rr8 = rr6 * rr2

        def pair_energy(r2, ok):
            r6 = r2 * r2 * r2
            e6 = s6 * c6[None] / (r6 + rr6[None])
            e8 = s8 * c8[None] / (r6 * r2 + rr8[None])
            return jnp.where(ok, e6 + e8, 0.0)
    elif damping.kind == 'zero':
        rs6, rs8 = damping.rs6, damping.rs8

        def pair_energy(r2, ok):
            r = jnp.sqrt(jnp.where(ok, r2, 1.0))
            r6 = r2 * r2 * r2
            t6 = (rs6 * r0[None] / r) ** alp
            t8 = (rs8 * r0[None] / r) ** (alp + 2.0)
            e6 = s6 * c6[None] / r6 / (1.0 + 6.0 * t6)
            e8 = s8 * c8[None] / (r6 * r2) / (1.0 + 6.0 * t8)
            return jnp.where(ok, e6 + e8, 0.0)
    elif damping.kind == 'zerom':
        # D3M refit (Smith, Burns, Patkowski, Sherrill, JPCL 7, 2197
        # (2016)): additive beta*r0 offset inside the damping power.
        # The reference declares the parameters but leaves compute
        # unimplemented (pair_d3.cu:1550-1553); autodiff covers it here.
        rs6, beta = damping.rs6, damping.rs8

        def pair_energy(r2, ok):
            r = jnp.sqrt(jnp.where(ok, r2, 1.0))
            r6 = r2 * r2 * r2
            t6 = (r / (rs6 * r0[None]) + beta * r0[None]) ** (-alp)
            t8 = (r / r0[None] + beta * r0[None]) ** (-(alp + 2.0))
            e6 = s6 * c6[None] / r6 / (1.0 + 6.0 * t6)
            e8 = s8 * c8[None] / (r6 * r2) / (1.0 + 6.0 * t8)
            return jnp.where(ok, e6 + e8, 0.0)
    else:  # pragma: no cover
        raise ValueError(damping.kind)

    @jax.checkpoint
    def body(acc, chunk):
        tau_frac, is_first = chunk
        r2 = _pair_dist2(pos, lat, tau_frac)
        self_zero = is_first[:, None, None] & eye[None]
        ok = (r2 <= rthr) & ~self_zero
        # masked slots get a benign finite distance (1 bohr^2): keeps the
        # f32 backward pass free of inf*0 NaNs; pair_energy re-masks
        return acc + jnp.sum(pair_energy(jnp.where(ok, r2, 1.0), ok)), None

    n_chunks = shifts_vdw.shape[0]
    is_first = jnp.zeros((n_chunks, shifts_vdw.shape[1]), bool).at[0, 0].set(True)
    e, _ = jax.lax.scan(body, jnp.zeros((), pos.dtype), (shifts_vdw, is_first))
    return -0.5 * e  # ordered-pair double count


# ---------------------------------------------------------------------------
# Large-system path: block-tiled minimum-image pair sweep.
#
# The replica path above materializes (C, N, N) distance blocks -- fine
# to ~10k atoms, impossible at 100k (an (N, N) f32 plane alone is 37 GB;
# the reference's CUDA pair style hits the same wall at 46,340 atoms,
# pair_e3gnn/README.md:66). Here the (i, j) plane is swept in
# (block, block) tiles by a two-level lax.scan -- O(block^2) live memory
# at any N -- and C6 interpolation uses the factored per-atom form
# (c6_atom_factors), so no pairwise (.., MAXC, MAXC) tensor exists
# either. Periodic images are handled by minimum-image convention,
# valid when every cell width is >= 2*cutoff (callers check via
# mic_ok(); at the 100k scale this always holds -- a 97k-atom solid is
# ~130 A wide vs 2*50.2 A for the default vdW threshold).
# ---------------------------------------------------------------------------


def mic_ok(cell_ang: np.ndarray, r_cut_ang: float) -> bool:
    """True when minimum-image convention is exact for r_cut: every
    perpendicular cell width >= 2 * r_cut (host-side check)."""
    cell = np.asarray(cell_ang, dtype=np.float64)
    inv = np.linalg.inv(cell)
    heights = 1.0 / np.linalg.norm(inv, axis=0)
    return bool(np.all(heights >= 2.0 * r_cut_ang))


def _pad_system(pos, tidx, block):
    """Pad to a block multiple; pad rows are masked everywhere."""
    n = pos.shape[0]
    npad = (-n) % block
    if npad:
        pos = jnp.concatenate(
            [pos, jnp.zeros((npad, 3), pos.dtype)], axis=0)
        tidx = jnp.concatenate(
            [tidx, jnp.zeros((npad,), tidx.dtype)], axis=0)
    valid = (jnp.arange(n + npad) < n)
    return pos, tidx, valid


def dispersion_energy_tiled(pos, lat, tidx, tables: D3Tables,
                            damping: D3Damping,
                            rthr: float = 9000.0, cn_thr: float = 1600.0,
                            block: int = 1024):
    """Total two-body D3 dispersion energy (Hartree), tiled MIC sweep.

    pos (N, 3) bohr / lat (3, 3) bohr rows / tidx (N,) type indices.
    Matches dispersion_energy() exactly whenever MIC is valid for both
    thresholds (tests/test_d3.py oracle). Differentiable in pos and lat
    (forces, virial); memory O(block^2) independent of N.
    """
    n_real = pos.shape[0]
    inv = jnp.linalg.inv(lat)
    # wrap into the primary cell (grad of frac - floor(frac) is the
    # identity away from measure-zero wrap boundaries)
    frac = pos @ inv
    posw = (frac - jnp.floor(frac)) @ lat
    posw, tidx, valid = _pad_system(posw, tidx, block)
    npad = posw.shape[0]
    nb = npad // block
    eye = jnp.eye(block, dtype=bool)

    def tile_r2(pi, pj):
        """(B, B) squared MIC distances, component-accumulated to keep
        live tile memory at a few (B, B) planes."""
        d = [pi[:, a][:, None] - pj[:, a][None, :] for a in range(3)]
        f = [sum(d[b] * inv[b, a] for b in range(3)) for a in range(3)]
        f = [x - jnp.round(x) for x in f]
        v = [sum(f[b] * lat[b, a] for b in range(3)) for a in range(3)]
        return v[0] * v[0] + v[1] * v[1] + v[2] * v[2]

    sl = lambda a, i: jax.lax.dynamic_slice_in_dim(a, i * block, block)

    # -- pass 1: coordination numbers -----------------------------------
    rcov = tables.rcov[tidx]

    @jax.checkpoint
    def cn_tile(i, j):
        pi, pj = sl(posw, i), sl(posw, j)
        r2 = tile_r2(pi, pj)
        ok = ((r2 <= cn_thr)
              & sl(valid, i)[:, None] & sl(valid, j)[None, :])
        ok &= ~((i == j) & eye)
        r = jnp.sqrt(jnp.where(ok, r2, 1.0))
        rsum = sl(rcov, i)[:, None] + sl(rcov, j)[None, :]
        damp = 1.0 / (1.0 + jnp.exp(-K1 * (rsum / r - 1.0)))
        return jnp.sum(jnp.where(ok, damp, 0.0), axis=1)

    def cn_row(i):
        def body(acc, j):
            return acc + cn_tile(i, j), None
        acc0 = jnp.zeros((block,), pos.dtype)
        acc, _ = jax.lax.scan(body, acc0, jnp.arange(nb))
        return acc

    cn = jax.lax.map(cn_row, jnp.arange(nb)).reshape(-1)

    # -- per-atom C6 factors (normalized; see c6_atom_factors) ----------
    w, u = c6_atom_factors(cn[:n_real], tidx[:n_real], tables)
    s = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-30)
    wn = jnp.concatenate(
        [w / s, jnp.zeros((npad - n_real, MAXC), w.dtype)])
    un = jnp.concatenate(
        [u / s[..., None],
         jnp.zeros((npad - n_real,) + u.shape[1:], u.dtype)])

    # -- pass 2: pair energies ------------------------------------------
    r42 = tables.r2r4[tidx]
    n_types = tables.rcov.shape[0]
    s6, s8, alp = damping.s6, damping.s8, damping.alp

    @jax.checkpoint
    def e_tile(i, j):
        pi, pj = sl(posw, i), sl(posw, j)
        r2 = tile_r2(pi, pj)
        ok = ((r2 <= rthr)
              & sl(valid, i)[:, None] & sl(valid, j)[None, :])
        ok &= ~((i == j) & eye)
        r2 = jnp.where(ok, r2, 1.0)
        ti, tj = sl(tidx, i), sl(tidx, j)
        uni, wnj = sl(un, i), sl(wn, j)
        c6 = jnp.zeros((block, block), pos.dtype)
        for t in range(n_types):
            c6 = c6 + jnp.where(
                tj[None, :] == t, uni[:, t, :] @ wnj.T, 0.0)
        r42ij = sl(r42, i)[:, None] * sl(r42, j)[None, :]
        c8 = 3.0 * c6 * r42ij
        r6 = r2 * r2 * r2
        if damping.kind in ('bj', 'bjm'):
            a1, a2 = damping.rs6, damping.rs8
            rr = a1 * jnp.sqrt(3.0 * r42ij) + a2
            rr2 = rr * rr
            rr6 = rr2 * rr2 * rr2
            e = (s6 * c6 / (r6 + rr6)
                 + s8 * c8 / (r6 * r2 + rr6 * rr2))
        else:
            r0 = tables.r0ab[ti[:, None], tj[None, :]]
            r = jnp.sqrt(r2)
            if damping.kind == 'zero':
                rs6, rs8 = damping.rs6, damping.rs8
                t6 = (rs6 * r0 / r) ** alp
                t8 = (rs8 * r0 / r) ** (alp + 2.0)
            elif damping.kind == 'zerom':
                rs6, beta = damping.rs6, damping.rs8
                t6 = (r / (rs6 * r0) + beta * r0) ** (-alp)
                t8 = (r / r0 + beta * r0) ** (-(alp + 2.0))
            else:  # pragma: no cover
                raise ValueError(damping.kind)
            e = (s6 * c6 / r6 / (1.0 + 6.0 * t6)
                 + s8 * c8 / (r6 * r2) / (1.0 + 6.0 * t8))
        return jnp.sum(jnp.where(ok, e, 0.0))

    def e_row(i):
        def body(acc, j):
            return acc + e_tile(i, j), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), pos.dtype),
                              jnp.arange(nb))
        return acc

    e = jnp.sum(jax.lax.map(e_row, jnp.arange(nb)))
    return -0.5 * e  # ordered-pair double count


@functools.partial(jax.jit, static_argnames=('damping', 'rthr', 'cn_thr'))
def _efs_kernel(pos_b, lat_b, tidx, tables, damping, shifts_vdw, shifts_cn,
                rthr, cn_thr):
    def energy_fn(p, strain):
        sym = 0.5 * (strain + strain.T)
        pd = p + p @ sym
        latd = lat_b + lat_b @ sym
        return dispersion_energy(pd, latd, tidx, tables, damping,
                                 shifts_vdw, shifts_cn, rthr, cn_thr)

    strain0 = jnp.zeros((3, 3), pos_b.dtype)
    e, (gp, gs) = jax.value_and_grad(energy_fn, argnums=(0, 1))(pos_b, strain0)
    vol = jnp.abs(jnp.linalg.det(lat_b))
    return e, -gp, gs / vol


class D3Dispersion:
    """Host-facing D3 engine: Angstrom/eV API, cached jit per shape.

    Replaces the reference's LAMMPS ``pair_style d3 rthr cn_thr damping
    functional`` (pair_d3.cu:262-301). Unlike the CUDA pair style
    (single-GPU, <= 46340 atoms, no zerom forces) this runs anywhere JAX
    runs and every damping variant is differentiable.
    """

    def __init__(self, damping: str = 'damp_bj', functional: str = 'pbe',
                 rthr: float = 9000.0, cn_thr: float = 1600.0,
                 dtype=np.float32, shift_chunk: int = 16):
        self.damping = get_damping_params(damping, functional)
        self.rthr = float(rthr)          # bohr^2, as in the pair_style args
        self.cn_thr = float(cn_thr)
        self.dtype = dtype
        self.shift_chunk = int(shift_chunk)
        self._tables: Optional[D3Tables] = None
        self._z_key: Optional[Tuple[int, ...]] = None

    def _tables_for(self, z_unique: np.ndarray) -> D3Tables:
        key = tuple(int(v) for v in z_unique)
        if key != self._z_key:
            self._tables = build_tables(z_unique, self.dtype)
            self._z_key = key
        return self._tables

    def compute(self, atomic_numbers, pos_ang, cell_ang=None, pbc=None):
        """Returns dict: energy (eV), forces (N,3 eV/A), stress (3,3 eV/A^3)."""
        z = np.asarray(atomic_numbers, dtype=np.int64)
        pos = np.asarray(pos_ang, dtype=self.dtype) / AU_TO_ANG
        if cell_ang is None or pbc is None or not np.any(pbc):
            cell = np.eye(3) * (2.0 * np.sqrt(self.rthr) + 1.0)
            pbc = np.zeros(3, bool)
        else:
            cell = np.asarray(cell_ang, dtype=np.float64)
            pbc = np.asarray(pbc, bool)
        lat = cell / AU_TO_ANG
        z_unique, tidx = np.unique(z, return_inverse=True)
        tables = self._tables_for(z_unique)
        c = self.shift_chunk
        sv = lattice_shifts(lat, pbc, np.sqrt(self.rthr), c).reshape(-1, c, 3)
        sc = lattice_shifts(lat, pbc, np.sqrt(self.cn_thr), c).reshape(-1, c, 3)
        e, f, sig = _efs_kernel(
            jnp.asarray(pos), jnp.asarray(lat, self.dtype),
            jnp.asarray(tidx), tables, self.damping,
            jnp.asarray(sv, self.dtype), jnp.asarray(sc, self.dtype),
            self.rthr, self.cn_thr)
        return {
            'energy': float(e) * AU_TO_EV,
            'forces': np.asarray(f) * (AU_TO_EV / AU_TO_ANG),
            'stress': np.asarray(sig) * (AU_TO_EV / AU_TO_ANG ** 3),
        }
