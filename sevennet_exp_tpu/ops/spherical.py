"""Real spherical harmonics in e3nn's basis/normalization, for JAX.

Reproduces e3nn.o3.SphericalHarmonics semantics used by the reference
(sevenn/nn/edge_embedding.py:164-186: normalize=True,
normalization='component').

e3nn's generated polynomials satisfy Y^1(x, y, z) = (x, y, z) and are
produced by the recursion

    Y^l  =  N_l * w3j(l-1, 1, l)-contraction( Y^{l-1}, Y^1 )

with N_l > 0 fixed so that ||Y^l(r)|| = 1 for |r| = 1 ('norm'
normalization of the raw polynomials). 'component' normalization then
multiplies block l by sqrt(2l+1).

We materialize each Y^l as a dense coefficient matrix over the degree-l
monomials x^a y^b z^c (a+b+c=l), generated once in float64 numpy, and
evaluate in JAX with one small matmul per l. This keeps the edge-direction
encoding a pure VPU/MXU op with static shapes.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from .wigner import wigner_3j


def _monomials(l: int) -> List[Tuple[int, int, int]]:
    """Degree-l monomial exponents, deterministic order."""
    return [
        (a, b, l - a - b)
        for a in range(l, -1, -1)
        for b in range(l - a, -1, -1)
    ]


def _mono_index(l: int):
    return {m: i for i, m in enumerate(_monomials(l))}


def _mono_product_matrix(l1: int, l2: int) -> np.ndarray:
    """M[(i1, i2), j]: product of monomial i1 (deg l1) and i2 (deg l2)."""
    m1, m2 = _monomials(l1), _monomials(l2)
    idx = _mono_index(l1 + l2)
    M = np.zeros((len(m1), len(m2), len(idx)))
    for i, (a1, b1, c1) in enumerate(m1):
        for j, (a2, b2, c2) in enumerate(m2):
            M[i, j, idx[(a1 + a2, b1 + b2, c1 + c2)]] = 1.0
    return M


@lru_cache(maxsize=None)
def sh_coefficients(l: int) -> np.ndarray:
    """Coefficient matrix C with Y^l_m(r) = sum_k C[m, k] * mono_k(r).

    Norm-normalized: ||Y^l(r)||_2 = 1 on the unit sphere.
    """
    if l == 0:
        return np.ones((1, 1))
    if l == 1:
        # Y^1 = (x, y, z); monomials for l=1 are [x, y, z] in order
        return np.eye(3)
    Cprev = sh_coefficients(l - 1)          # (2l-1, n_prev)
    C1 = sh_coefficients(1)                 # (3, 3)
    w = wigner_3j(l - 1, 1, l)              # (2l-1, 3, 2l+1)
    P = _mono_product_matrix(l - 1, 1)      # (n_prev, 3, n_new)
    # raw[m, k] = sum_{m', n} w[m', n, m] * (Y^{l-1}_{m'} * Y^1_n) coeffs
    raw = np.einsum('anm,ai,nj,ijk->mk', w, Cprev, C1, P)
    # fix positive normalization: block norm 1 on the unit sphere.
    # Unsold-type identity => sum_m Y_m(r)^2 is constant on the sphere;
    # evaluate at one generic point.
    r = np.array([0.213, 0.818, -0.532])
    r = r / np.linalg.norm(r)
    vals = raw @ _eval_monomials_np(l, r)
    n = np.linalg.norm(vals)
    return raw / n


def _eval_monomials_np(l: int, r: np.ndarray) -> np.ndarray:
    x, y, z = r
    return np.array([x ** a * y ** b * z ** c for a, b, c in _monomials(l)])


@lru_cache(maxsize=None)
def _mono_exponents_arr(l: int) -> np.ndarray:
    return np.array(_monomials(l), dtype=np.int32)


def eval_monomials(l: int, vec: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., n_mono(l)) degree-l monomials, jit-friendly."""
    if l == 0:
        return jnp.ones(vec.shape[:-1] + (1,), dtype=vec.dtype)
    if l == 1:
        return vec
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    monos = _monomials(l)
    # build with cumulative products; small static unroll (n<=15 for l<=4)
    cols = []
    for a, b, c in monos:
        t = jnp.ones_like(x)
        if a:
            t = t * x ** a
        if b:
            t = t * y ** b
        if c:
            t = t * z ** c
        cols.append(t)
    return jnp.stack(cols, axis=-1)


def spherical_harmonics(
    lmax: int,
    vec: jnp.ndarray,
    normalize: bool = True,
    normalization: str = 'component',
    eps: float = 1e-30,
) -> jnp.ndarray:
    """(..., 3) -> (..., (lmax+1)^2) concatenated Y^0..Y^lmax.

    Matches e3nn.o3.spherical_harmonics(range(lmax+1), vec, normalize,
    normalization). `vec` rows with zero norm produce zeros-safe output
    (guarded by eps) -- required because padded edges carry dummy vectors.
    """
    if normalize:
        n = jnp.sqrt(jnp.sum(vec * vec, axis=-1, keepdims=True) + eps)
        vec = vec / n
    blocks = []
    for l in range(lmax + 1):
        coef = jnp.asarray(sh_coefficients(l), dtype=vec.dtype)
        if normalization == 'component':
            coef = coef * np.sqrt(2 * l + 1)
        elif normalization == 'norm':
            pass
        elif normalization == 'integral':
            coef = coef / np.sqrt(4.0 * np.pi)
        else:
            raise ValueError(normalization)
        mono = eval_monomials(l, vec)
        blocks.append(mono @ coef.T)
    return jnp.concatenate(blocks, axis=-1)


def spherical_harmonics_cols(
    lmax: int,
    vx: jnp.ndarray,
    vy: jnp.ndarray,
    vz: jnp.ndarray,
    normalize: bool = True,
    normalization: str = 'component',
    eps: float = 1e-30,
) -> List[jnp.ndarray]:
    """Component-wise variant: three (E,) inputs -> (lmax+1)^2 (E,)
    outputs, numerically identical to ``spherical_harmonics``.

    Large systems need this: any (E, W) array with small W is
    lane-padded W -> 128 by the TPU tiler (14-42x memory); 1-D arrays
    tile densely. Used by the packed edge-feature path
    (model/layers.py EdgeEmbedding + _keys.EDGE_FEAT_PACKED).
    """
    if normalize:
        n = jnp.sqrt(vx * vx + vy * vy + vz * vz + eps)
        vx, vy, vz = vx / n, vy / n, vz / n
    cols: List[jnp.ndarray] = []
    for l in range(lmax + 1):
        coef = np.asarray(sh_coefficients(l))
        if normalization == 'component':
            coef = coef * np.sqrt(2 * l + 1)
        elif normalization == 'integral':
            coef = coef / np.sqrt(4.0 * np.pi)
        elif normalization != 'norm':
            raise ValueError(normalization)
        monos = _monomials(l)
        mono_vals = []
        for a, b, c in monos:
            t = None
            if a:
                t = vx ** a
            if b:
                t = vy ** b if t is None else t * vy ** b
            if c:
                t = vz ** c if t is None else t * vz ** c
            mono_vals.append(t if t is not None else jnp.ones_like(vx))
        for m in range(2 * l + 1):
            acc = None
            for k, mv in enumerate(mono_vals):
                cc = float(coef[m, k])
                if abs(cc) < 1e-14:
                    continue
                term = mv * cc
                acc = term if acc is None else acc + term
            cols.append(acc if acc is not None else jnp.zeros_like(vx))
    return cols
