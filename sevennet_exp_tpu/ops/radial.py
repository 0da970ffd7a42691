"""Radial basis & cutoff envelopes (reference sevenn/nn/edge_embedding.py).

Bessel basis: (2/rc) * sin(n*pi*r/rc) / r, trainable coefficients
(edge_embedding.py:81-104). Polynomial p=6 envelope (:107-133) and XPLOR
(:136-161). All pure functions of (params, r) with static config.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@dataclass(frozen=True)
class BesselBasis:
    cutoff: float
    num_basis: int = 8
    trainable: bool = True

    def init(self):
        coeffs = np.array(
            [n * math.pi / self.cutoff for n in range(1, self.num_basis + 1)],
            dtype=np.float32,
        )
        return {'coeffs': jnp.asarray(coeffs)}

    def apply(self, params, r: Array) -> Array:
        prefactor = 2.0 / self.cutoff
        ur = r[..., None]
        coeffs = params['coeffs'].astype(r.dtype)
        # padded edges carry r>0 dummy lengths; caller masks the result
        return prefactor * jnp.sin(coeffs * ur) / ur


@dataclass(frozen=True)
class PolynomialCutoff:
    cutoff: float
    p: int = 6

    def apply(self, r: Array) -> Array:
        p = float(self.p)
        c0 = (p + 1.0) * (p + 2.0) / 2.0
        c1 = p * (p + 2.0)
        c2 = p * (p + 1.0) / 2.0
        rr = r / self.cutoff
        return (
            1.0
            - c0 * jnp.power(rr, p)
            + c1 * jnp.power(rr, p + 1.0)
            - c2 * jnp.power(rr, p + 2.0)
        )


@dataclass(frozen=True)
class XPLORCutoff:
    cutoff: float
    cutoff_on: float

    def apply(self, r: Array) -> Array:
        r_sq = r * r
        r_on_sq = self.cutoff_on ** 2
        r_cut_sq = self.cutoff ** 2
        smooth = (
            (r_cut_sq - r_sq) ** 2
            * (r_cut_sq + 2.0 * r_sq - 3.0 * r_on_sq)
            / (r_cut_sq - r_on_sq) ** 3
        )
        return jnp.where(r < self.cutoff_on, 1.0, smooth)
