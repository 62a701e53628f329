"""Legendre-Gauss stream quadrature (radtool_legendre_gauss.F90:52-100).

Independent implementation: nodes/weights come from
numpy.polynomial.legendre.leggauss (the reference Newton-iterates the
Legendre-Gauss Vandermonde matrix; the nodes are identical to rounding).
Stream ordering is immaterial — every consumer contracts symmetrically over
streams.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class LGQuad:
    mu: np.ndarray        # cosine of zenith angle per stream
    sin_ang: np.ndarray
    tan_ang: np.ndarray
    weight: np.ndarray    # hemisphere weights (sum = 1 on [0, 1])
    hweight: np.ndarray   # horizontal-surface emission weights (normalized)
    vweight: np.ndarray   # vertical-surface emission weights (normalized)
    vadjustment: float
    vadjustment2: float

    @property
    def nstream(self) -> int:
        return len(self.mu)


def make_lg(nstream: int) -> LGQuad:
    y, w = np.polynomial.legendre.leggauss(nstream)
    # Map [-1, 1] -> [0, 1] (the reference's mirrored-but-equivalent map,
    # radtool_legendre_gauss.F90:166-168)
    mu = 0.5 * (1.0 - y)
    weight = 0.5 * w
    sin_ang = np.sqrt(1.0 - mu * mu)
    tan_ang = sin_ang / mu
    hweight = weight * mu
    vweight = weight * sin_ang
    hweight = hweight / hweight.sum()
    vweight = vweight / vweight.sum()
    # Schafer et al. (2016) wall-interception correction
    # (radtool_legendre_gauss.F90:97-98)
    vadjustment = 1.0
    vadjustment2 = (np.pi / 4.0) / np.sum(weight * sin_ang)
    return LGQuad(mu, sin_ang, tan_ang, weight, hweight, vweight,
                  vadjustment, vadjustment2)
