"""Legendre-Gauss quadrature over zenith angle for the diffuse streams.

Parity: radtool/radtool_legendre_gauss.F90. Nodes/weights on [0,1] with the
derived per-stream quantities:

  mu       cosine of stream zenith angle (LG node on [0,1])
  sin_ang  sine,  tan_ang tangent                    (:73-74)
  weight   LG weight (sums to 1 over the hemisphere)
  hweight  weight for isotropic emission from a horizontal surface,
           ~ w*mu normalized                         (:75,77)
  vweight  weight for isotropic emission from a vertical surface,
           ~ w*sin normalized                        (:76,78)
  vadjustment / vadjustment2: deep-canyon longwave asymptotics correction
           following Schafer et al. (2016) Eq. 8     (:97-98)

The nodes are computed with numpy.polynomial.legendre.leggauss mapped to
[0,1]; the set of (mu, weight) pairs is identical to the reference's
Newton-iterated Vandermonde construction (radtool_legendre_gauss.F90:119-170;
its node map at :166 is a mirrored-but-equivalent form).  Ordering is
ascending mu; all uses of the quadrature are order-invariant sums.
"""

from __future__ import annotations

import numpy as np

from ..utils.constants import Pi


class LegendreGauss:
    """Quadrature constants for one stream count (host-side, static)."""

    def __init__(self, nstream: int):
        if nstream < 1:
            raise ValueError("nstream must be >= 1")
        self.nstream = int(nstream)
        y, w = np.polynomial.legendre.leggauss(self.nstream)
        # Map [-1, 1] -> [0, 1]
        mu = 0.5 * (y + 1.0)
        weight = 0.5 * w
        order = np.argsort(mu)
        self.mu = mu[order]
        self.weight = weight[order]
        self.sin_ang = np.sqrt(1.0 - self.mu * self.mu)
        self.tan_ang = self.sin_ang / self.mu
        hweight = self.weight * self.mu
        vweight = self.weight * self.sin_ang
        self.hweight = hweight / hweight.sum()
        self.vweight = vweight / vweight.sum()
        self.vadjustment = 1.0
        self.vadjustment2 = (Pi / 4.0) / float((self.weight * self.sin_ang).sum())

    def __repr__(self):
        return f"LegendreGauss(nstream={self.nstream})"
