"""Quadrature tests.

Oracle: analytic integrals over the hemisphere and the printed n=1..8 node
table of the reference's test program (driver/test_lw.F90:52-66 prints the
same construction; values cross-checked against numpy's Gauss-Legendre).
"""

import numpy as np
import pytest

from spartacus_surface_tpu.ops.legendre_gauss import LegendreGauss


@pytest.mark.parametrize("n", range(1, 9))
def test_weights_sum_to_one(n):
    lg = LegendreGauss(n)
    assert np.isclose(lg.weight.sum(), 1.0)
    assert np.isclose(lg.hweight.sum(), 1.0)
    assert np.isclose(lg.vweight.sum(), 1.0)


def test_single_stream_is_mu_half():
    lg = LegendreGauss(1)
    assert np.isclose(lg.mu[0], 0.5)
    assert np.isclose(lg.weight[0], 1.0)


@pytest.mark.parametrize("n", range(2, 9))
def test_quadrature_integrates_polynomials(n):
    # n-point Gauss-Legendre on [0,1] is exact for degree <= 2n-1
    lg = LegendreGauss(n)
    for k in range(2 * n):
        exact = 1.0 / (k + 1)
        assert np.isclose((lg.weight * lg.mu**k).sum(), exact, rtol=1e-12)


def test_hweight_proportional_w_mu():
    lg = LegendreGauss(4)
    h = lg.weight * lg.mu
    assert np.allclose(lg.hweight, h / h.sum())


def test_vadjustment2():
    # vadjustment2 = (pi/4) / sum(w * sin) -> 1 as n -> inf
    # (radtool_legendre_gauss.F90:97-98)
    v8 = LegendreGauss(8).vadjustment2
    v1 = LegendreGauss(1).vadjustment2
    assert abs(v8 - 1.0) < abs(v1 - 1.0)
    assert np.isclose(
        LegendreGauss(1).vadjustment2, (np.pi / 4) / np.sqrt(0.75), rtol=1e-12
    )
