"""Gamma-assembly tests: vectorized assembly vs a direct scalar-loop builder
transcribing the reference's loops (radsurf/radsurf_urban_sw.F90:420-494)."""

import numpy as np
import pytest

from spartacus_surface_tpu.models import gamma as G
from spartacus_surface_tpu.ops.legendre_gauss import LegendreGauss


def scalar_gammas(lg, nreg, ext, ssa, f_ex, f_wall, wall_ext, wall_factor,
                  mu0, sin0, tan0):
    ns = lg.nstream
    nd = ns * nreg
    g0 = np.zeros((nreg, nreg))
    g1 = np.zeros((nd, nd))
    g2 = np.zeros((nd, nd))
    g3 = np.zeros((nd, nreg))
    for fr in range(nreg):
        for to in range(nreg):
            if fr != to:
                g0[fr, fr] -= tan0 * f_ex[to, fr]
                g0[to, fr] += tan0 * f_ex[to, fr]
                for s in range(ns):
                    i_fr, i_to = fr * ns + s, to * ns + s
                    g1[i_fr, i_fr] -= lg.tan_ang[s] * f_ex[to, fr]
                    g1[i_to, i_fr] += lg.tan_ang[s] * f_ex[to, fr]
    for r in range(nreg):
        g0[r, r] -= ext[r] / mu0 + tan0 * f_wall[r] * wall_ext
        for s in range(ns):
            i = r * ns + s
            g1[i, i] -= ext[r] / lg.mu[s] + lg.tan_ang[s] * f_wall[r] * wall_ext
        for sf in range(ns):
            for st in range(ns):
                g2[r * ns + st, r * ns + sf] = 0.5 * (
                    lg.weight[st] * ext[r] * ssa[r] / lg.mu[sf]
                    + lg.vweight[st] * lg.tan_ang[sf] * f_wall[r] * wall_factor
                )
        for s in range(ns):
            g3[r * ns + s, r] = 0.5 * (
                lg.weight[s] * ext[r] * ssa[r]
                + lg.vweight[s] * sin0 * f_wall[r] * wall_factor
            )
    g1 = g1 + g2
    return g0, g1, g2, g3


@pytest.mark.parametrize("ns,nreg,with_wall", [
    (4, 2, False), (4, 1, True), (2, 3, True), (1, 2, True),
])
def test_assemble_matches_scalar(ns, nreg, with_wall):
    rng = np.random.default_rng(5)
    lg = LegendreGauss(ns)
    ext = rng.uniform(0.1, 1.0, nreg)
    ssa = rng.uniform(0.2, 0.9, nreg)
    f_ex = rng.uniform(0.0, 0.3, (nreg, nreg))
    np.fill_diagonal(f_ex, 0.0)
    f_wall = rng.uniform(0.0, 0.2, nreg) if with_wall else np.zeros(nreg)
    wall_ext = 0.8 if with_wall else 0.0
    wall_factor = 0.15 if with_wall else 0.0
    mu0 = 0.6
    sin0 = np.sqrt(1 - mu0**2)
    tan0 = sin0 / mu0

    want = scalar_gammas(lg, nreg, ext, ssa, f_ex, f_wall, wall_ext,
                         wall_factor, mu0, sin0, tan0)

    # Vectorized: C=1, L=1, S=1
    g0, g1, g2, g3 = G.assemble_gammas(
        ext_reg=ext[None, None, None],
        ssa_reg=ssa[None, None, None],
        f_exchange=f_ex[None, None],
        f_wall=f_wall[None, None],
        wall_ext=np.full((1, 1, 1), wall_ext),
        wall_factor=np.full((1, 1, 1), wall_factor),
        lg=lg,
        nreg=nreg,
        cos_sza=np.array([mu0]),
        sin_sza=np.array([sin0]),
        tan_sza=np.array([tan0]),
    )
    np.testing.assert_allclose(np.asarray(g0)[0, 0, 0], want[0], atol=1e-13)
    np.testing.assert_allclose(np.asarray(g1)[0, 0, 0], want[1], atol=1e-13)
    np.testing.assert_allclose(np.asarray(g2)[0, 0, 0], want[2], atol=1e-13)
    np.testing.assert_allclose(np.asarray(g3)[0, 0, 0], want[3], atol=1e-13)


def test_lw_no_direct():
    lg = LegendreGauss(4)
    nreg = 2
    g0, g1, g2, g3 = G.assemble_gammas(
        ext_reg=np.full((1, 1, 1, nreg), 0.5),
        ssa_reg=np.full((1, 1, 1, nreg), 0.3),
        f_exchange=np.zeros((1, 1, nreg, nreg)),
        f_wall=np.zeros((1, 1, nreg)),
        wall_ext=np.ones((1, 1, 1)),
        wall_factor=np.zeros((1, 1, 1)),
        lg=lg,
        nreg=nreg,
    )
    assert g0 is None and g3 is None
    assert np.asarray(g1).shape == (1, 1, 1, 8, 8)


def test_region_fracs_forest_equals_urban_limit():
    from spartacus_surface_tpu.models.geometry import region_fracs

    veg = np.array([[0.3, 0.5]])
    bf = np.zeros_like(veg)
    fr = np.asarray(region_fracs(veg, bf, 3))
    np.testing.assert_allclose(fr[..., 0], 1 - veg)
    np.testing.assert_allclose(fr[..., 1], veg / 2)
    np.testing.assert_allclose(fr[..., 1], fr[..., 2])
