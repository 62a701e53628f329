"""Oracle tests for the per-layer kernel.

The oracle is an independent float64 numpy/scipy implementation: full
matrix exponential of the two-point-BVP Gamma matrix (scipy.linalg.expm,
pivoted numpy solves), plus Gauss-Legendre quadrature in z for the
absorption-integral matrices.  This replaces the role of the reference's
print-and-inspect kernel tests (driver/test_sw.F90, driver/test_lw.F90) with
automated assertions.
"""

import numpy as np
import pytest
import scipy.linalg

from spartacus_surface_tpu.ops.layer_matrices import (
    combine_layers,
    layer_matrices,
    lw_layer_matrices,
)
from spartacus_surface_tpu.ops.legendre_gauss import LegendreGauss


def make_gammas(rng, ns=4, nreg=2, ssa=None, f_scale=0.1, ext_scale=1.0):
    """Random SPARTACUS-structured Gamma matrices (numpy, single instance).

    Mirrors the forest SW assembly (radsurf/radsurf_forest_sw.F90:326-387).
    """
    lg = LegendreGauss(ns)
    nd = ns * nreg
    ext = ext_scale * rng.uniform(0.1, 1.0, nreg)
    if ssa is None:
        ssa = rng.uniform(0.2, 0.9, nreg)
    else:
        ssa = np.full(nreg, ssa)
    f_ex = f_scale * rng.uniform(0.0, 1.0, (nreg, nreg))
    np.fill_diagonal(f_ex, 0.0)
    mu0 = rng.uniform(0.3, 0.9)
    tan0 = np.sqrt(1 - mu0**2) / mu0

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
        g0[r, r] -= ext[r] / mu0
        for s in range(ns):
            i = r * ns + s
            g1[i, i] -= ext[r] / lg.mu[s]
        for sf in range(ns):
            for st in range(ns):
                g2[r * ns + st, r * ns + sf] = (
                    0.5 * lg.weight[st] * ext[r] * ssa[r] / lg.mu[sf]
                )
        for s in range(ns):
            g3[r * ns + s, r] = 0.5 * lg.weight[s] * ext[r] * ssa[r]
    g1 = g1 + g2
    return g0, g1, g2, g3


def oracle_layer(g0, g1, g2, g3, dz):
    nd, ndir = g1.shape[0], g0.shape[0]
    G = np.block([
        [-g1, -g2, -g3],
        [g2, g1, g3],
        [np.zeros((ndir, 2 * nd)), g0],
    ])
    F = scipy.linalg.expm(G * dz)
    F11, F12, F13 = F[:nd, :nd], F[:nd, nd:2 * nd], F[:nd, 2 * nd:]
    F21, F22, F23 = F[nd:2 * nd, :nd], F[nd:2 * nd, nd:2 * nd], F[nd:2 * nd, 2 * nd:]
    F33 = F[2 * nd:, 2 * nd:]
    X = np.linalg.solve(F11, np.hstack([F12, F13]))
    X1, X2 = X[:, :nd], X[:, nd:]
    return {
        "R": -X1,
        "T": F22 - F21 @ X1,
        "E": F33,
        "Sup": -X2,
        "Sdn": F23 - F21 @ X2,
        "G": G,
    }


@pytest.mark.parametrize("ns,nreg", [(1, 1), (2, 2), (4, 2), (4, 3), (8, 1)])
def test_layer_vs_oracle(ns, nreg):
    rng = np.random.default_rng(42)
    g0, g1, g2, g3 = make_gammas(rng, ns, nreg)
    # The ORACLE forms the full exponential, whose conditioning degrades as
    # e^(lambda_max*dz); with 8 streams mu_min ~ 0.02 so keep the optical
    # path small enough that the oracle itself is accurate (the kernel's
    # doubling route is stable at any depth, see
    # test_large_optical_depth_stable).
    dz = 0.15 if ns == 8 else 0.7
    got = layer_matrices(g0[None], g1[None], g2[None], g3[None], np.array([dz]))
    want = oracle_layer(g0, g1, g2, g3, dz)
    for key in ("R", "T", "E", "Sup", "Sdn"):
        np.testing.assert_allclose(
            np.asarray(got[key])[0], want[key], rtol=1e-9, atol=1e-12, err_msg=key
        )


def test_large_optical_depth_stable():
    """Doubling must stay finite where the naive expm overflows."""
    rng = np.random.default_rng(7)
    g0, g1, g2, g3 = make_gammas(rng, 4, 2, ext_scale=40.0)
    dz = 20.0  # diffuse optical depth ~ hundreds
    got = layer_matrices(g0[None], g1[None], g2[None], g3[None], np.array([dz]))
    R = np.asarray(got["R"])[0]
    T = np.asarray(got["T"])[0]
    assert np.all(np.isfinite(R)) and np.all(np.isfinite(T))
    assert np.all(T >= -1e-12) and np.all(T.sum(0) < 1.0 + 1e-9)
    # Semigroup self-consistency: layer(2 dz) == combine(layer(dz), layer(dz))
    half = layer_matrices(
        g0[None], g1[None], g2[None], g3[None], np.array([dz / 2]), with_int=False
    )
    comb = combine_layers(half, half)
    for key in ("R", "T", "E", "Sup", "Sdn"):
        np.testing.assert_allclose(
            np.asarray(got[key])[0], np.asarray(comb[key])[0],
            rtol=1e-8, atol=1e-12, err_msg=key,
        )


def test_zero_dz_is_identity():
    rng = np.random.default_rng(8)
    g0, g1, g2, g3 = make_gammas(rng, 4, 2)
    got = layer_matrices(g0[None], g1[None], g2[None], g3[None], np.array([0.0]))
    nd = g1.shape[0]
    np.testing.assert_allclose(np.asarray(got["T"])[0], np.eye(nd), atol=1e-14)
    np.testing.assert_allclose(np.asarray(got["R"])[0], 0.0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(got["E"])[0], np.eye(g0.shape[0]), atol=1e-14)
    np.testing.assert_allclose(np.asarray(got["Sup"])[0], 0.0, atol=1e-14)


def test_energy_conservation_no_absorption():
    """ssa=1, no walls: column sums of R+T are 1; direct energy balances."""
    rng = np.random.default_rng(9)
    ns, nreg = 4, 2
    g0, g1, g2, g3 = make_gammas(rng, ns, nreg, ssa=1.0)
    dz = 1.3
    got = layer_matrices(g0[None], g1[None], g2[None], g3[None], np.array([dz]))
    R, T = np.asarray(got["R"])[0], np.asarray(got["T"])[0]
    np.testing.assert_allclose((R + T).sum(0), 1.0, rtol=1e-9)
    # Direct: mu0*(1 - 1^T E) per unit s equals scattered diffuse 1^T(Sup+Sdn)
    # only in aggregate energy terms; check the full budget with the
    # integral matrices instead: absorption = 0 when ssa=1.
    E = np.asarray(got["E"])[0]
    Sup, Sdn = np.asarray(got["Sup"])[0], np.asarray(got["Sdn"])[0]
    # Recover mu0 from gamma0 diagonal: g0 diag = -ext/mu0 - tan0*f; instead
    # use a weaker invariant: all outputs in [0, ...] and finite.
    assert np.all(E >= -1e-12) and np.all(Sup >= -1e-10) and np.all(Sdn >= -1e-10)


def _bvp_state_top(lay, v_top, s_top, u_base):
    """Full state x(0) at layer top for given inputs (numpy)."""
    R, T, Sup = lay["R"], lay["T"], lay["Sup"]
    u_top = R @ v_top + Sup @ s_top + T @ u_base
    return u_top


@pytest.mark.parametrize("ns,nreg", [(2, 2), (4, 2)])
def test_integral_matrices(ns, nreg):
    """int_diff/int_dir/int_dir_diff vs Gauss quadrature of the ODE solution."""
    rng = np.random.default_rng(10)
    g0, g1, g2, g3 = make_gammas(rng, ns, nreg)
    dz = 0.9
    nd, ndir = g1.shape[0], g0.shape[0]
    got = layer_matrices(g0[None], g1[None], g2[None], g3[None], np.array([dz]))
    want = oracle_layer(g0, g1, g2, g3, dz)
    G = want["G"]

    v_top = rng.uniform(0.2, 1.0, nd)
    s_top = rng.uniform(0.2, 1.0, ndir)
    u_base = rng.uniform(0.0, 0.5, nd)
    u_top = _bvp_state_top(want, v_top, s_top, u_base)
    x0 = np.concatenate([u_top, v_top, s_top])

    # Quadrature of x(z) = expm(G z) x0 over [0, dz]
    ynode, w = np.polynomial.legendre.leggauss(24)
    znode = 0.5 * dz * (ynode + 1.0)
    wz = 0.5 * dz * w
    xs = np.stack([scipy.linalg.expm(G * z) @ x0 for z in znode])
    int_uv = (wz[:, None] * (xs[:, :nd] + xs[:, nd:2 * nd])).sum(0)
    int_s = (wz[:, None] * xs[:, 2 * nd:]).sum(0)

    x_base = scipy.linalg.expm(G * dz) @ x0
    u_base_chk, v_base, s_base = x_base[:nd], x_base[nd:2 * nd], x_base[2 * nd:]
    # Oracle-conditioning-limited (kappa ~ e^(lambda dz))
    np.testing.assert_allclose(u_base_chk, u_base, rtol=1e-6, atol=1e-8)

    conv = (v_top + u_base) - (u_top + v_base)
    s_conv = s_top - s_base
    int_diff = np.asarray(got["int_diff"])[0]
    int_dir = np.asarray(got["int_dir"])[0]
    int_dir_diff = np.asarray(got["int_dir_diff"])[0]
    # Tolerance reflects the ORACLE's conditioning (it propagates growing
    # exponential modes, kappa ~ e^(lambda dz)), not kernel accuracy.
    np.testing.assert_allclose(
        int_diff @ conv + int_dir_diff @ s_conv, int_uv, rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(int_dir @ s_conv, int_s, rtol=1e-6, atol=1e-9)


def test_lw_emission_source():
    """LW p and int_source vs augmented-matrix oracle + quadrature."""
    rng = np.random.default_rng(11)
    ns, nreg = 4, 2
    g0, g1, g2, g3 = make_gammas(rng, ns, nreg)
    nd = g1.shape[0]
    b = rng.uniform(0.5, 2.0, nd)
    dz = 1.1

    got = lw_layer_matrices(g1[None], g2[None], b[None], np.array([dz]))

    # Oracle: augmented system with constant state 1
    want = oracle_layer(np.zeros((1, 1)), g1, g2, b[:, None], dz)
    np.testing.assert_allclose(np.asarray(got["p"])[0], want["Sup"][:, 0],
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(want["Sup"], want["Sdn"], rtol=1e-9, atol=1e-12)

    # Integrated flux with emission: x' = Gd x + c, c = [-b; b]
    Gd = np.block([[-g1, -g2], [g2, g1]])
    c = np.concatenate([-b, b])
    xp = -np.linalg.solve(Gd, c)  # particular solution
    v_top = rng.uniform(0.2, 1.0, nd)
    u_base = rng.uniform(0.0, 0.5, nd)
    R, T, p = np.asarray(got["R"])[0], np.asarray(got["T"])[0], np.asarray(got["p"])[0]
    u_top = R @ v_top + T @ u_base + p
    x0 = np.concatenate([u_top, v_top])

    ynode, w = np.polynomial.legendre.leggauss(30)
    znode = 0.5 * dz * (ynode + 1.0)
    wz = 0.5 * dz * w
    xs = np.stack(
        [scipy.linalg.expm(Gd * z) @ (x0 - xp) + xp for z in znode]
    )
    int_uv = (wz[:, None] * (xs[:, :nd] + xs[:, nd:])).sum(0)

    x_base = scipy.linalg.expm(Gd * dz) @ (x0 - xp) + xp
    u_base_chk, v_base = x_base[:nd], x_base[nd:]
    np.testing.assert_allclose(u_base_chk, u_base, rtol=1e-7, atol=1e-9)

    conv = (v_top + u_base) - (u_top + v_base)
    int_diff = np.asarray(got["int_diff"])[0]
    int_source = np.asarray(got["int_source"])[0]
    np.testing.assert_allclose(
        int_diff @ conv + int_source, int_uv, rtol=1e-7, atol=1e-9
    )
