"""Per-layer operator factories via the reference's eigen route.

Transcribes radtool_calc_matrices_sw_eig.F90:30-298 and
radtool_calc_matrices_lw_eig.F90:32-230 into NumPy float64, batched over the
spectral dimension (leading axis).  The eigendecomposition itself uses
numpy.linalg.eig in place of the reference's ASYMTX port
(radtool_eigen_decomposition.F90:51): the matrices have real eigenvalues a
priori and every output below is invariant to eigenvalue ordering and
eigenvector scaling, so any correct eigensolver gives the same operators.
"""

from __future__ import annotations

import numpy as np


def _eig_real(a):
    """Eigendecomposition of real matrices with a-priori real eigenvalues."""
    lam, vec = np.linalg.eig(a)
    return lam.real, vec.real


def schur_invert_sw(g0, g1, g2, g3):
    """Structured inverse of the SW Gamma (radtool_schur.F90:32-53).

    If Gamma = [[-g1, -g2, -g3], [g2, g1, g3], [0, 0, g0]] then
    inv(Gamma) = [[-g1i, -g2i, -g3i], [g2i, g1i, -g3i], [0, 0, g0i]].
    """
    g0i = np.linalg.inv(g0)
    g1i = np.linalg.inv(g1 - g2 @ np.linalg.solve(g1, g2))
    g2i = g1i @ g2 @ np.linalg.inv(g1)
    g3i = (g1i - g2i) @ (g3 @ g0i)
    return g0i, g1i, g2i, g3i


def calc_matrices_sw_eig(dz, mu0, gamma0, gamma1, gamma2, gamma3,
                         with_int=True):
    """SW layer operators from the Gamma blocks (batched over spectral).

    Args:
      dz: layer thickness (scalar).
      mu0: cosine of solar zenith angle (scalar).
      gamma0: [S, ndir, ndir]; gamma1, gamma2: [S, nd, nd];
      gamma3: [S, nd, ndir].

    Returns dict with reflectance/transmittance [S, nd, nd], s_up/s_dn
    [S, nd, ndir], trans_dir [S, ndir, ndir] and (with_int) the integral
    matrices.  Parity: radtool_calc_matrices_sw_eig.F90:175-296.
    """
    S, nd, ndir = gamma3.shape

    # Section 1: eigen system of the diffuse block via the DISORT trick
    gamma_diff = gamma1 - gamma2
    gamma_product = gamma_diff @ (gamma1 + gamma2)
    lam2, evec = _eig_real(gamma_product)
    lam = np.sqrt(np.maximum(0.0, lam2))           # [S, nd]
    exp_lam = np.exp(-lam * dz)

    tmp = -np.linalg.solve(gamma_diff, evec) * lam[:, None, :]
    g1v = evec + tmp
    g2v = evec - tmp

    # Section 2: diffuse reflectance/transmittance via the Schur solve of
    # the two-point boundary problem (Eqs. 48-49 of Hogan 2019 BLM)
    g1_d = g1v * exp_lam[:, None, :]
    g2_d = g2v * exp_lam[:, None, :]
    cprime_lower = np.linalg.inv(
        g1v - g2_d @ np.linalg.solve(g1v, g2_d)
    )
    cprime_upper = -np.linalg.solve(g1v, g2_d @ cprime_lower)
    reflectance = g1_d @ cprime_upper + g2v @ cprime_lower
    transmittance = g2v @ cprime_upper + g1_d @ cprime_lower

    # Section 3: direct transmittance = expm(gamma0*dz) by eigen route
    lam0, g0v = _eig_real(gamma0)
    exp_lam0 = np.exp(lam0 * dz)                   # [S, ndir]
    trans_dir = (g0v * exp_lam0[:, None, :]) @ np.linalg.inv(g0v)

    # Section 4: mixed direct-diffuse eigenvector columns g3v, g4v
    gamma3_g0 = gamma3 @ g0v                        # [S, nd, ndir]
    eye_nd = np.eye(nd)
    g3v = np.empty_like(gamma3_g0)
    g4v = np.empty_like(gamma3_g0)
    for jd in range(ndir):
        l0 = lam0[:, jd][:, None, None]
        gamma1_d = gamma1 + l0 * eye_nd
        a = gamma2 @ np.linalg.inv(gamma1_d)
        tmp_m = gamma1 - a @ gamma2 - l0 * eye_nd
        rhs = (a - eye_nd) @ gamma3_g0[:, :, jd:jd + 1]
        g4v[:, :, jd] = np.linalg.solve(tmp_m, rhs)[:, :, 0]
        g3v[:, :, jd] = -np.linalg.solve(
            gamma1_d, gamma3_g0[:, :, jd:jd + 1]
            + gamma2 @ g4v[:, :, jd:jd + 1]
        )[:, :, 0]

    # Direct-diffuse sources by solving the assembled eigenvector system
    # (direct_diffuse_part, radtool_calc_matrices_sw_eig.F90:303-386)
    n_full = 2 * nd + ndir
    g_d = np.zeros((S, n_full, n_full))
    g_d[:, :nd, :nd] = g1v
    g_d[:, nd:2 * nd, :nd] = g2_d
    g_d[:, :nd, nd:2 * nd] = g2_d
    g_d[:, nd:2 * nd, nd:2 * nd] = g1v
    g_d[:, 2 * nd:, 2 * nd:] = g0v
    g_d[:, :nd, 2 * nd:] = g3v * exp_lam0[:, None, :]
    g_d[:, nd:2 * nd, 2 * nd:] = g4v
    rhs = np.zeros((S, n_full, ndir))
    for jj in range(ndir):
        rhs[:, 2 * nd + jj, jj] = 1.0
    cprime_dir = np.linalg.solve(g_d, rhs)

    row = np.concatenate(
        [g1v * exp_lam[:, None, :], g2v, g3v], axis=2
    )  # [S, nd, n_full]
    s_up = row @ cprime_dir
    row = np.concatenate(
        [g2v, g1v * exp_lam[:, None, :], g4v * exp_lam0[:, None, :]], axis=2
    )
    s_dn = row @ cprime_dir

    out = dict(
        reflectance=reflectance, transmittance=transmittance,
        s_up=s_up, s_dn=s_dn, trans_dir=trans_dir,
    )
    if with_int:
        g0i, g1i, g2i, g3i = schur_invert_sw(gamma0, gamma1, gamma2, gamma3)
        out["int_dir"] = -g0i
        out["int_diff"] = g2i - g1i
        out["int_dir_diff"] = 2.0 * g3i
    return out


def calc_matrices_lw_eig(dz, gamma1, gamma2, emiss_rate, with_int=True):
    """LW layer operators (radtool_calc_matrices_lw_eig.F90:32-230).

    Args: gamma1/gamma2 [S, n, n], emiss_rate [S, n] ("b" in Eq. 32).
    Returns reflectance/transmittance [S, n, n], source [S, n] and
    (with_int) int_flux [S, n, n], int_flux_source [S, n].
    """
    S, n, _ = gamma1.shape
    gamma_diff = gamma1 - gamma2
    gamma_product = gamma_diff @ (gamma1 + gamma2)
    lam2, evec = _eig_real(gamma_product)
    lam = np.sqrt(np.maximum(0.0, lam2))
    exp_lam = np.exp(-lam * dz)

    tmp = -np.linalg.solve(gamma_diff, evec) * lam[:, None, :]
    g1v = evec + tmp
    g2v = evec - tmp

    g1_d = g1v * exp_lam[:, None, :]
    g2_d = g2v * exp_lam[:, None, :]
    cprime_lower = np.linalg.inv(g1v - g2_d @ np.linalg.solve(g1v, g2_d))
    cprime_upper = -np.linalg.solve(g1v, g2_d @ cprime_lower)
    reflectance = g1_d @ cprime_upper + g2v @ cprime_lower
    transmittance = g2v @ cprime_upper + g1_d @ cprime_lower

    # Upper/lower part of Gamma^-1 [-b; b] via the Schur complement
    # (radtool_calc_matrices_lw_eig.F90:183-197)
    eye_n = np.eye(n)
    g2ig1 = gamma2 @ np.linalg.inv(gamma1)
    tmp_m = gamma1 - g2ig1 @ gamma2
    inv_gamma_b = np.linalg.solve(
        tmp_m, ((g2ig1 - eye_n) @ emiss_rate[:, :, None])
    )[:, :, 0]

    # Source "p" in Eq. 57 (lines 200-211)
    inv_g1_b = np.linalg.solve(g1v, inv_gamma_b[:, :, None])[:, :, 0]
    tmp_v = inv_gamma_b - (g2_d @ inv_g1_b[:, :, None])[:, :, 0]
    cb_prime = -(cprime_lower @ tmp_v[:, :, None])[:, :, 0]
    source = ((g1_d + g2v) @ cb_prime[:, :, None])[:, :, 0] + inv_gamma_b

    out = dict(reflectance=reflectance, transmittance=transmittance,
               source=source)
    if with_int:
        # Z = (1 - exp(-lambda dz)) / lambda (Eq. 58); lambda -> 0 limit is
        # dz (the reference divides unguarded; padding layers never reach
        # pyref so the guard only covers true zero modes)
        z = np.where(lam > 0.0, (1.0 - exp_lam) / np.where(lam > 0.0, lam, 1.0),
                     dz)
        g1z = g1v * z[:, None, :]
        g2z = g2v * z[:, None, :]
        tmp_m2 = g1z + g2z
        out["int_flux"] = tmp_m2 @ (cprime_lower + cprime_upper)
        out["int_flux_source"] = 2.0 * (
            (tmp_m2 @ cb_prime[:, :, None])[:, :, 0] + inv_gamma_b * dz
        )
        # Independent convergence-form representation: integrating
        # d[u;v]/dz = Gamma [u;v] + [-b; b] over the layer gives exactly
        # int(u+v) = (g2i - g1i) @ (flux convergence) + 2 (g2i - g1i) b dz,
        # with g1i/g2i the Schur blocks of Gamma^-1 (radtool_schur.F90
        # structure applied to the 2-block LW Gamma).  Unlike the Z-form
        # above, this is consistent with ANY flux quadruple — the
        # reference's adding sweep uses the (I - a R)^-1 denominator whose
        # fluxes are not exact single-layer BVP solutions, making the
        # Z-form bookkeeping leak energy (the reference's own documented
        # LW residual); see tests/test_pyref_parity.py.
        g1i = np.linalg.inv(gamma1 - gamma2 @ np.linalg.solve(gamma1, gamma2))
        g2i = g1i @ gamma2 @ np.linalg.inv(gamma1)
        out["int_diff"] = g2i - g1i
        out["int_source_conv"] = 2.0 * (
            out["int_diff"] @ emiss_rate[:, :, None]
        )[:, :, 0] * dz
    return out
