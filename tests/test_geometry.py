"""Geometry tests: vectorized overlap/perimeter/view-factor functions vs
direct scalar transcriptions of the reference loops, plus hand values."""

import numpy as np
import pytest

from spartacus_surface_tpu.models import geometry as geo
from spartacus_surface_tpu.models.view_factor import (
    view_factors_exp, view_factors_inf)
from spartacus_surface_tpu.utils.constants import Pi


def scalar_overlap_urban(fu, fl, nreg):
    """Transcription of calc_overlap_matrix_max_ran_urban
    (radsurf_overlap.F90:178-280), including the nreg=3 overhang quirk."""
    o = np.zeros((nreg, nreg + 1))
    if nreg == 1:
        o[0, 0:2] = fl[0:2]
    elif nreg == 2:
        pc = max(fu[1], fl[1])
        if pc <= fl[0] + fl[1]:
            o[1, 2] = 0.0
            o[0, 2] = fl[2]
            o[0, 0] = fl[0] + fl[1] - pc
            o[0, 1] = pc - fu[1]
            o[1, 0] = pc - fl[1]
            o[1, 1] = fu[1] + fl[1] - pc
        else:
            o[0, 0:2] = 0.0
            o[1, 0:2] = fl[0:2]
            o[1, 2] = fu[1] - fl[0] - fl[1]
            o[0, 2] = fu[0]
    else:
        pc = max(fu[1] + fu[2], fl[1] + fl[2])
        if pc <= fl[0] + fl[1] + fl[2]:
            o[1:3, 3] = 0.0
            o[0, 3] = fl[3]
            o[0, 0] = fl[0] + fl[1] + fl[2] - pc
            if pc > fu[1] + fu[2]:
                o[1, 1] = fu[1]
                o[2, 2] = fu[2]
                o[0, 1] = fl[1] - fu[1]
                o[0, 2] = fl[2] - fu[2]
            else:
                o[1, 1] = fl[1]
                o[2, 2] = fl[2]
                o[1, 0] = fu[1] - fl[1]
                o[2, 0] = fu[2] - fl[2]
        else:
            o[0, 0:3] = 0.0
            o[1, 1] = fl[1]
            o[2, 2] = fl[2]
            o[1, 0] = fl[0] * 0.5
            o[2, 0] = o[0, 1]  # reference quirk (radsurf_overlap.F90:271)
            o[1, 3] = (fl[3] - fu[0]) * 0.5
            o[2, 3] = o[1, 3]
            o[0, 3] = fu[0]
    return o


@pytest.mark.parametrize("nreg", [1, 2, 3])
def test_overlap_matches_scalar(nreg):
    rng = np.random.default_rng(11)
    for trial in range(20):
        # Random layer fracs (summing to <= 1) for a 2-layer column
        f = rng.uniform(0.05, 0.45, (2, nreg))
        f = f / f.sum(-1, keepdims=True) * rng.uniform(0.4, 1.0, (2, 1))
        frac = f[None]  # [C=1, L=2, nreg]
        u_ov, v_ov = geo.overlap_matrices_urban(frac, nreg, 1e-6)
        u_ov, v_ov = np.asarray(u_ov), np.asarray(v_ov)
        # interface above layer 0 (between layer 0 and layer 1)
        fu = f[1]
        sum_l, sum_u = f[0].sum(), f[1].sum()
        roof = sum_u - sum_l
        fl = np.concatenate([f[0], [max(roof, 0.0)]])
        if roof < 0:
            fl[:nreg] = f[0] * sum_u / sum_l
            fl[nreg] = 0.0
        o = scalar_overlap_urban(fu, fl, nreg)
        for ju in range(nreg):
            for jl in range(nreg + 1):
                want_u = o[ju, jl] / fl[jl] if fl[jl] >= 1e-6 else 0.0
                want_v = o[ju, jl] / fu[ju] if fu[ju] >= 1e-6 else 0.0
                np.testing.assert_allclose(u_ov[0, 0, ju, jl], want_u,
                                           atol=1e-12)
                np.testing.assert_allclose(v_ov[0, 0, jl, ju], want_v,
                                           atol=1e-12)


def scalar_norm_perim_urban(bf, bs, vf, vs, vcf, nreg, symmetric, iso,
                            min_vf=1e-6, min_bf=1e-6):
    """Transcription of calc_norm_perim_urban
    (radsurf_norm_perim.F90:131-281)."""
    np_ = np.zeros(nreg)
    npw = np.zeros(nreg)
    if nreg > 1 and vf > min_vf:
        if symmetric:
            np_[0] = 4 * vf * max(0.0, 1 - vf - bf) / (max(min_bf, 1 - bf) * vs)
        else:
            np_[0] = 4 * vf / vs
        if nreg > 2:
            np_[nreg - 1] = 0.5 * iso * np_[0]
            np_[0] = (1 - 0.5 * iso) * np_[0]
            if symmetric:
                np_[1] = ((1 - iso) * 4 * (0.5 * vf) * (1 - 0.5 * vf - bf)
                          / (max(min_bf, 1 - bf) * vs))
            else:
                np_[1] = (1 - iso) * 4 * vf / (np.sqrt(2.0) * vs)
    if bf > min_bf:
        npw[0] = 4 * bf / bs
        if nreg > 1:
            if 1 - vf - bf <= min_vf:
                if nreg == 2:
                    npw[1] = npw[0]
                else:
                    npw[1] = npw[0] * (1 - iso)
                    npw[2] = npw[0] * iso
                npw[0] = 0.0
            elif vf > min_vf and vcf > 0.0:
                if nreg == 2:
                    npw[1] = npw[0] * vcf
                else:
                    npw[1] = npw[0] * vcf * (1 - iso)
                    npw[2] = npw[0] * vcf * iso
                npw[0] = npw[0] * (1 - vcf)
    return np_, npw


@pytest.mark.parametrize("nreg,symmetric,iso", [
    (2, True, 0.0), (2, False, 0.0), (3, True, 0.5), (3, False, 1.0),
    (1, True, 0.0),
])
def test_norm_perim_matches_scalar(nreg, symmetric, iso):
    rng = np.random.default_rng(21)
    for case in range(12):
        bf = rng.uniform(0.0, 0.5)
        vf = rng.uniform(0.0, min(0.6, 1 - bf))
        if case % 4 == 0:
            vf = 0.0
        if case % 5 == 0:
            vf = 1 - bf  # no clear region
        bs, vs, vcf = 45.0, 110.0, rng.uniform(0.0, 1.0)
        want_np, want_npw = scalar_norm_perim_urban(
            bf, bs, vf, vs, vcf, nreg, symmetric, iso)
        got_np, got_npw = geo.norm_perim_urban(
            np.array([[bf]]), np.array([[bs]]), np.array([[vf]]),
            np.array([[vs]]), np.array([[vcf]]),
            nreg=nreg, use_symmetric_vegetation_scale=symmetric,
            vegetation_isolation_factor=iso,
            min_vegetation_fraction=1e-6, min_building_fraction=1e-6,
        )
        np.testing.assert_allclose(np.asarray(got_np)[0, 0], want_np,
                                   atol=1e-12, err_msg=f"np case {case}")
        np.testing.assert_allclose(np.asarray(got_npw)[0, 0], want_npw,
                                   atol=1e-12, err_msg=f"npw case {case}")


def test_view_factors_inf_hand_values():
    # H/W -> 0: ground sees the whole sky; walls see nothing of each other
    vgs, vww, vdg = view_factors_inf(np.array([1e-8]), np.array([0.5]))
    assert np.isclose(vgs[0], 1.0, atol=1e-6)
    assert np.isclose(vww[0], 0.0, atol=1e-6)
    assert np.isclose(vdg[0], 1.0, atol=1e-4)
    # H/W = 1: classic canyon values sqrt(2)-1
    vgs, vww = view_factors_inf(np.array([1.0]))
    assert np.isclose(vgs[0], np.sqrt(2.0) - 1.0)
    assert np.isclose(vww[0], np.sqrt(2.0) - 1.0)


def test_view_factors_exp_limits():
    vgs, vww = view_factors_exp(np.array([1e-9]))
    assert np.isclose(vgs[0], 1.0, atol=1e-6)
    assert np.isclose(vww[0], 0.0, atol=1e-6)
    # Deep canyons: ground sees almost no sky; walls mostly see walls
    # (the exponential separation distribution has long tails, so a little
    # sky remains visible even at H/X = 20)
    vgs, vww = view_factors_exp(np.array([20.0]))
    assert vgs[0] < 5e-3
    assert vww[0] > 0.9


def test_sw_conservation_with_isolation_factor():
    """nreg=3 with a nonzero vegetation isolation factor (untested path)."""
    from spartacus_surface_tpu.models.solver import (
        SolverOptions, spartacus_sw)
    from spartacus_surface_tpu.ops.legendre_gauss import LegendreGauss
    from tests.test_solver_conservation import make_inputs, residual_sw

    rng = np.random.default_rng(31)
    inp = make_inputs(rng, urban=True)
    opt = SolverOptions(nreg=3, nstream=2, do_urban=True,
                        vegetation_isolation_factor=0.5)
    nd, nf, _ = spartacus_sw(inp, opt, LegendreGauss(2))
    np.testing.assert_allclose(residual_sw(nd), 0.0, atol=1e-10)
    np.testing.assert_allclose(residual_sw(nf), 0.0, atol=1e-10)
