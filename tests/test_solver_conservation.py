"""Energy-conservation tests for the unified SPARTACUS solver.

The invariant is the reference's own conservation check
(radsurf/radsurf_canopy_flux.F90:465-542): for each normalized flux
component, ground_net + clear_air_abs + wall_net + roof_net + veg_abs +
veg_air_abs - top_net == 0 per column.  The reference documentation's worked
example shows residuals ~1e-13 (SW) in double precision
(doc/spartacus_surface_documentation.tex:955-979).
"""

import numpy as np
import pytest

from spartacus_surface_tpu.models.solver import (
    CanopyInputs,
    SolverOptions,
    spartacus_lw,
    spartacus_sw,
)
from spartacus_surface_tpu.ops.legendre_gauss import LegendreGauss
from spartacus_surface_tpu.utils.constants import StefanBoltzmann


def make_inputs(rng, C=4, L=3, S=2, urban=True, pad_layers=0, seed_pad=None):
    """Random physically-plausible canopy inputs (padding above canopy)."""
    Lp = L + pad_layers
    def pad_l(x, fill=0.0):
        if pad_layers == 0:
            return x
        return np.concatenate(
            [x, np.full((C, pad_layers) + x.shape[2:], fill, x.dtype)], axis=1
        )

    dz = pad_l(rng.uniform(2.0, 8.0, (C, L)))
    veg_fraction = pad_l(rng.uniform(0.05, 0.4, (C, L)))
    building_fraction = pad_l(
        rng.uniform(0.05, 0.35, (C, L)) if urban else np.zeros((C, L))
    )
    # Make building fraction non-increasing with height (usual city)
    building_fraction = np.sort(building_fraction, axis=1)[:, ::-1]
    if pad_layers:
        building_fraction[:, L:] = 0.0

    inp = CanopyInputs(
        dz=dz,
        cos_sza=rng.uniform(0.2, 0.95, C),
        veg_fraction=veg_fraction,
        veg_scale=pad_l(rng.uniform(50.0, 200.0, (C, L)), fill=1.0),
        veg_ext=pad_l(rng.uniform(0.1, 0.6, (C, L))),
        veg_fsd=pad_l(rng.uniform(0.3, 1.0, (C, L))),
        veg_contact_fraction=pad_l(rng.uniform(0.0, 0.6, (C, L))),
        building_fraction=building_fraction,
        building_scale=pad_l(rng.uniform(20.0, 100.0, (C, L)), fill=1.0),
        air_ext=pad_l(np.full((C, L, S), 1.0e-5)),
        air_ssa=pad_l(np.full((C, L, S), 0.999)),
        veg_ssa=pad_l(rng.uniform(0.3, 0.7, (C, L, S))),
        ground_albedo=rng.uniform(0.05, 0.4, (C, S)),
        ground_albedo_dir=rng.uniform(0.05, 0.4, (C, S)),
        roof_albedo=pad_l(rng.uniform(0.1, 0.4, (C, L, S))),
        roof_albedo_dir=pad_l(rng.uniform(0.1, 0.4, (C, L, S))),
        wall_albedo=pad_l(rng.uniform(0.1, 0.4, (C, L, S))),
        wall_specular_frac=pad_l(rng.uniform(0.0, 0.5, (C, L, S))),
    )
    return inp


def add_lw(inp, rng):
    C, L = inp.dz.shape
    S = inp.air_ext.shape[-1]
    tg = rng.uniform(280.0, 300.0, (C,))
    eg = rng.uniform(0.9, 1.0, (C, S))
    tw = rng.uniform(280.0, 300.0, (C, L))
    tr = rng.uniform(280.0, 300.0, (C, L))
    er = rng.uniform(0.85, 1.0, (C, L, S))
    ew = rng.uniform(0.85, 1.0, (C, L, S))
    sb = StefanBoltzmann
    inp.air_ssa = np.zeros_like(inp.air_ssa)
    inp.ground_emissivity = eg
    inp.ground_emission = sb * eg * tg[:, None] ** 4
    inp.roof_emissivity = er
    inp.roof_emission = sb * er * tr[:, :, None] ** 4
    inp.wall_emissivity = ew
    inp.wall_emission = sb * ew * tw[:, :, None] ** 4
    inp.clear_air_planck = sb * rng.uniform(275.0, 295.0, (C, L, 1)) ** 4 * np.ones((1, 1, S))
    inp.veg_planck = sb * rng.uniform(275.0, 295.0, (C, L, 1)) ** 4 * np.ones((1, 1, S))
    inp.veg_air_planck = sb * rng.uniform(275.0, 295.0, (C, L, 1)) ** 4 * np.ones((1, 1, S))
    return inp


def residual_sw(out):
    r = np.asarray(out["ground_net"]).sum(-1)
    for key in ("clear_air_abs", "veg_abs", "veg_air_abs", "wall_net",
                "roof_net"):
        if key in out:
            r = r + np.asarray(out[key]).sum((-1, -2))
    return r - np.asarray(out["top_net"]).sum(-1)


@pytest.mark.parametrize("urban,nreg,ns", [
    (True, 1, 4), (True, 2, 4), (False, 2, 4), (False, 3, 2), (True, 3, 1),
])
def test_sw_conservation(urban, nreg, ns):
    rng = np.random.default_rng(123)
    inp = make_inputs(rng, urban=urban)
    opt = SolverOptions(nreg=nreg, nstream=ns, do_urban=urban)
    lg = LegendreGauss(ns)
    norm_dir, norm_diff, bc = spartacus_sw(inp, opt, lg)
    res_dir = residual_sw(norm_dir)
    res_diff = residual_sw(norm_diff)
    np.testing.assert_allclose(res_dir, 0.0, atol=2e-10)
    np.testing.assert_allclose(res_diff, 0.0, atol=2e-10)
    # Albedos physical
    for key in ("top_albedo_diff", "top_albedo_dir"):
        a = np.asarray(bc[key])
        assert np.all(a > 0.0) and np.all(a < 1.0)


@pytest.mark.parametrize("urban,nreg,ns", [
    (True, 1, 4), (True, 2, 2), (False, 2, 4),
])
def test_lw_conservation(urban, nreg, ns):
    rng = np.random.default_rng(321)
    inp = add_lw(make_inputs(rng, urban=urban), rng)
    opt = SolverOptions(nreg=nreg, nstream=ns, do_urban=urban)
    lg = LegendreGauss(ns)
    internal, norm, bc = spartacus_lw(inp, opt, lg)
    np.testing.assert_allclose(residual_sw(internal), 0.0, atol=1e-9)
    np.testing.assert_allclose(residual_sw(norm), 0.0, atol=1e-10)
    e = np.asarray(bc["top_emissivity"])
    assert np.all(e > 0.0) and np.all(e <= 1.0)
    assert np.all(np.asarray(bc["top_emission"]) > 0.0)


def test_padding_is_noop_sw():
    """dz=0 padding layers must not change any output."""
    rng = np.random.default_rng(99)
    inp0 = make_inputs(np.random.default_rng(7), urban=True)
    inp1 = make_inputs(np.random.default_rng(7), urban=True, pad_layers=3)
    opt = SolverOptions(nreg=2, nstream=4, do_urban=True)
    lg = LegendreGauss(4)
    d0, f0, b0 = spartacus_sw(inp0, opt, lg)
    d1, f1, b1 = spartacus_sw(inp1, opt, lg)
    L = inp0.dz.shape[1]
    for key in d0:
        a, b = np.asarray(d0[key]), np.asarray(d1[key])
        if a.ndim >= 2 and a.shape[1] == L:
            b = b[:, :L]
        np.testing.assert_allclose(a, b, atol=1e-12, err_msg=key)
    for key in b0:
        np.testing.assert_allclose(
            np.asarray(b0[key]), np.asarray(b1[key]), atol=1e-12, err_msg=key
        )


def test_forest_equals_urban_with_zero_buildings():
    """Running a forest through the urban machinery must equal running it
    with do_urban=True and building_fraction=0 (the reference consistency
    property, test/simple/README:8-11)."""
    rng = np.random.default_rng(5)
    inp = make_inputs(rng, urban=False)
    lg = LegendreGauss(4)
    f_dir, f_diff, f_bc = spartacus_sw(
        inp, SolverOptions(nreg=2, nstream=4, do_urban=False), lg
    )
    u_dir, u_diff, u_bc = spartacus_sw(
        inp, SolverOptions(nreg=2, nstream=4, do_urban=True), lg
    )
    for key in ("ground_dn", "ground_net", "top_net", "clear_air_abs",
                "veg_abs"):
        np.testing.assert_allclose(
            np.asarray(f_dir[key]), np.asarray(u_dir[key]), atol=1e-12,
            err_msg=key,
        )
    np.testing.assert_allclose(
        np.asarray(f_bc["top_albedo_dir"]), np.asarray(u_bc["top_albedo_dir"]),
        atol=1e-12,
    )


def test_column_chunked_solve_matches_unchunked():
    """opt.column_chunk (lax.map over padded column chunks) is exact:
    chunk boundary and no-op padding columns must not change any output."""
    import jax

    from spartacus_surface_tpu.models.solver import SolverOptions, spartacus_sw

    rng = np.random.default_rng(41)
    inp = make_inputs(rng, C=10, L=2, S=2, urban=True)
    inp = jax.tree_util.tree_map(
        lambda x: None if x is None else np.asarray(x, np.float32), inp
    )
    lg = LegendreGauss(2)
    kw = dict(nreg=2, nstream=2, do_urban=True, n_double=6)
    ref = spartacus_sw(inp, SolverOptions(**kw), lg)
    got = spartacus_sw(inp, SolverOptions(**kw, column_chunk=4), lg)
    for rd, pd in zip(ref, got):
        for k in rd:
            np.testing.assert_allclose(
                np.asarray(pd[k]), np.asarray(rd[k]),
                rtol=2e-5, atol=1e-6, err_msg=k,
            )


def test_auto_column_chunk_resolution():
    """column_chunk = -1 (AUTO) resolves to an even ~2048 split on the
    fused kernel path, and to 'no chunking' off it; explicit values pass
    through untouched."""
    from spartacus_surface_tpu.models.solver import (
        SolverOptions, _resolve_column_chunk)
    from spartacus_surface_tpu.ops.legendre_gauss import LegendreGauss

    lg = LegendreGauss(4)
    base = dict(nreg=2, nstream=4, do_urban=True)
    kern = dict(use_pallas_factory=True, use_pallas_sweeps=True)

    # Explicit values pass through
    assert _resolve_column_chunk(SolverOptions(**base), lg, 10**6) == 0
    assert _resolve_column_chunk(
        SolverOptions(**base, column_chunk=4096), lg, 10**6) == 4096
    # AUTO off the kernel path (CPU backend here): no chunking
    assert _resolve_column_chunk(
        SolverOptions(**base, column_chunk=-1), lg, 10**6) == 0
    # AUTO on the (forced) kernel path: even split near 2048
    opt = SolverOptions(**base, **kern, column_chunk=-1)
    assert _resolve_column_chunk(opt, lg, 2048) == 0      # fits one chunk
    assert _resolve_column_chunk(opt, lg, 16384) == 2048  # 8 even chunks
    ck = _resolve_column_chunk(opt, lg, 5000)             # 3 chunks of 1667
    assert ck == 1667 and -(-5000 // ck) == 3
    # Multiband: target shrinks to ~8192 flattened batch elements
    assert _resolve_column_chunk(opt, lg, 1024, S=14) == 512  # 2 x 512
    assert _resolve_column_chunk(opt, lg, 512, S=14) == 0     # fits one
