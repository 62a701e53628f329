"""pyref dispatch harness: the NumPy-oracle twin of
spartacus_surface_tpu.models.dispatch.run_radsurf.

Loops over columns (the reference's execution model,
radsurf_interface.F90:105-313) calling the per-column pyref solvers, and
fills the same dense flux containers so outputs compare key-for-key against
the production framework.  Flat and simple-urban tiles are analytic
closed-form paths validated by dedicated hand-value tests; this harness
covers the layered SPARTACUS tiles (Forest, Urban, VegetatedUrban).
"""

from __future__ import annotations

import numpy as np

from spartacus_surface_tpu.models.dispatch import (
    _SCAL_LAY_FIELDS, TILE_FOREST, TILE_URBAN, TILE_VEGETATED_URBAN,
    empty_flux)

from .quadrature import make_lg
from .solver_lw import forest_lw, urban_lw
from .solver_sw import forest_sw, urban_sw

PYREF_TILES = (TILE_FOREST, TILE_URBAN, TILE_VEGETATED_URBAN)


def _col_slice(arrays, key, c, nlay):
    """Per-column [S, L] view of a dense [C, L, S] array (real layers)."""
    return np.asarray(arrays[key][c, :nlay]).T


def _tile_setup(config, code):
    if code == TILE_FOREST:
        nreg = config.n_vegetation_region_forest + 1
        cfg = dict(
            min_vegetation_fraction=config.min_vegetation_fraction,
            min_building_fraction=config.min_building_fraction,
            use_symmetric_vegetation_scale=(
                config.use_symmetric_vegetation_scale_forest),
            vegetation_isolation_factor=(
                config.vegetation_isolation_factor_forest),
        )
        return nreg, cfg, (config.n_stream_sw_forest,
                           config.n_stream_lw_forest), False
    nreg = 1 if code == TILE_URBAN else config.n_vegetation_region_urban + 1
    cfg = dict(
        min_vegetation_fraction=config.min_vegetation_fraction,
        min_building_fraction=config.min_building_fraction,
        use_symmetric_vegetation_scale=(
            config.use_symmetric_vegetation_scale_urban),
        vegetation_isolation_factor=(
            config.vegetation_isolation_factor_urban),
    )
    return nreg, cfg, (config.n_stream_sw_urban,
                       config.n_stream_lw_urban), True


def _store(dst, src, c, nlay):
    """Scatter a per-column pyref output dict into the dense containers.
    Per-layer entries are [L, S] or [L]; per-column [S] or scalar."""
    for key, val in src.items():
        if key not in dst:
            continue
        v = np.asarray(val)
        tgt = dst[key]
        if tgt.ndim == 3:                     # [C, Lmax, S] per-layer
            tgt[c, :nlay] = v
        elif key in _SCAL_LAY_FIELDS:         # [C, Lmax] per-layer scalar
            tgt[c, :nlay] = v
        elif tgt.ndim == 2:                   # [C, S] per-column spectral
            tgt[c] = v
        else:                                 # [C] per-column scalar
            tgt[c] = v


def pyref_radsurf(config, arrays):
    """NumPy-oracle radsurf for the layered SPARTACUS tiles.

    Returns the same structure as dispatch.run_radsurf; columns of other
    tile types are left at zero (compare only PYREF_TILES columns).
    """
    rep = np.asarray(arrays["i_representation"])
    ncol = rep.shape[0]
    nlay_max = arrays["dz"].shape[1]
    nlays = np.asarray(arrays["nlay"]).astype(int)
    with_profiles = config.do_save_flux_profile

    out = {}
    if config.do_sw:
        out["sw_norm_dir"] = empty_flux(ncol, nlay_max, config.nswinternal)
        out["sw_norm_diff"] = empty_flux(ncol, nlay_max, config.nswinternal)
    if config.do_lw:
        out["lw_internal"] = empty_flux(ncol, nlay_max, config.nlwinternal)
        out["lw_norm"] = empty_flux(ncol, nlay_max, config.nlwinternal)
    bc = {}
    if config.do_sw:
        bc["sw_albedo"] = np.zeros((ncol, config.nswinternal))
        bc["sw_albedo_dir"] = np.zeros((ncol, config.nswinternal))
    if config.do_lw:
        bc["lw_emissivity"] = np.zeros((ncol, config.nlwinternal))
        bc["lw_emission"] = np.zeros((ncol, config.nlwinternal))
    out["bc_out"] = bc

    for c in range(ncol):
        if rep[c] not in PYREF_TILES:
            continue
        nreg, cfg, (ns_sw, ns_lw), urban = _tile_setup(config, rep[c])
        nlay = nlays[c]
        common = dict(
            dz=np.asarray(arrays["dz"][c, :nlay]),
            veg_fraction=np.asarray(arrays["veg_fraction"][c, :nlay]),
            veg_scale=np.asarray(arrays["veg_scale"][c, :nlay]),
            veg_ext=np.asarray(arrays["veg_ext"][c, :nlay]),
            veg_fsd=np.asarray(arrays["veg_fsd"][c, :nlay]),
            veg_contact_fraction=np.asarray(
                arrays["veg_contact_fraction"][c, :nlay]),
            building_fraction=np.asarray(
                arrays["building_fraction"][c, :nlay]),
            building_scale=np.asarray(arrays["building_scale"][c, :nlay]),
            cos_sza=float(arrays["cos_sza"][c]),
        )
        if config.do_sw:
            galb = np.asarray(arrays["ground_albedo"][c])
            galb_dir = (
                np.asarray(arrays["ground_albedo_dir"][c])
                if config.use_sw_direct_albedo else galb
            )
            col = dict(
                common,
                air_ext=_col_slice(arrays, "sw_air_ext", c, nlay),
                air_ssa=_col_slice(arrays, "sw_air_ssa", c, nlay),
                veg_ssa=_col_slice(arrays, "sw_veg_ssa", c, nlay),
                ground_albedo=galb,
                ground_albedo_dir=galb_dir,
                roof_albedo=_col_slice(arrays, "roof_albedo", c, nlay),
                roof_albedo_dir=_col_slice(
                    arrays, "roof_albedo_dir", c, nlay),
                wall_albedo=_col_slice(arrays, "wall_albedo", c, nlay),
                wall_specular_frac=_col_slice(
                    arrays, "wall_specular_frac", c, nlay),
            )
            lg = make_lg(ns_sw)
            solver = urban_sw if urban else forest_sw
            ndir, ndiff, sbc = solver(col, lg, nreg, cfg, with_profiles)
            if common["cos_sza"] > 0.0:
                # Sun below the horizon: the reference skips the SW solve
                # entirely (radsurf_interface.F90:183,217,248)
                _store(out["sw_norm_dir"], ndir, c, nlay)
                _store(out["sw_norm_diff"], ndiff, c, nlay)
            bc["sw_albedo"][c] = sbc["top_albedo_diff"]
            bc["sw_albedo_dir"][c] = sbc["top_albedo_dir"]
        if config.do_lw:
            col = dict(
                common,
                air_ext=_col_slice(arrays, "lw_air_ext", c, nlay),
                air_ssa=_col_slice(arrays, "lw_air_ssa", c, nlay),
                veg_ssa=_col_slice(arrays, "lw_veg_ssa", c, nlay),
                ground_emissivity=np.asarray(
                    arrays["ground_emissivity"][c]),
                ground_emission=np.asarray(arrays["ground_emission"][c]),
                roof_emissivity=_col_slice(
                    arrays, "roof_emissivity", c, nlay),
                roof_emission=_col_slice(arrays, "roof_emission", c, nlay),
                wall_emissivity=_col_slice(
                    arrays, "wall_emissivity", c, nlay),
                wall_emission=_col_slice(arrays, "wall_emission", c, nlay),
                clear_air_planck=_col_slice(
                    arrays, "clear_air_planck", c, nlay),
                veg_planck=_col_slice(arrays, "veg_planck", c, nlay),
                veg_air_planck=_col_slice(
                    arrays, "veg_air_planck", c, nlay),
            )
            lg = make_lg(ns_lw)
            solver = urban_lw if urban else forest_lw
            lint, lnorm, lbc = solver(col, lg, nreg, cfg, with_profiles)
            _store(out["lw_internal"], lint, c, nlay)
            _store(out["lw_norm"], lnorm, c, nlay)
            bc["lw_emissivity"][c] = lbc["top_emissivity"]
            bc["lw_emission"][c] = lbc["top_emission"]
    return out
