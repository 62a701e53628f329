"""Tile-type dispatch: buckets columns by representation and runs the
appropriate batched solver on each group.

Parity: the per-column `select case (i_representation)` loop of
radsurf/radsurf_interface.F90:105-313, replaced by static column bucketing
(the representation vector is static input data): each group is gathered,
solved fully batched, and scattered back into dense per-column output
arrays.  This keeps every solver call a single jitted program with static
shapes — the TPU-native equivalent of the reference's per-column dispatch.
"""

from __future__ import annotations

import numpy as np

from ..ops.legendre_gauss import LegendreGauss
from ..utils.config import Config
from . import flat as flat_mod
from . import simple_urban as su_mod
from .solver import CanopyInputs, SolverOptions, spartacus_lw, spartacus_sw

# Tile representation codes (radsurf/radsurf_canopy_properties.F90:26-33)
TILE_FLAT = 0
TILE_FOREST = 1
TILE_URBAN = 2
TILE_VEGETATED_URBAN = 3
TILE_SIMPLE_URBAN = 4
TILE_INFINITE_STREET = 5

TILE_NAMES = {
    TILE_FLAT: "Flat",
    TILE_FOREST: "Forest",
    TILE_URBAN: "Urban",
    TILE_VEGETATED_URBAN: "VegetatedUrban",
    TILE_SIMPLE_URBAN: "SimpleUrban",
    TILE_INFINITE_STREET: "InfiniteStreet",
}

_COL_FIELDS = ("ground_dn", "ground_dn_dir", "ground_net",
               "ground_vertical_diff", "top_dn", "top_dn_dir", "top_net")
_LAY_FIELDS = ("roof_in", "roof_in_dir", "roof_net", "wall_in", "wall_in_dir",
               "wall_net", "clear_air_abs", "veg_abs", "veg_air_abs",
               "veg_abs_dir", "flux_dn_layer_top", "flux_dn_dir_layer_top",
               "flux_up_layer_top", "flux_dn_layer_base",
               "flux_dn_dir_layer_base", "flux_up_layer_base")
_SCAL_COL_FIELDS = ("ground_sunlit_frac",)
_SCAL_LAY_FIELDS = ("roof_sunlit_frac", "wall_sunlit_frac", "veg_sunlit_frac")


def empty_flux(ncol, nlay, nspec, dtype=np.float64):
    """Dense canopy-flux container (cf. canopy_flux_type,
    radsurf/radsurf_canopy_flux.F90:27-91)."""
    out = {}
    for key in _COL_FIELDS:
        out[key] = np.zeros((ncol, nspec), dtype)
    for key in _LAY_FIELDS:
        out[key] = np.zeros((ncol, nlay, nspec), dtype)
    for key in _SCAL_COL_FIELDS:
        out[key] = np.zeros((ncol,), dtype)
    for key in _SCAL_LAY_FIELDS:
        out[key] = np.zeros((ncol, nlay), dtype)
    return out


def _scatter(dst: dict, src: dict, idx, sun_up=None):
    """Scatter a solver-group's outputs into the dense containers.

    sun_up: optional [n_group] bool; rows with sun below the horizon are
    zeroed (the reference skips the SW solve entirely then,
    radsurf_interface.F90:183,217,248).
    """
    for key, val in src.items():
        if key not in dst:
            continue
        v = np.asarray(val)
        if sun_up is not None:
            mask = sun_up.reshape((-1,) + (1,) * (v.ndim - 1))
            v = np.where(mask, v, 0.0)
        dst[key][idx] = v


def _gather_inputs(arrays: dict, idx, spectral_prefix: str) -> CanopyInputs:
    """Build a CanopyInputs pytree for the columns in `idx`."""
    a = arrays

    def g(key):
        val = a.get(key)
        return None if val is None else val[idx]

    common = dict(
        dz=a["dz"][idx],
        cos_sza=a["cos_sza"][idx],
        veg_fraction=a["veg_fraction"][idx],
        veg_scale=a["veg_scale"][idx],
        veg_ext=a["veg_ext"][idx],
        veg_fsd=a["veg_fsd"][idx],
        veg_contact_fraction=a["veg_contact_fraction"][idx],
        building_fraction=a["building_fraction"][idx],
        building_scale=a["building_scale"][idx],
    )
    if spectral_prefix == "sw":
        return CanopyInputs(
            air_ext=g("sw_air_ext"),
            air_ssa=g("sw_air_ssa"),
            veg_ssa=g("sw_veg_ssa"),
            ground_albedo=g("ground_albedo"),
            ground_albedo_dir=g("ground_albedo_dir"),
            roof_albedo=g("roof_albedo"),
            roof_albedo_dir=g("roof_albedo_dir"),
            wall_albedo=g("wall_albedo"),
            wall_specular_frac=g("wall_specular_frac"),
            **common,
        )
    return CanopyInputs(
        air_ext=g("lw_air_ext"),
        air_ssa=g("lw_air_ssa"),
        veg_ssa=g("lw_veg_ssa"),
        ground_emissivity=g("ground_emissivity"),
        ground_emission=g("ground_emission"),
        roof_emissivity=g("roof_emissivity"),
        roof_emission=g("roof_emission"),
        wall_emissivity=g("wall_emissivity"),
        wall_emission=g("wall_emission"),
        clear_air_planck=g("clear_air_planck"),
        veg_planck=g("veg_planck"),
        veg_air_planck=g("veg_air_planck"),
        **common,
    )


def _solver_groups(config: Config):
    """(tile codes) -> (SolverOptions kwargs, lg_sw, lg_lw) for the layered
    SPARTACUS tile types."""
    return {
        TILE_FOREST: (
            dict(
                nreg=config.n_vegetation_region_forest + 1,
                nstream=None,  # filled per band
                do_urban=False,
                use_symmetric_vegetation_scale=(
                    config.use_symmetric_vegetation_scale_forest
                ),
                vegetation_isolation_factor=(
                    config.vegetation_isolation_factor_forest
                ),
                min_vegetation_fraction=config.min_vegetation_fraction,
                min_building_fraction=config.min_building_fraction,
                n_double=config.n_double,
                column_chunk=config.column_chunk,
            ),
            config.lg_sw_forest,
            config.lg_lw_forest,
        ),
        TILE_URBAN: (
            dict(
                nreg=1,
                nstream=None,
                do_urban=True,
                use_symmetric_vegetation_scale=(
                    config.use_symmetric_vegetation_scale_urban
                ),
                vegetation_isolation_factor=(
                    config.vegetation_isolation_factor_urban
                ),
                min_vegetation_fraction=config.min_vegetation_fraction,
                min_building_fraction=config.min_building_fraction,
                n_double=config.n_double,
                column_chunk=config.column_chunk,
            ),
            config.lg_sw_urban,
            config.lg_lw_urban,
        ),
        TILE_VEGETATED_URBAN: (
            dict(
                nreg=config.n_vegetation_region_urban + 1,
                nstream=None,
                do_urban=True,
                use_symmetric_vegetation_scale=(
                    config.use_symmetric_vegetation_scale_urban
                ),
                vegetation_isolation_factor=(
                    config.vegetation_isolation_factor_urban
                ),
                min_vegetation_fraction=config.min_vegetation_fraction,
                min_building_fraction=config.min_building_fraction,
                n_double=config.n_double,
                column_chunk=config.column_chunk,
            ),
            config.lg_sw_urban,
            config.lg_lw_urban,
        ),
    }


def run_radsurf(config: Config, arrays: dict):
    """Run the surface radiation scheme on dense padded input arrays.

    Args:
      config: consolidated Config.
      arrays: dict of dense padded numpy arrays; see _gather_inputs for the
        expected keys, plus "i_representation" [C] and "nlay" [C].

    Returns dict with "sw_norm_dir", "sw_norm_diff", "lw_internal",
    "lw_norm" flux containers and "bc_out".
    Parity: radsurf() radsurf/radsurf_interface.F90:20-317.
    """
    rep = np.asarray(arrays["i_representation"])
    ncol = rep.shape[0]
    nlay = arrays["dz"].shape[1]
    with_profiles = config.do_save_flux_profile

    out = {}
    if config.do_sw:
        nsw = config.nswinternal
        out["sw_norm_dir"] = empty_flux(ncol, nlay, nsw)
        out["sw_norm_diff"] = empty_flux(ncol, nlay, nsw)
    if config.do_lw:
        nlw = config.nlwinternal
        out["lw_internal"] = empty_flux(ncol, nlay, nlw)
        out["lw_norm"] = empty_flux(ncol, nlay, nlw)
    bc = {}
    if config.do_sw:
        bc["sw_albedo"] = np.zeros((ncol, config.nswinternal))
        bc["sw_albedo_dir"] = np.zeros((ncol, config.nswinternal))
    if config.do_lw:
        bc["lw_emissivity"] = np.zeros((ncol, config.nlwinternal))
        bc["lw_emission"] = np.zeros((ncol, config.nlwinternal))
    out["bc_out"] = bc

    # ---- flat tiles (radsurf_interface.F90:122-173)
    idx = np.nonzero(rep == TILE_FLAT)[0]
    if idx.size:
        if config.do_sw:
            galb = arrays["ground_albedo"][idx]
            galb_dir = (
                arrays["ground_albedo_dir"][idx]
                if config.use_sw_direct_albedo
                else galb
            )
            nd, nf, fbc = flat_mod.flat_sw(galb, galb_dir)
            _scatter(out["sw_norm_dir"], nd, idx)
            _scatter(out["sw_norm_diff"], nf, idx)
            bc["sw_albedo"][idx] = np.asarray(fbc["sw_albedo"])
            bc["sw_albedo_dir"][idx] = np.asarray(fbc["sw_albedo_dir"])
        if config.do_lw:
            li, ln, fbc = flat_mod.flat_lw(
                arrays["ground_emissivity"][idx],
                arrays["ground_emission"][idx],
            )
            _scatter(out["lw_internal"], li, idx)
            _scatter(out["lw_norm"], ln, idx)
            bc["lw_emissivity"][idx] = np.asarray(fbc["lw_emissivity"])
            bc["lw_emission"][idx] = np.asarray(fbc["lw_emission"])

    # ---- layered SPARTACUS tiles
    for code, (opt_kw, lg_sw, lg_lw) in _solver_groups(config).items():
        idx = np.nonzero(rep == code)[0]
        if not idx.size:
            continue
        if config.do_sw:
            inp = _gather_inputs(arrays, idx, "sw")
            if not config.use_sw_direct_albedo:
                inp.ground_albedo_dir = inp.ground_albedo
            opt = SolverOptions(**{**opt_kw, "nstream": lg_sw.nstream})
            from ..utils.debug import debug_arrays_enabled

            if debug_arrays_enabled():
                from .solver import debug_dump_sw

                debug_dump_sw(inp, opt, lg_sw)
            ndir, ndiff, sbc = spartacus_sw(
                inp, opt, lg_sw, with_profiles=with_profiles
            )
            sun_up = np.asarray(arrays["cos_sza"][idx]) > 0.0
            _scatter(out["sw_norm_dir"], ndir, idx, sun_up)
            _scatter(out["sw_norm_diff"], ndiff, idx, sun_up)
            bc["sw_albedo"][idx] = np.asarray(sbc["top_albedo_diff"])
            bc["sw_albedo_dir"][idx] = np.asarray(sbc["top_albedo_dir"])
        if config.do_lw:
            inp = _gather_inputs(arrays, idx, "lw")
            opt = SolverOptions(**{**opt_kw, "nstream": lg_lw.nstream})
            lint, lnorm, lbc = spartacus_lw(
                inp, opt, lg_lw, with_profiles=with_profiles
            )
            _scatter(out["lw_internal"], lint, idx)
            _scatter(out["lw_norm"], lnorm, idx)
            bc["lw_emissivity"][idx] = np.asarray(lbc["top_emissivity"])
            bc["lw_emission"][idx] = np.asarray(lbc["top_emission"])

    # ---- simple urban / infinite street (radsurf_interface.F90:272-309)
    idx = np.nonzero((rep == TILE_SIMPLE_URBAN) | (rep == TILE_INFINITE_STREET))[0]
    if idx.size:
        if np.any(arrays["nlay"][idx] != 1):
            raise ValueError(
                "simple urban representations must have only one layer"
            )
        is_inf = rep[idx] == TILE_INFINITE_STREET
        dz = arrays["dz"][idx, 0]
        bf = arrays["building_fraction"][idx, 0]
        bs = arrays["building_scale"][idx, 0]
        if config.do_sw:
            galb = arrays["ground_albedo"][idx]
            galb_dir = (
                arrays["ground_albedo_dir"][idx]
                if config.use_sw_direct_albedo
                else galb
            )
            ndir, ndiff, sbc = su_mod.simple_urban_sw(
                dz, bf, bs, arrays["cos_sza"][idx], is_inf,
                galb, galb_dir,
                arrays["roof_albedo"][idx, 0],
                arrays["wall_albedo"][idx, 0],
                min_building_fraction=config.min_building_fraction,
                with_profiles=with_profiles,
            )
            sun_up = np.asarray(arrays["cos_sza"][idx]) > 0.0
            _scatter_single_layer(out["sw_norm_dir"], ndir, idx, sun_up)
            _scatter_single_layer(out["sw_norm_diff"], ndiff, idx, sun_up)
            bc["sw_albedo"][idx] = np.asarray(sbc["sw_albedo"])
            bc["sw_albedo_dir"][idx] = np.asarray(sbc["sw_albedo_dir"])
        if config.do_lw:
            lint, lnorm, lbc = su_mod.simple_urban_lw(
                dz, bf, bs, is_inf,
                arrays["ground_emissivity"][idx],
                arrays["ground_emission"][idx],
                arrays["roof_emissivity"][idx, 0],
                arrays["roof_emission"][idx, 0],
                arrays["wall_emissivity"][idx, 0],
                arrays["wall_emission"][idx, 0],
                min_building_fraction=config.min_building_fraction,
                with_profiles=with_profiles,
            )
            _scatter_single_layer(out["lw_internal"], lint, idx)
            _scatter_single_layer(out["lw_norm"], lnorm, idx)
            bc["lw_emissivity"][idx] = np.asarray(lbc["lw_emissivity"])
            bc["lw_emission"][idx] = np.asarray(lbc["lw_emission"])

    return out


def _scatter_single_layer(dst, src, idx, sun_up=None):
    """Scatter simple-urban outputs: per-layer fields go to layer 0."""
    for key, val in src.items():
        if key not in dst:
            continue
        v = np.asarray(val)
        if sun_up is not None:
            mask = sun_up.reshape((-1,) + (1,) * (v.ndim - 1))
            v = np.where(mask, v, 0.0)
        if key in _LAY_FIELDS:
            dst[key][idx, 0] = v
        elif key in _SCAL_LAY_FIELDS:
            dst[key][idx, 0] = v
        else:
            dst[key][idx] = v
