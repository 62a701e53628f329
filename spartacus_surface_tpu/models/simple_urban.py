"""Single-layer "simple urban" solvers (Harman et al. 2004 2x2 method).

Parity: radsurf/radsurf_simple_urban_sw.F90:28-294 and
radsurf_simple_urban_lw.F90:28-257, with the infinite-street and
exponential urban-geometry variants selected per column by a boolean mask
(is_infinite_street), so both tile types batch together.

All columns in the group must have exactly one (real) layer; the dispatcher
enforces this like radsurf_interface.F90:281-284.

Note on reference quirks (kept faithfully; see PARITY_NOTES.md):
  * The LW interaction matrix element (2,2) uses the GROUND emissivity where
    wall emissivity is physically expected
    (radsurf_simple_urban_lw.F90:157).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.constants import Pi
from .geometry import norm_perim_urban
from .view_factor import view_factors_exp, view_factors_inf


def _wall_norm_perim(building_fraction, building_scale, min_building_fraction):
    """Wall normalized perimeter for a single unvegetated layer
    (radsurf_simple_urban_sw.F90:129-134)."""
    _, npw = norm_perim_urban(
        building_fraction,
        building_scale,
        jnp.zeros_like(building_fraction),
        jnp.ones_like(building_fraction),
        jnp.zeros_like(building_fraction),
        nreg=1,
        use_symmetric_vegetation_scale=True,
        vegetation_isolation_factor=0.0,
        min_vegetation_fraction=1.0e-6,
        min_building_fraction=min_building_fraction,
    )
    return npw[..., 0]


def _view_factors(dz, building_fraction, building_scale, is_infinite_street,
                  min_building_fraction, cos_sza=None):
    npw = _wall_norm_perim(building_fraction, building_scale,
                           min_building_fraction)
    npw_safe = jnp.maximum(npw, 1.0e-12)
    street_width = 2.0 * (1.0 - building_fraction) / npw_safe
    sep_scale = Pi * (1.0 - building_fraction) / npw_safe
    if cos_sza is None:
        vgs_i, vww_i = view_factors_inf(dz / street_width)
        vgs_e, vww_e = view_factors_exp(dz / sep_scale)
        vdg_i = vdg_e = None
    else:
        vgs_i, vww_i, vdg_i = view_factors_inf(dz / street_width, cos_sza)
        vgs_e, vww_e, vdg_e = view_factors_exp(dz / sep_scale, cos_sza)
    vgs = jnp.where(is_infinite_street, vgs_i, vgs_e)
    vww = jnp.where(is_infinite_street, vww_i, vww_e)
    out = dict(
        view_ground_sky=vgs,
        view_wall_wall=vww,
        view_wall_ground=0.5 * (1.0 - vww),
        view_ground_wall=1.0 - vgs,
        norm_perim_wall=npw,
    )
    if cos_sza is not None:
        out["view_dir_ground"] = jnp.where(is_infinite_street, vdg_i, vdg_e)
        out["view_dir_wall"] = 1.0 - out["view_dir_ground"]
    return out


def _solve2x2(m11, m12, m21, m22, b1, b2):
    det = m11 * m22 - m12 * m21
    return (m22 * b1 - m12 * b2) / det, (m11 * b2 - m21 * b1) / det


def simple_urban_sw(
    dz, building_fraction, building_scale, cos_sza, is_infinite_street,
    ground_albedo_diff, ground_albedo_dir, roof_albedo, wall_albedo,
    *, min_building_fraction=1.0e-6, with_profiles=False,
):
    """SW 2x2 solve.  Scalars [C]; spectral fields [C, S].

    Returns (norm_dir, norm_diff, bc).
    Parity: radsurf_simple_urban_sw.F90:28-294.
    """
    vf = _view_factors(dz, building_fraction, building_scale,
                       is_infinite_street, min_building_fraction, cos_sza)
    b = building_fraction[:, None]
    vdg = vf["view_dir_ground"][:, None]
    vdw = vf["view_dir_wall"][:, None]
    vgs = vf["view_ground_sky"][:, None]
    vww = vf["view_wall_wall"][:, None]
    vwg = vf["view_wall_ground"][:, None]
    vgw = vf["view_ground_wall"][:, None]

    # Interaction matrix (radsurf_simple_urban_sw.F90:166-169)
    m11 = jnp.ones_like(wall_albedo)
    m12 = -vwg * wall_albedo
    m21 = -vgw * ground_albedo_diff
    m22 = 1.0 - vww * wall_albedo

    # --- direct normalization (radsurf_simple_urban_sw.F90:181-237)
    src2 = (vdw + ground_albedo_dir * vdg * vgw) * (1.0 - b)
    sol1, sol2 = _solve2x2(m11, m12, m21, m22, jnp.zeros_like(src2), src2)
    norm_dir = {}
    norm_dir["ground_dn_dir"] = vdg * (1.0 - b) * jnp.ones_like(src2)
    norm_dir["ground_dn"] = norm_dir["ground_dn_dir"] + sol1
    norm_dir["ground_net"] = (
        norm_dir["ground_dn_dir"] * (1.0 - ground_albedo_dir)
        + sol1 * (1.0 - ground_albedo_diff)
    )
    norm_dir["ground_vertical_diff"] = jnp.zeros_like(src2)
    norm_dir["ground_sunlit_frac"] = vf["view_dir_ground"]
    norm_dir["roof_in_dir"] = b * jnp.ones_like(src2)
    norm_dir["roof_in"] = b * jnp.ones_like(src2)
    norm_dir["roof_net"] = b * (1.0 - roof_albedo)
    norm_dir["roof_sunlit_frac"] = jnp.ones_like(building_fraction)
    norm_dir["wall_in_dir"] = vdw * (1.0 - b) * jnp.ones_like(src2)
    norm_dir["wall_in"] = sol2
    norm_dir["wall_net"] = sol2 * (1.0 - wall_albedo)
    tan_sza = jnp.sqrt(1.0 / (cos_sza * cos_sza) - 1.0)
    norm_dir["wall_sunlit_frac"] = (
        0.5 * vf["view_dir_wall"]
        / (
            jnp.maximum(tan_sza, 1.0e-6)
            * vf["norm_perim_wall"] * dz / (Pi * (1.0 - building_fraction))
        )
    )
    one = jnp.ones_like(src2)
    norm_dir["top_dn_dir"] = one
    norm_dir["top_dn"] = one
    norm_dir["top_net"] = (
        1.0 - b * roof_albedo
        - (norm_dir["ground_dn"] - norm_dir["ground_net"]) * vgs
        - (norm_dir["wall_in"] - norm_dir["wall_net"]) * vwg
    )
    if with_profiles:
        norm_dir["flux_dn_dir_layer_top"] = (1.0 - b) * one
        norm_dir["flux_dn_layer_top"] = (1.0 - b) * one
        norm_dir["flux_up_layer_top"] = (
            (norm_dir["ground_dn"] - norm_dir["ground_net"]) * vgs
            + (norm_dir["wall_in"] - norm_dir["wall_net"]) * vwg
        )
        norm_dir["flux_dn_dir_layer_base"] = norm_dir["ground_dn_dir"]
        norm_dir["flux_dn_layer_base"] = norm_dir["ground_dn"]
        norm_dir["flux_up_layer_base"] = (
            norm_dir["ground_dn"] - norm_dir["ground_net"]
        )

    # --- diffuse normalization (radsurf_simple_urban_sw.F90:246-288)
    b1 = vgs * (1.0 - b) * one
    b2 = vgw * (1.0 - b) * one
    sol1, sol2 = _solve2x2(m11, m12, m21, m22, b1, b2)
    norm_diff = {}
    norm_diff["ground_dn_dir"] = jnp.zeros_like(src2)
    norm_diff["ground_dn"] = sol1
    norm_diff["ground_net"] = sol1 * (1.0 - ground_albedo_diff)
    norm_diff["ground_vertical_diff"] = jnp.zeros_like(src2)
    norm_diff["roof_in"] = b * one
    norm_diff["roof_net"] = b * (1.0 - roof_albedo)
    norm_diff["wall_in"] = sol2
    norm_diff["wall_net"] = sol2 * (1.0 - wall_albedo)
    norm_diff["top_dn_dir"] = jnp.zeros_like(src2)
    norm_diff["top_dn"] = one
    norm_diff["top_net"] = (
        1.0 - b * roof_albedo
        - (norm_diff["ground_dn"] - norm_diff["ground_net"]) * vgs
        - (norm_diff["wall_in"] - norm_diff["wall_net"]) * vwg
    )
    if with_profiles:
        norm_diff["flux_dn_layer_top"] = (1.0 - b) * one
        norm_diff["flux_up_layer_top"] = (
            (norm_diff["ground_dn"] - norm_diff["ground_net"]) * vgs
            + (norm_diff["wall_in"] - norm_diff["wall_net"]) * vwg
        )
        norm_diff["flux_dn_layer_base"] = norm_diff["ground_dn"]
        norm_diff["flux_up_layer_base"] = (
            norm_diff["ground_dn"] - norm_diff["ground_net"]
        )

    bc = {
        "sw_albedo": 1.0 - norm_diff["top_net"],
        "sw_albedo_dir": 1.0 - norm_dir["top_net"],
    }
    return norm_dir, norm_diff, bc


def simple_urban_lw(
    dz, building_fraction, building_scale, is_infinite_street,
    ground_emissivity, ground_emission, roof_emissivity, roof_emission,
    wall_emissivity, wall_emission,
    *, min_building_fraction=1.0e-6, with_profiles=False,
):
    """LW 2x2 solve.  Returns (internal, norm, bc).
    Parity: radsurf_simple_urban_lw.F90:28-257."""
    vf = _view_factors(dz, building_fraction, building_scale,
                       is_infinite_street, min_building_fraction)
    b = building_fraction[:, None]
    vgs = vf["view_ground_sky"][:, None]
    vww = vf["view_wall_wall"][:, None]
    vwg = vf["view_wall_ground"][:, None]
    vgw = vf["view_ground_wall"][:, None]
    npw_dz = (vf["norm_perim_wall"] * dz)[:, None]

    # Interaction matrix (radsurf_simple_urban_lw.F90:154-157; note the
    # reference's (2,2) uses ground emissivity - replicated)
    m11 = jnp.ones_like(wall_emissivity)
    m12 = -vwg * (1.0 - wall_emissivity)
    m21 = -vgw * (1.0 - ground_emissivity)
    m22 = 1.0 - vww * (1.0 - ground_emissivity)

    # --- internal emission (radsurf_simple_urban_lw.F90:159-204)
    b1 = vwg * wall_emission * npw_dz
    b2 = vgw * ground_emission * (1.0 - b) + vww * wall_emission * npw_dz
    sol1, sol2 = _solve2x2(m11, m12, m21, m22, b1, b2)
    internal = {}
    internal["ground_dn"] = sol1
    internal["ground_net"] = (
        sol1 * ground_emissivity - ground_emission * (1.0 - b)
    )
    internal["ground_vertical_diff"] = jnp.zeros_like(sol1)
    internal["roof_in"] = jnp.zeros_like(sol1)
    internal["roof_net"] = -b * roof_emission
    internal["wall_in"] = sol2
    internal["wall_net"] = sol2 * wall_emissivity - wall_emission * npw_dz
    internal["top_dn"] = jnp.zeros_like(sol1)
    internal["top_net"] = (
        -b * roof_emission
        - (internal["ground_dn"] - internal["ground_net"]) * vgs
        - (internal["wall_in"] - internal["wall_net"]) * vwg
    )
    if with_profiles:
        internal["flux_dn_layer_top"] = jnp.zeros_like(sol1)
        internal["flux_up_layer_top"] = (
            (internal["ground_dn"] - internal["ground_net"]) * vgs
            + (internal["wall_in"] - internal["wall_net"]) * vwg
        )
        internal["flux_dn_layer_base"] = internal["ground_dn"]
        internal["flux_up_layer_base"] = (
            internal["ground_dn"] - internal["ground_net"]
        )

    # --- normalized by TOC downwelling (radsurf_simple_urban_lw.F90:206-251)
    one = jnp.ones_like(sol1)
    b1 = vgs * (1.0 - b) * one
    b2 = vgw * (1.0 - b) * one
    sol1, sol2 = _solve2x2(m11, m12, m21, m22, b1, b2)
    norm = {}
    norm["ground_dn"] = sol1
    norm["ground_net"] = sol1 * ground_emissivity
    norm["ground_vertical_diff"] = jnp.zeros_like(sol1)
    norm["roof_in"] = b * one
    norm["roof_net"] = b * roof_emissivity
    norm["wall_in"] = sol2
    norm["wall_net"] = sol2 * wall_emissivity
    norm["top_dn"] = one
    norm["top_net"] = (
        1.0 - b * (1.0 - roof_emissivity)
        - (norm["ground_dn"] - norm["ground_net"]) * vgs
        - (norm["wall_in"] - norm["wall_net"]) * vwg
    )
    if with_profiles:
        norm["flux_dn_layer_top"] = (1.0 - b) * one
        norm["flux_up_layer_top"] = (
            (norm["ground_dn"] - norm["ground_net"]) * vgs
            + (norm["wall_in"] - norm["wall_net"]) * vwg
        )
        norm["flux_dn_layer_base"] = norm["ground_dn"]
        norm["flux_up_layer_base"] = norm["ground_dn"] - norm["ground_net"]

    bc = {
        "lw_emissivity": norm["top_net"],
        "lw_emission": -internal["top_net"],
    }
    return internal, norm, bc
