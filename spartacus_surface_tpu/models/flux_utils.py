"""Canopy-flux container operations: scale, sum, conservation check.

Parity: canopy_flux_type methods scale/sum/check,
radsurf/radsurf_canopy_flux.F90:212-282, 399-460 and 465-542.
"""

from __future__ import annotations

import numpy as np

from .dispatch import (
    _COL_FIELDS,
    _LAY_FIELDS,
    _SCAL_COL_FIELDS,
    _SCAL_LAY_FIELDS,
    TILE_FLAT,
    TILE_FOREST,
    TILE_INFINITE_STREET,
    TILE_SIMPLE_URBAN,
    TILE_URBAN,
    TILE_VEGETATED_URBAN,
)


def scale_flux(flux: dict, factor: np.ndarray) -> dict:
    """Multiply normalized fluxes by the top-of-canopy flux [C, S].

    Sunlit fractions are not scaled (radsurf_canopy_flux.F90:208-211).
    """
    out = {}
    for key, val in flux.items():
        if key in _SCAL_COL_FIELDS or key in _SCAL_LAY_FIELDS:
            out[key] = val
        elif key in _COL_FIELDS:
            out[key] = val * factor
        elif key in _LAY_FIELDS:
            out[key] = val * factor[:, None, :]
        else:
            out[key] = val
    return out


def sum_flux(flux1: dict, flux2: dict) -> dict:
    """flux1 + flux2 elementwise; sunlit fractions add too (one term is
    zero; radsurf_canopy_flux.F90:423-447)."""
    return {key: flux1[key] + flux2[key] for key in flux1}


def check_flux(flux: dict, arrays: dict, name: str, printer=print):
    """Per-column energy budget (radsurf_canopy_flux.F90:465-542).

    Returns the residual array [C]; prints the reference-format table.
    """
    rep = np.asarray(arrays["i_representation"])
    is_canopy = rep != TILE_FLAT
    is_urban = np.isin(
        rep, [TILE_URBAN, TILE_VEGETATED_URBAN, TILE_SIMPLE_URBAN,
              TILE_INFINITE_STREET]
    )
    is_veg = np.isin(rep, [TILE_FOREST, TILE_VEGETATED_URBAN])

    # The spectral/layer reductions run on device (a sharded reduction when
    # the flux arrays live on a column mesh); only the [C] budget vectors
    # are gathered to host for printing.
    ground = np.asarray(flux["ground_net"].sum(-1))
    top = np.asarray(flux["top_net"].sum(-1))
    air = np.where(is_canopy, np.asarray(flux["clear_air_abs"].sum((-1, -2))),
                   0.0)
    wall = np.where(is_urban, np.asarray(flux["wall_net"].sum((-1, -2))), 0.0)
    roof = np.where(is_urban, np.asarray(flux["roof_net"].sum((-1, -2))), 0.0)
    veg = np.where(is_veg, np.asarray(flux["veg_abs"].sum((-1, -2))), 0.0)
    veg_air = np.where(is_veg, np.asarray(flux["veg_air_abs"].sum((-1, -2))),
                       0.0)
    residual = ground + air + wall + roof + veg + veg_air - top

    printer(
        "Column  Ground      Air     Wall     Roof      Veg  Air-veg"
        "      Top   Residual"
    )
    for jcol in range(len(ground)):
        printer(
            f"{jcol + 1:5d}"
            + "".join(
                f"{v:9.3f}"
                for v in (ground[jcol], air[jcol], wall[jcol], roof[jcol],
                          veg[jcol], veg_air[jcol], top[jcol])
            )
            + f"{residual[jcol]:11.3e}"
        )
    return residual
