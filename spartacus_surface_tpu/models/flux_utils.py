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


def representation_masks(i_representation) -> dict:
    """Host-side tile masks for the budget reductions (bool [C])."""
    rep = np.asarray(i_representation)
    return {
        "canopy": rep != TILE_FLAT,
        "urban": np.isin(
            rep, [TILE_URBAN, TILE_VEGETATED_URBAN, TILE_SIMPLE_URBAN,
                  TILE_INFINITE_STREET]
        ),
        "veg": np.isin(rep, [TILE_FOREST, TILE_VEGETATED_URBAN]),
    }


def budget_with_masks(flux: dict, masks: dict) -> dict:
    """Budget components from precomputed tile masks; pure array ops, so
    it traces under jit (masks may be traced bool arrays)."""
    return {
        "ground": flux["ground_net"].sum(-1),
        "top": flux["top_net"].sum(-1),
        "air": flux["clear_air_abs"].sum((-1, -2)) * masks["canopy"],
        "wall": flux["wall_net"].sum((-1, -2)) * masks["urban"],
        "roof": flux["roof_net"].sum((-1, -2)) * masks["urban"],
        "veg": flux["veg_abs"].sum((-1, -2)) * masks["veg"],
        "veg_air": flux["veg_air_abs"].sum((-1, -2)) * masks["veg"],
    }


def budget_components(flux: dict, i_representation) -> dict:
    """Per-column energy-budget components, computed WITH THE FLUX
    ARRAYS' OWN backend (jnp on device arrays — a sharded reduction when
    they live on a column mesh, and only [C] vectors need fetching; numpy
    on host arrays).  Keys: ground/air/wall/roof/veg/veg_air/top.
    Parity: radsurf_canopy_flux.F90:465-500."""
    return budget_with_masks(flux, representation_masks(i_representation))


def print_budget(comp: dict, printer=print, max_table_columns: int = 1000):
    """Print the reference-format budget table from host-side
    budget_components; returns the residual array [C].  Beyond
    max_table_columns the per-column table is replaced by a summary
    (worst residual + its column) — production-scale runs have 10^5..10^6
    columns and the reference's always-full table
    (radsurf_canopy_flux.F90:502-540) would dominate the run."""
    comp = {k: np.asarray(v) for k, v in comp.items()}
    residual = (comp["ground"] + comp["air"] + comp["wall"] + comp["roof"]
                + comp["veg"] + comp["veg_air"] - comp["top"])
    ncol = len(residual)
    if ncol > max_table_columns:
        jworst = int(np.argmax(np.abs(residual)))
        printer(
            f"Energy budget over {ncol} columns: max |residual| ="
            f" {abs(residual[jworst]):.3e} (column {jworst + 1}),"
            f" mean |residual| = {np.abs(residual).mean():.3e}"
        )
        return residual
    printer(
        "Column  Ground      Air     Wall     Roof      Veg  Air-veg"
        "      Top   Residual"
    )
    for jcol in range(ncol):
        printer(
            f"{jcol + 1:5d}"
            + "".join(
                f"{comp[k][jcol]:9.3f}"
                for k in ("ground", "air", "wall", "roof", "veg",
                          "veg_air", "top")
            )
            + f"{residual[jcol]:11.3e}"
        )
    return residual


def check_flux(flux: dict, arrays: dict, name: str, printer=print,
               max_table_columns: int = 1000):
    """Per-column energy budget (radsurf_canopy_flux.F90:465-542).

    Returns the residual array [C]; prints the reference-format table
    (or a summary beyond max_table_columns, see print_budget).
    """
    comp = budget_components(flux, arrays["i_representation"])
    return print_budget(comp, printer, max_table_columns)
