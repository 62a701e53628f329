"""Canopy geometry: region fractions, overlap matrices, normalized
perimeters, exchange/wall rates.  Per-column, plain NumPy float64.

Transcribed from radsurf_overlap.F90 and radsurf_norm_perim.F90, preserving
the reference's branch structure (including the nreg=3 overhang quirk at
radsurf_overlap.F90:271).
"""

from __future__ import annotations

import numpy as np


def overlap_matrix_max_ran(nreg, f_upper, f_lower):
    """Max-random overlap matrix (radsurf_overlap.F90:28-73), forest."""
    o = np.zeros((nreg, nreg))
    pair = max(f_upper, f_lower)
    o[0, 0] = 1.0 - pair
    if nreg == 2:
        o[0, 1] = pair - f_upper
        o[1, 0] = pair - f_lower
        o[1, 1] = f_upper + f_lower - pair
    else:
        o[0, 1] = 0.5 * (pair - f_upper)
        o[0, 2] = o[0, 1]
        o[1, 0] = 0.5 * (pair - f_lower)
        o[2, 0] = o[1, 0]
        o[1, 1] = 0.5 * (f_upper + f_lower - pair)
        o[2, 2] = o[1, 1]
    return o


def overlap_matrices_forest(frac, threshold):
    """Directional overlap matrices u/v per interface
    (radsurf_overlap.F90:85-171).  frac: [nreg, nlay] region fractions.
    Returns u[nlay+1, nreg, nreg], v[nlay+1, nreg, nreg]."""
    nreg, nlay = frac.shape
    u = np.zeros((nlay + 1, nreg, nreg))
    v = np.zeros((nlay + 1, nreg, nreg))
    frac_lower = np.zeros(nreg)
    frac_lower[0] = 1.0
    for ilev in range(nlay + 1):
        if ilev >= nlay:
            frac_upper = np.zeros(nreg)
            frac_upper[0] = 1.0
        else:
            frac_upper = frac[:, ilev].copy()
        o = overlap_matrix_max_ran(nreg, 1.0 - frac_upper[0],
                                   1.0 - frac_lower[0])
        for ju in range(nreg):
            for jl in range(nreg):
                u[ilev, ju, jl] = (
                    o[ju, jl] / frac_lower[jl]
                    if frac_lower[jl] >= threshold else 0.0
                )
                v[ilev, jl, ju] = (
                    o[ju, jl] / frac_upper[ju]
                    if frac_upper[ju] >= threshold else 0.0
                )
        frac_lower = frac_upper
    return u, v


def overlap_matrix_max_ran_urban(nreg, frac_upper, frac_lower):
    """Urban overlap with an exposed-roof extra region in the lower layer
    (radsurf_overlap.F90:178-280).  frac_upper: [nreg],
    frac_lower: [nreg+1].  Returns [nreg, nreg+1]."""
    o = np.zeros((nreg, nreg + 1))
    if nreg == 1:
        o[0, 0:2] = frac_lower[0:2]
    elif nreg == 2:
        pair = max(frac_upper[1], frac_lower[1])
        if pair <= frac_lower[0] + frac_lower[1]:
            o[1, 2] = 0.0
            o[0, 2] = frac_lower[2]
            o[0, 0] = frac_lower[0] + frac_lower[1] - pair
            o[0, 1] = pair - frac_upper[1]
            o[1, 0] = pair - frac_lower[1]
            o[1, 1] = frac_upper[1] + frac_lower[1] - pair
        else:
            # Trees overhang buildings
            o[0, 0:2] = 0.0
            o[1, 0:2] = frac_lower[0:2]
            o[1, 2] = frac_upper[1] - frac_lower[0] - frac_lower[1]
            o[0, 2] = frac_upper[0]
    else:
        o[1, 2] = 0.0
        o[2, 1] = 0.0
        pair = max(frac_upper[1] + frac_upper[2],
                   frac_lower[1] + frac_lower[2])
        if pair <= frac_lower[0] + frac_lower[1] + frac_lower[2]:
            o[1:3, 3] = 0.0
            o[0, 3] = frac_lower[3]
            o[0, 0] = frac_lower[0] + frac_lower[1] + frac_lower[2] - pair
            if pair > frac_upper[1] + frac_upper[2]:
                o[1:3, 0] = 0.0
                o[1, 1] = frac_upper[1]
                o[2, 2] = frac_upper[2]
                o[0, 1] = frac_lower[1] - frac_upper[1]
                o[0, 2] = frac_lower[2] - frac_upper[2]
            else:
                o[0, 1:3] = 0.0
                o[1, 1] = frac_lower[1]
                o[2, 2] = frac_lower[2]
                o[1, 0] = frac_upper[1] - frac_lower[1]
                o[2, 0] = frac_upper[2] - frac_lower[2]
        else:
            # Overhang branch; note o[2, 0] copies o[0, 1] (= 0), the
            # reference's own quirk (radsurf_overlap.F90:271)
            o[0, 0:3] = 0.0
            o[1, 1] = frac_lower[1]
            o[2, 2] = frac_lower[2]
            o[1, 0] = frac_lower[0] * 0.5
            o[2, 0] = o[0, 1]
            o[1, 3] = (frac_lower[3] - frac_upper[0]) * 0.5
            o[2, 3] = o[1, 3]
            o[0, 3] = frac_upper[0]
    return o


def overlap_matrices_urban(frac, threshold):
    """Urban directional overlap matrices (radsurf_overlap.F90:289-394).
    frac: [nreg, nlay].  Returns u[nlay+1, nreg, nreg+1],
    v[nlay+1, nreg+1, nreg]."""
    nreg, nlay = frac.shape
    u = np.zeros((nlay + 1, nreg, nreg + 1))
    v = np.zeros((nlay + 1, nreg + 1, nreg))
    frac_lower = np.zeros(nreg + 1)
    frac_lower[nreg] = frac[:, 0].sum()
    for ilev in range(nlay + 1):
        if ilev >= nlay:
            frac_upper = np.zeros(nreg)
            frac_upper[0] = 1.0
        else:
            frac_upper = frac[:, ilev].copy()
        o = overlap_matrix_max_ran_urban(nreg, frac_upper, frac_lower)
        for ju in range(nreg):
            for jl in range(nreg + 1):
                u[ilev, ju, jl] = (
                    o[ju, jl] / frac_lower[jl]
                    if frac_lower[jl] >= threshold else 0.0
                )
                v[ilev, jl, ju] = (
                    o[ju, jl] / frac_upper[ju]
                    if frac_upper[ju] >= threshold else 0.0
                )
        frac_lower[:nreg] = frac_upper
        if ilev < nlay - 1:
            frac_lower[nreg] = frac[:, ilev + 1].sum() - frac[:, ilev].sum()
            if frac_lower[nreg] < 0.0:
                # Overhanging building (radsurf_overlap.F90:376-385)
                frac_lower[:nreg] *= (
                    frac[:, ilev + 1].sum() / frac[:, ilev].sum()
                )
                frac_lower[nreg] = 0.0
        elif ilev == nlay - 1:
            frac_lower[nreg] = 1.0 - frac[:, ilev].sum()
    return u, v


def norm_perim_forest(nlay, nreg, veg_fraction, veg_scale, cfg):
    """Normalized perimeter lengths (radsurf_norm_perim.F90:30-116)."""
    norm_perim = np.zeros((nreg, nlay))
    iso = cfg["vegetation_isolation_factor"]
    for jl in range(nlay):
        if nreg > 1 and veg_fraction[jl] > cfg["min_vegetation_fraction"]:
            if cfg["use_symmetric_vegetation_scale"]:
                norm_perim[0, jl] = (
                    4.0 * veg_fraction[jl]
                    * max(0.0, 1.0 - veg_fraction[jl]) / veg_scale[jl]
                )
            else:
                norm_perim[0, jl] = 4.0 * veg_fraction[jl] / veg_scale[jl]
            if nreg > 2:
                norm_perim[nreg - 1, jl] = 0.5 * iso * norm_perim[0, jl]
                norm_perim[0, jl] = (1.0 - 0.5 * iso) * norm_perim[0, jl]
                if cfg["use_symmetric_vegetation_scale"]:
                    norm_perim[1, jl] = (
                        (1.0 - iso) * 4.0 * (0.5 * veg_fraction[jl])
                        * (1.0 - 0.5 * veg_fraction[jl]) / veg_scale[jl]
                    )
                else:
                    # Lollipop model (Hogan, Quaife & Braghiere 2018)
                    norm_perim[1, jl] = (
                        (1.0 - iso) * 4.0 * veg_fraction[jl]
                        / (np.sqrt(2.0) * veg_scale[jl])
                    )
    return norm_perim


def norm_perim_urban(nlay, nreg, building_fraction, building_scale,
                     veg_fraction, veg_scale, veg_contact_fraction, cfg):
    """Urban normalized perimeters (radsurf_norm_perim.F90:131-281).
    Returns (norm_perim [nreg, nlay], norm_perim_wall [nreg, nlay])."""
    norm_perim = np.zeros((nreg, nlay))
    norm_perim_wall = np.zeros((nreg, nlay))
    iso = cfg["vegetation_isolation_factor"]
    min_v = cfg["min_vegetation_fraction"]
    min_b = cfg["min_building_fraction"]
    for jl in range(nlay):
        if nreg > 1 and veg_fraction[jl] > min_v:
            if cfg["use_symmetric_vegetation_scale"]:
                norm_perim[0, jl] = (
                    4.0 * veg_fraction[jl]
                    * max(0.0, 1.0 - veg_fraction[jl] - building_fraction[jl])
                    / (max(min_b, 1.0 - building_fraction[jl])
                       * veg_scale[jl])
                )
            else:
                norm_perim[0, jl] = 4.0 * veg_fraction[jl] / veg_scale[jl]
            if nreg > 2:
                norm_perim[nreg - 1, jl] = 0.5 * iso * norm_perim[0, jl]
                norm_perim[0, jl] = (1.0 - 0.5 * iso) * norm_perim[0, jl]
                if cfg["use_symmetric_vegetation_scale"]:
                    norm_perim[1, jl] = (
                        (1.0 - iso) * 4.0 * (0.5 * veg_fraction[jl])
                        * (1.0 - 0.5 * veg_fraction[jl]
                           - building_fraction[jl])
                        / (max(min_b, 1.0 - building_fraction[jl])
                           * veg_scale[jl])
                    )
                else:
                    norm_perim[1, jl] = (
                        (1.0 - iso) * 4.0 * veg_fraction[jl]
                        / (np.sqrt(2.0) * veg_scale[jl])
                    )
        if building_fraction[jl] > min_b:
            norm_perim_wall[0, jl] = (
                4.0 * building_fraction[jl] / building_scale[jl]
            )
            if nreg > 1:
                if (1.0 - veg_fraction[jl] - building_fraction[jl]) <= min_v:
                    # No clear region: all walls touch vegetation
                    if nreg == 2:
                        norm_perim_wall[1, jl] = norm_perim_wall[0, jl]
                    else:
                        norm_perim_wall[1, jl] = (
                            norm_perim_wall[0, jl] * (1.0 - iso)
                        )
                        norm_perim_wall[2, jl] = norm_perim_wall[0, jl] * iso
                    norm_perim_wall[0, jl] = 0.0
                elif veg_fraction[jl] > min_v:
                    vcf = veg_contact_fraction[jl]
                    if vcf > 0.0:
                        if nreg == 2:
                            norm_perim_wall[1, jl] = (
                                norm_perim_wall[0, jl] * vcf
                            )
                        else:
                            norm_perim_wall[1, jl] = (
                                norm_perim_wall[0, jl] * vcf * (1.0 - iso)
                            )
                            norm_perim_wall[2, jl] = (
                                norm_perim_wall[0, jl] * vcf * iso
                            )
                        norm_perim_wall[0, jl] *= 1.0 - vcf
    return norm_perim, norm_perim_wall


def od_scaling_and_region_optics_sw(nreg, jl, air_ext, air_ssa, veg_ext,
                                    veg_ssa, veg_fsd):
    """Region extinction/SSA for layer jl (radsurf_forest_sw.F90:277-297).
    air_ext/air_ssa/veg_ssa: [S, L]; veg_ext/veg_fsd: [L].
    Returns (ext_reg [S, nreg], ssa_reg [S, nreg], od_scaling [nreg])."""
    S = air_ext.shape[0]
    ext = np.zeros((S, nreg))
    ssa = np.zeros((S, nreg))
    od = np.ones(nreg)
    ext[:, 0] = air_ext[:, jl]
    ssa[:, 0] = air_ssa[:, jl]
    if nreg == 2:
        ext[:, 1] = air_ext[:, jl] + veg_ext[jl]
        ssa[:, 1] = (
            ext[:, 0] * ssa[:, 0] + veg_ext[jl] * veg_ssa[:, jl]
        ) / np.maximum(ext[:, 1], 1.0e-8)
    elif nreg == 3:
        f = veg_fsd[jl]
        od[1] = np.exp(-f * (1.0 + 0.5 * f * (1.0 + 0.5 * f)))
        od[2] = 2.0 - od[1]
        for r in (1, 2):
            ext[:, r] = air_ext[:, jl] + od[r] * veg_ext[jl]
            ssa[:, r] = (
                ext[:, 0] * ssa[:, 0] + od[r] * veg_ext[jl] * veg_ssa[:, jl]
            ) / np.maximum(ext[:, r], 1.0e-8)
    return ext, ssa, od


def exchange_rates(nreg, jl, frac, norm_perim, min_frac):
    """f_exchange[to, from] (radsurf_forest_sw.F90:299-321)."""
    f = np.zeros((nreg, nreg))
    for jreg in range(nreg - 1):
        if (frac[jreg, jl] <= min_frac or frac[jreg + 1, jl] <= min_frac):
            continue
        f[jreg + 1, jreg] = norm_perim[jreg, jl] / (np.pi * frac[jreg, jl])
        f[jreg, jreg + 1] = norm_perim[jreg, jl] / (
            np.pi * frac[jreg + 1, jl]
        )
    if nreg > 2 and norm_perim[nreg - 1, jl] > 0.0:
        if not (frac[2, jl] <= min_frac or frac[0, jl] <= min_frac):
            f[0, 2] = norm_perim[nreg - 1, jl] / (np.pi * frac[2, jl])
            f[2, 0] = norm_perim[nreg - 1, jl] / (np.pi * frac[0, jl])
    return f
