"""Per-column longwave SPARTACUS solvers (reference eigen route).

forest_lw transcribes radsurf_forest_lw.F90:35-715; urban_lw transcribes
radsurf_urban_lw.F90:35-883.  Same conventions as solver_sw.  Documented
divergences from the reference (matching the production framework):
  * the TOC-normalized sweep's ground_vertical_diff goes into lw_norm, not
    lw_internal (reference accumulation bug, radsurf_forest_lw.F90:691);
  * the wall scattering factor uses the full spectral wall emissivity, not
    band 1 only (radsurf_urban_lw.F90:392) — identical for nlw = 1.
"""

from __future__ import annotations

import numpy as np

from .geometry import (exchange_rates, norm_perim_forest, norm_perim_urban,
                       overlap_matrices_forest, overlap_matrices_urban)
from .layer import calc_matrices_lw_eig


def _expand(v, ns):
    return np.kron(v, np.eye(ns))


def region_optics_lw(nreg, jl, air_ext, air_ssa, clear_air_planck, veg_ext,
                     veg_ssa, veg_planck, veg_air_planck, veg_fsd):
    """Region ext/ssa/planck for layer jl (radsurf_forest_lw.F90:271-301).
    Returns (ext_reg, ssa_reg, planck_reg [S, nreg], od_scaling [nreg])."""
    S = air_ext.shape[0]
    ext = np.zeros((S, nreg))
    ssa = np.zeros((S, nreg))
    planck = np.zeros((S, nreg))
    od = np.ones(nreg)
    ext[:, 0] = air_ext[:, jl]
    ssa[:, 0] = air_ssa[:, jl]
    planck[:, 0] = clear_air_planck[:, jl]
    if nreg == 2:
        ext[:, 1] = air_ext[:, jl] + veg_ext[jl]
        ssa[:, 1] = (
            ext[:, 0] * ssa[:, 0] + veg_ext[jl] * veg_ssa[:, jl]
        ) / np.maximum(ext[:, 1], 1.0e-8)
        planck[:, 1] = (
            ext[:, 0] * (1.0 - ssa[:, 0]) * veg_air_planck[:, jl]
            + veg_ext[jl] * (1.0 - veg_ssa[:, jl]) * veg_planck[:, jl]
        ) / np.maximum(ext[:, 1] * (1.0 - ssa[:, 1]), 1.0e-8)
    elif nreg == 3:
        f = veg_fsd[jl]
        od[1] = np.exp(-f * (1.0 + 0.5 * f * (1.0 + 0.5 * f)))
        od[2] = 2.0 - od[1]
        for r in (1, 2):
            ext[:, r] = air_ext[:, jl] + od[r] * veg_ext[jl]
            ssa[:, r] = (
                ext[:, 0] * ssa[:, 0] + od[r] * veg_ext[jl] * veg_ssa[:, jl]
            ) / np.maximum(ext[:, r], 1.0e-8)
            planck[:, r] = (
                ext[:, 0] * (1.0 - ssa[:, 0]) * veg_air_planck[:, jl]
                + od[r] * veg_ext[jl] * (1.0 - veg_ssa[:, jl])
                * veg_planck[:, jl]
            ) / np.maximum(ext[:, r] * (1.0 - ssa[:, r]), 1.0e-8)
    return ext, ssa, planck, od


def assemble_gammas_lw(lg, nreg, ext_reg, ssa_reg, f_ex, f_wall_l, wall_ext,
                       wall_factor):
    """LW Gamma blocks (radsurf_urban_lw.F90:399-444; forest = no walls)."""
    S = ext_reg.shape[0]
    ns = lg.nstream
    nd = nreg * ns
    gamma1 = np.zeros((S, nd, nd))
    for jf in range(nreg):
        for jt in range(nreg):
            if jf == jt:
                continue
            for js in range(ns):
                i_f = js + jf * ns
                i_t = js + jt * ns
                gamma1[:, i_f, i_f] -= lg.tan_ang[js] * f_ex[jt, jf]
                gamma1[:, i_t, i_f] = lg.tan_ang[js] * f_ex[jt, jf]
    for r in range(nreg):
        for js in range(ns):
            i = js + r * ns
            gamma1[:, i, i] -= (ext_reg[:, r] / lg.mu[js]
                                + lg.tan_ang[js] * f_wall_l[r] * wall_ext)
    gamma2 = np.zeros((S, nd, nd))
    for js_fr in range(ns):
        for js_to in range(ns):
            for r in range(nreg):
                i_f = js_fr + r * ns
                i_t = js_to + r * ns
                gamma2[:, i_t, i_f] = 0.5 * (
                    lg.weight[js_to] * ext_reg[:, r] * ssa_reg[:, r]
                    / lg.mu[js_fr]
                    + lg.vweight[js_to] * lg.tan_ang[js_fr]
                    * f_wall_l[r] * wall_factor
                )
    return gamma1 + gamma2, gamma2


def layer_operators_lw(dz_l, nreg, ns, frac_l, veg_frac_l, min_v,
                       gamma1, gamma2, emiss_rate):
    """LW factory with degenerate-region excision
    (radsurf_forest_lw.F90:415-445).  Returns both integrated-flux
    representations: the reference's Z-form (int_flux/int_source, applied
    to incoming fluxes) and the convergence form (int_diff/
    int_source_conv); see calc_matrices_lw_eig."""
    S = gamma1.shape[0]
    nd = nreg * ns
    R = np.zeros((S, nd, nd))
    T = np.zeros((S, nd, nd))
    p = np.zeros((S, nd))
    int_flux = np.zeros((S, nd, nd))
    int_source = np.zeros((S, nd))
    int_diff = np.zeros((S, nd, nd))
    int_source_conv = np.zeros((S, nd))
    if nreg == 1 or veg_frac_l <= min_v:
        d1 = slice(0, ns)
    elif frac_l[0] <= min_v:
        d1 = slice(ns, nd)
    else:
        d1 = slice(0, nd)
    out = calc_matrices_lw_eig(
        dz_l, gamma1[:, d1, d1], gamma2[:, d1, d1], emiss_rate[:, d1]
    )
    R[:, d1, d1] = out["reflectance"]
    T[:, d1, d1] = out["transmittance"]
    p[:, d1] = out["source"]
    int_flux[:, d1, d1] = out["int_flux"]
    int_source[:, d1] = out["int_flux_source"]
    int_diff[:, d1, d1] = out["int_diff"]
    int_source_conv[:, d1] = out["int_source_conv"]
    return R, T, p, int_flux, int_source, int_diff, int_source_conv


def _lw_solve(col, lg, nreg, cfg, with_profiles, urban, int_form="conv"):
    """Shared forest/urban LW machinery; `urban` toggles the wall terms,
    the roof pseudo-region and the urban overlap/perimeter geometry.

    int_form: "conv" (default) computes the integrated fluxes in the exact
    convergence form; "reference" uses the reference's Z-form applied to
    incoming fluxes (radsurf_forest_lw.F90:657-658), which leaks energy
    because the sweep's (I - a R)^-1 denominator fluxes are not exact
    single-layer BVP solutions (the reference's own LW budget residual).
    """
    dz = col["dz"]
    nlay = len(dz)
    ns = lg.nstream
    nd = nreg * ns
    air_ext, air_ssa = col["air_ext"], col["air_ssa"]
    veg_ext, veg_ssa = col["veg_ext"], col["veg_ssa"]
    veg_frac = col["veg_fraction"]
    S = air_ext.shape[0]
    min_v = cfg["min_vegetation_fraction"]

    frac = np.zeros((nreg, nlay))
    if urban:
        bf = col["building_fraction"]
        frac[0] = 1.0 - bf
        if nreg > 1:
            frac[0] = np.maximum(0.0, frac[0] - veg_frac)
            frac[1:] = np.maximum(0.0, 1.0 - bf - frac[0]) / (nreg - 1)
        u_ov, v_ov = overlap_matrices_urban(frac, min_v)
        norm_perim, norm_perim_wall = norm_perim_urban(
            nlay, nreg, bf, col["building_scale"], veg_frac,
            col["veg_scale"], col["veg_contact_fraction"], cfg,
        )
    else:
        frac[0] = 1.0 - veg_frac
        frac[1:] = veg_frac / (nreg - 1)
        u_ov, v_ov = overlap_matrices_forest(frac, min_v)
        norm_perim = norm_perim_forest(nlay, nreg, veg_frac,
                                       col["veg_scale"], cfg)
        norm_perim_wall = np.zeros((nreg, nlay))

    emiss_factor = 2.0 * np.sum(lg.hweight / lg.mu)
    lay = []
    od_scaling = np.ones((nlay, nreg))
    f_wall = np.zeros((nreg, nlay))
    emiss_reg = np.zeros((nlay, S, nreg))
    emiss_air = np.zeros((nlay, S, nreg))
    emiss_veg = np.zeros((nlay, S, nreg))
    emiss_wall = np.zeros((nlay, S))
    for jl in range(nlay):
        ext_reg, ssa_reg, planck_reg, od = region_optics_lw(
            nreg, jl, air_ext, air_ssa, col["clear_air_planck"],
            veg_ext, veg_ssa, col["veg_planck"], col["veg_air_planck"],
            col["veg_fsd"],
        )
        od_scaling[jl] = od
        f_ex = exchange_rates(nreg, jl, frac, norm_perim, min_v)
        if urban:
            # LW wall interception carries the Schafer correction
            # (radsurf_urban_lw.F90:373-382)
            for r in range(nreg):
                f_wall[r, jl] = (
                    norm_perim_wall[r, jl] * lg.vadjustment2
                    / (np.pi * frac[r, jl])
                    if frac[r, jl] > min_v else 0.0
                )
            wall_ext = np.ones(S)
            wall_factor = 1.0 - col["wall_emissivity"][:, jl]
        else:
            wall_ext = np.zeros(S)
            wall_factor = np.zeros(S)
        gamma1, gamma2 = assemble_gammas_lw(
            lg, nreg, ext_reg, ssa_reg, f_ex, f_wall[:, jl],
            wall_ext, wall_factor,
        )
        # Emission rates (radsurf_urban_lw.F90:446-477)
        emiss_rate = np.zeros((S, nd))
        for r in range(nreg):
            volume = frac[r, jl] * (ext_reg[:, r] * (1.0 - ssa_reg[:, r])
                                    * planck_reg[:, r])
            if urban:
                w_emiss = (norm_perim_wall[r, jl] * lg.vadjustment
                           * col["wall_emission"][:, jl])
            else:
                w_emiss = np.zeros(S)
            for js in range(ns):
                emiss_rate[:, js + r * ns] = (
                    (lg.hweight[js] / lg.mu[js]) * volume
                    + 0.5 * lg.vweight[js] * w_emiss
                )
            emiss_reg[jl, :, r] = emiss_factor * volume
            if r > 0:
                emiss_air[jl, :, r] = (
                    emiss_factor * frac[r, jl] * ext_reg[:, 0]
                    * (1.0 - ssa_reg[:, 0]) * col["veg_air_planck"][:, jl]
                )
                emiss_veg[jl, :, r] = (
                    emiss_factor * frac[r, jl] * veg_ext[jl]
                    * (1.0 - veg_ssa[:, jl]) * col["veg_planck"][:, jl]
                    * od[r]
                )
        if urban:
            emiss_wall[jl] = (norm_perim_wall[:, jl].sum() * lg.vadjustment
                              * col["wall_emission"][:, jl])
        veg_l = veg_frac[jl] if nreg > 1 else 0.0
        lay.append(layer_operators_lw(
            dz[jl], nreg, ns, frac[:, jl], veg_l, min_v,
            gamma1, gamma2, emiss_rate,
        ))

    # Ground boundary (radsurf_urban_lw.F90:551-565)
    g_emiss = col["ground_emissivity"]
    g_emission = col["ground_emission"]
    a0 = np.zeros((S, nd, nd))
    s0 = np.zeros((S, nd))
    for r in range(nreg):
        for js_to in range(ns):
            s0[:, js_to + r * ns] = (lg.hweight[js_to] * frac[r, 0]
                                     * g_emission)
            for js_fr in range(ns):
                a0[:, js_to + r * ns, js_fr + r * ns] = (
                    (1.0 - g_emiss) * lg.hweight[js_to]
                )

    nfull = (nreg + 1) * ns if urban else nd
    a_above = [None] * (nlay + 1)
    src_above = [None] * (nlay + 1)
    a_below = [None] * (nlay + 1)
    src_below = [None] * (nlay + 1)
    denom = [None] * nlay
    a_above[0], src_above[0] = a0, s0
    eye_nd = np.eye(nd)
    for jl in range(nlay):
        R, T, p = lay[jl][:3]
        denom[jl] = eye_nd - a_above[jl] @ R
        ab_reg = R + T @ np.linalg.solve(denom[jl], a_above[jl] @ T)
        sb_reg = p + (T @ np.linalg.solve(
            denom[jl],
            (src_above[jl]
             + (a_above[jl] @ p[:, :, None])[:, :, 0])[:, :, None]
        ))[:, :, 0]
        if urban:
            ab = np.zeros((S, nfull, nfull))
            sb = np.zeros((S, nfull))
            ab[:, :nd, :nd] = ab_reg
            sb[:, :nd] = sb_reg
            # Exposed-roof rows with the overhang clamp
            # (radsurf_urban_lw.F90:589-605)
            if jl < nlay - 1:
                exposed = max(0.0, bf[jl] - bf[jl + 1])
            else:
                exposed = bf[jl]
            for js in range(ns):
                ab[:, nd + js, nd:] = (
                    (1.0 - col["roof_emissivity"][:, jl])
                    * lg.hweight[js]
                )[:, None]
                sb[:, nd + js] = (lg.hweight[js]
                                  * col["roof_emission"][:, jl] * exposed)
        else:
            ab, sb = ab_reg, sb_reg
        a_below[jl + 1] = ab
        src_below[jl + 1] = sb
        ue = _expand(u_ov[jl + 1], ns)
        ve = _expand(v_ov[jl + 1], ns)
        a_above[jl + 1] = ue @ ab @ ve
        src_above[jl + 1] = sb @ ue.T

    top_emissivity = 1.0 - (
        a_above[nlay][:, :ns, :ns] @ lg.hweight
    ).sum(axis=1)
    top_emission = src_above[nlay][:, :ns].sum(axis=1)
    bc = {"top_emissivity": top_emissivity, "top_emission": top_emission}

    def zeros_lay():
        return np.zeros((nlay, S))

    def sweep(internal):
        keys = ["clear_air_abs"]
        if nreg > 1:
            keys += ["veg_air_abs", "veg_abs"]
        if urban:
            keys += ["roof_in", "roof_net", "wall_in", "wall_net"]
        out = {k: zeros_lay() for k in keys}
        if with_profiles:
            for k in ("flux_dn_layer_top", "flux_up_layer_top",
                      "flux_dn_layer_base", "flux_up_layer_base"):
                out[k] = zeros_lay()

        dn = np.zeros((S, nd))
        if not internal:
            dn[:, :ns] = lg.hweight[None, :]
        up_above = np.zeros((S, nd))

        for jl in range(nlay - 1, -1, -1):
            (R, T, p, int_flux_mat, int_source, int_diff,
             int_source_conv) = lay[jl]
            ve = _expand(v_ov[jl + 1], ns)
            dn_below = dn @ ve.T                 # [S, nfull]
            up_below = (a_below[jl + 1] @ dn_below[:, :, None])[:, :, 0]
            if internal:
                up_below = up_below + src_below[jl + 1]
            if urban:
                out["roof_in"][jl] = dn_below[:, nd:].sum(axis=1)
                out["roof_net"][jl] = (out["roof_in"][jl]
                                       - up_below[:, nd:].sum(axis=1))
            if internal:
                rhs = (
                    (T @ dn_below[:, :nd, None])[:, :, 0]
                    + (R @ src_above[jl][:, :, None])[:, :, 0]
                    + p
                )
            else:
                rhs = (T @ dn_below[:, :nd, None])[:, :, 0]
            dn = np.linalg.solve(denom[jl], rhs[:, :, None])[:, :, 0]
            up_above = (a_above[jl] @ dn[:, :, None])[:, :, 0]
            if internal:
                up_above = up_above + src_above[jl]

            if with_profiles:
                out["flux_dn_layer_top"][jl] = dn_below[:, :nd].sum(1)
                out["flux_up_layer_top"][jl] = up_below[:, :nd].sum(1)
                out["flux_dn_layer_base"][jl] = dn.sum(1)
                out["flux_up_layer_base"][jl] = up_above.sum(1)

            if int_form == "conv":
                conv = dn_below[:, :nd] - dn - up_below[:, :nd] + up_above
                int_flux = (int_diff @ conv[:, :, None])[:, :, 0]
                if internal:
                    int_flux = int_flux + int_source_conv
            else:
                int_flux = (
                    int_flux_mat @ (dn_below[:, :nd] + up_above)[:, :, None]
                )[:, :, 0]
                if internal:
                    int_flux = int_flux + int_source

            ab_coef = air_ext[:, jl] * (1.0 - air_ssa[:, jl])
            vb_coef = veg_ext[jl] * (1.0 - veg_ssa[:, jl])
            ifd = int_flux.reshape(S, nreg, ns)
            ifd_mu = ifd @ (1.0 / lg.mu)
            ifd_tan = ifd @ lg.tan_ang
            out["clear_air_abs"][jl] = ab_coef * ifd_mu[:, 0]
            if internal:
                out["clear_air_abs"][jl] -= emiss_reg[jl, :, 0] * dz[jl]
            for r in range(1, nreg):
                out["veg_air_abs"][jl] += ab_coef * ifd_mu[:, r]
                out["veg_abs"][jl] += (vb_coef * ifd_mu[:, r]
                                       * od_scaling[jl, r])
                if internal:
                    out["veg_air_abs"][jl] -= emiss_air[jl, :, r] * dz[jl]
                    out["veg_abs"][jl] -= emiss_veg[jl, :, r] * dz[jl]
            if urban:
                wall_in = np.zeros(S)
                for r in range(nreg):
                    wall_in += f_wall[r, jl] * ifd_tan[:, r]
                out["wall_in"][jl] = wall_in
                out["wall_net"][jl] = (
                    wall_in * col["wall_emissivity"][:, jl]
                )
                if internal:
                    out["wall_net"][jl] -= emiss_wall[jl] * dz[jl]

        out["ground_dn"] = dn.sum(axis=1)
        out["ground_net"] = out["ground_dn"] - up_above.sum(axis=1)
        tan_over_pi = np.tile(lg.tan_ang, nreg) / np.pi
        # Divergence from the reference: the norm sweep's contribution goes
        # to lw_norm (radsurf_forest_lw.F90:691 puts it in lw_internal)
        out["ground_vertical_diff"] = (dn + up_above) @ tan_over_pi
        if internal:
            out["top_dn"] = np.zeros(S)
            out["top_net"] = -top_emission
        else:
            out["top_dn"] = np.ones(S)
            out["top_net"] = top_emissivity
        return out

    return sweep(True), sweep(False), bc


def forest_lw(col, lg, nreg, cfg, with_profiles=False, int_form="conv"):
    return _lw_solve(col, lg, nreg, cfg, with_profiles, urban=False,
                     int_form=int_form)


def urban_lw(col, lg, nreg, cfg, with_profiles=False, int_form="conv"):
    return _lw_solve(col, lg, nreg, cfg, with_profiles, urban=True,
                     int_form=int_form)
