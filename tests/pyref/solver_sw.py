"""Per-column shortwave SPARTACUS solvers (reference eigen route).

forest_sw transcribes radsurf_forest_sw.F90:35-783; urban_sw transcribes
radsurf_urban_sw.F90:35-1007.  Pure NumPy float64, one column at a time,
spectral dimension batched as the leading axis.  Output dicts use the
production framework's key names (per-layer arrays [L, S] or [L];
per-column [S] or scalar) with layer index 0 = lowest layer, matching the
Fortran jlay=1.
"""

from __future__ import annotations

import numpy as np

from .geometry import (exchange_rates, norm_perim_forest, norm_perim_urban,
                       od_scaling_and_region_optics_sw,
                       overlap_matrices_forest, overlap_matrices_urban)
from .layer import calc_matrices_sw_eig

EPS = np.finfo(np.float64).eps


def _expand(v, ns):
    """(V kron I_ns): region-level matrix acting stream-blockwise."""
    return np.kron(v, np.eye(ns))


def assemble_gammas_sw(lg, nreg, ext_reg, ssa_reg, f_ex, f_wall_l, wall_ext,
                       wall_factor, zcos, sin0, tan0):
    """Gamma blocks for one layer (radsurf_urban_sw.F90:426-494; forest =
    all wall terms zero).  ext_reg/ssa_reg [S, nreg]; f_wall_l [nreg];
    wall_ext/wall_factor [S]."""
    S = ext_reg.shape[0]
    ns = lg.nstream
    nd = nreg * ns
    gamma0 = np.zeros((S, nreg, nreg))
    gamma1 = np.zeros((S, nd, nd))
    for jf in range(nreg):
        for jt in range(nreg):
            if jf == jt:
                continue
            gamma0[:, jf, jf] -= tan0 * f_ex[jt, jf]
            gamma0[:, jt, jf] = tan0 * f_ex[jt, jf]
            for js in range(ns):
                i_f = js + jf * ns
                i_t = js + jt * ns
                gamma1[:, i_f, i_f] -= lg.tan_ang[js] * f_ex[jt, jf]
                gamma1[:, i_t, i_f] = lg.tan_ang[js] * f_ex[jt, jf]
    for r in range(nreg):
        gamma0[:, r, r] -= ext_reg[:, r] / zcos + tan0 * f_wall_l[r] * wall_ext
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
    gamma1 = gamma1 + gamma2
    gamma3 = np.zeros((S, nd, nreg))
    for r in range(nreg):
        for js in range(ns):
            gamma3[:, js + r * ns, r] = 0.5 * (
                lg.weight[js] * ext_reg[:, r] * ssa_reg[:, r]
                + lg.vweight[js] * sin0 * f_wall_l[r] * wall_factor
            )
    return gamma0, gamma1, gamma2, gamma3


def layer_operators_sw(dz_l, zcos, nreg, ns, frac_l, veg_frac_l, min_v,
                       gamma0, gamma1, gamma2, gamma3):
    """Layer operator factory with the reference's degenerate-region
    excision (radsurf_forest_sw.F90:405-455): sub-threshold regions are cut
    out of the eigen system and the excised entries stay zero."""
    S = gamma1.shape[0]
    nd = nreg * ns
    R = np.zeros((S, nd, nd))
    T = np.zeros((S, nd, nd))
    Sup = np.zeros((S, nd, nreg))
    Sdn = np.zeros((S, nd, nreg))
    E = np.zeros((S, nreg, nreg))
    int_dir = np.zeros((S, nreg, nreg))
    int_diff = np.zeros((S, nd, nd))
    int_dir_diff = np.zeros((S, nd, nreg))

    if nreg == 1 or veg_frac_l <= min_v:
        d0, d1 = slice(0, 1), slice(0, ns)
    elif frac_l[0] <= min_v:
        d0, d1 = slice(1, nreg), slice(ns, nd)
    else:
        d0, d1 = slice(0, nreg), slice(0, nd)
    out = calc_matrices_sw_eig(
        dz_l, zcos,
        gamma0[:, d0, d0], gamma1[:, d1, d1], gamma2[:, d1, d1],
        gamma3[:, d1, d0],
    )
    R[:, d1, d1] = out["reflectance"]
    T[:, d1, d1] = out["transmittance"]
    Sup[:, d1, d0] = out["s_up"]
    Sdn[:, d1, d0] = out["s_dn"]
    E[:, d0, d0] = out["trans_dir"]
    int_dir[:, d0, d0] = out["int_dir"]
    int_diff[:, d1, d1] = out["int_diff"]
    int_dir_diff[:, d1, d0] = out["int_dir_diff"]
    return R, T, E, Sup, Sdn, int_dir, int_diff, int_dir_diff


def _ground_ops(nreg, ns, galb, galb_dir, zcos, lg):
    """Surface albedo operators (radsurf_urban_sw.F90:591-602)."""
    S = galb.shape[0]
    nd = nreg * ns
    a = np.zeros((S, nd, nd))
    d = np.zeros((S, nd, nreg))
    for r in range(nreg):
        for js_to in range(ns):
            d[:, js_to + r * ns, r] = zcos * galb_dir * lg.hweight[js_to]
            for js_fr in range(ns):
                a[:, js_to + r * ns, js_fr + r * ns] = (
                    galb * lg.hweight[js_to]
                )
    return a, d


def forest_sw(col, lg, nreg, cfg, with_profiles=False):
    """One forest column.  col: dict with dz/veg_* [L], air_ext/air_ssa/
    veg_ssa [S, L], ground_albedo(+_dir) [S], cos_sza scalar."""
    dz = col["dz"]
    nlay = len(dz)
    ns = lg.nstream
    nd = nreg * ns
    air_ext, air_ssa = col["air_ext"], col["air_ssa"]
    veg_ext, veg_ssa = col["veg_ext"], col["veg_ssa"]
    veg_frac = col["veg_fraction"]
    S = air_ext.shape[0]
    min_v = cfg["min_vegetation_fraction"]

    zcos = max(col["cos_sza"], 1.0e-6)
    tan0 = np.sqrt(1.0 - zcos * zcos) / zcos
    sin0 = 0.0  # no wall terms

    frac = np.zeros((nreg, nlay))
    frac[0] = 1.0 - veg_frac
    frac[1:] = veg_frac / (nreg - 1)

    itransp = int(np.argmin(np.sum(air_ext * dz[None, :], axis=1)))
    u_ov, v_ov = overlap_matrices_forest(frac, min_v)
    norm_perim = norm_perim_forest(nlay, nreg, veg_frac, col["veg_scale"],
                                   cfg)

    lay = []
    od_scaling = np.ones((nlay, nreg))
    for jl in range(nlay):
        ext_reg, ssa_reg, od = od_scaling_and_region_optics_sw(
            nreg, jl, air_ext, air_ssa, veg_ext, veg_ssa, col["veg_fsd"]
        )
        od_scaling[jl] = od
        f_ex = exchange_rates(nreg, jl, frac, norm_perim, min_v)
        g0, g1, g2, g3 = assemble_gammas_sw(
            lg, nreg, ext_reg, ssa_reg, f_ex,
            np.zeros(nreg), np.zeros(S), np.zeros(S), zcos, sin0, tan0,
        )
        lay.append(layer_operators_sw(
            dz[jl], zcos, nreg, ns, frac[:, jl], veg_frac[jl], min_v,
            g0, g1, g2, g3,
        ))

    # Section 4: adding method, upward (radsurf_forest_sw.F90:459-504)
    a_above = [None] * (nlay + 1)
    d_above = [None] * (nlay + 1)
    a_below = [None] * (nlay + 1)
    d_below = [None] * (nlay + 1)
    denom = [None] * nlay
    a_above[0], d_above[0] = _ground_ops(
        nreg, ns, col["ground_albedo"], col["ground_albedo_dir"], zcos, lg
    )
    eye_nd = np.eye(nd)
    for jl in range(nlay):
        R, T, E, Sup, Sdn = lay[jl][:5]
        denom[jl] = eye_nd - a_above[jl] @ R
        ab = R + T @ np.linalg.solve(denom[jl], a_above[jl] @ T)
        db = Sup + T @ np.linalg.solve(
            denom[jl], d_above[jl] @ E + a_above[jl] @ Sdn
        )
        a_below[jl + 1] = ab
        d_below[jl + 1] = db
        ue = _expand(u_ov[jl + 1], ns)
        ve = _expand(v_ov[jl + 1], ns)
        a_above[jl + 1] = ue @ ab @ ve
        d_above[jl + 1] = ue @ db @ v_ov[jl + 1]

    top_albedo_diff = (
        a_above[nlay][:, :ns, :ns] @ lg.hweight
    ).sum(axis=1)
    top_albedo_dir = d_above[nlay][:, :ns, 0].sum(axis=1) / zcos
    bc = {"top_albedo_diff": top_albedo_diff,
          "top_albedo_dir": top_albedo_dir}

    def zeros_lay():
        return np.zeros((nlay, S))

    def sweep(with_direct):
        out = {k: zeros_lay() for k in
               ("clear_air_abs", "veg_air_abs", "veg_abs")}
        if with_direct:
            out["veg_abs_dir"] = zeros_lay()
            out["veg_sunlit_frac"] = np.zeros(nlay)
        if with_profiles:
            for k in ("flux_dn_layer_top", "flux_up_layer_top",
                      "flux_dn_layer_base", "flux_up_layer_base"):
                out[k] = zeros_lay()
            if with_direct:
                out["flux_dn_dir_layer_top"] = zeros_lay()
                out["flux_dn_dir_layer_base"] = zeros_lay()

        dn_dir = np.zeros((S, nreg))
        dn_diff = np.zeros((S, nd))
        if with_direct:
            dn_dir[:, 0] = 1.0 / zcos
            dn_dir_clear = 1.0 / zcos
        else:
            dn_diff[:, :ns] = lg.hweight[None, :]
            dn_dir_clear = 1.0
        up_above = np.zeros((S, nd))

        for jl in range(nlay - 1, -1, -1):
            R, T, E, Sup, Sdn, int_dir, int_diff, int_dir_diff = lay[jl]
            ve = _expand(v_ov[jl + 1], ns)
            dn_dir_below = dn_dir @ v_ov[jl + 1].T
            dn_diff_below = dn_diff @ ve.T
            up_below = (a_below[jl + 1] @ dn_diff_below[:, :, None])[:, :, 0]
            if with_direct:
                up_below += (
                    d_below[jl + 1] @ dn_dir_below[:, :, None]
                )[:, :, 0]
                dn_dir = (E @ dn_dir_below[:, :, None])[:, :, 0]
                refl_dir = (d_above[jl] @ dn_dir[:, :, None])[:, :, 0]
                rhs = (
                    (T @ dn_diff_below[:, :, None])[:, :, 0]
                    + (R @ refl_dir[:, :, None])[:, :, 0]
                    + (Sdn @ dn_dir_below[:, :, None])[:, :, 0]
                )
                dn_diff_new = np.linalg.solve(denom[jl], rhs[:, :, None])[
                    :, :, 0]
                up_above = (
                    a_above[jl] @ dn_diff_new[:, :, None]
                )[:, :, 0] + refl_dir
            else:
                rhs = (T @ dn_diff_below[:, :, None])[:, :, 0]
                dn_diff_new = np.linalg.solve(denom[jl], rhs[:, :, None])[
                    :, :, 0]
                up_above = (a_above[jl] @ dn_diff_new[:, :, None])[:, :, 0]

            if with_profiles:
                if with_direct:
                    out["flux_dn_dir_layer_top"][jl] = zcos * dn_dir_below.sum(1)
                    out["flux_dn_dir_layer_base"][jl] = zcos * dn_dir.sum(1)
                    out["flux_dn_layer_top"][jl] = (
                        out["flux_dn_dir_layer_top"][jl] + dn_diff_below.sum(1)
                    )
                    out["flux_dn_layer_base"][jl] = (
                        out["flux_dn_dir_layer_base"][jl] + dn_diff_new.sum(1)
                    )
                else:
                    out["flux_dn_layer_top"][jl] = dn_diff_below.sum(1)
                    out["flux_dn_layer_base"][jl] = dn_diff_new.sum(1)
                out["flux_up_layer_top"][jl] = up_below.sum(1)
                out["flux_up_layer_base"][jl] = up_above.sum(1)

            conv_diff = dn_diff_below - dn_diff_new - up_below + up_above
            int_flux_diff = (int_diff @ conv_diff[:, :, None])[:, :, 0]
            if with_direct:
                conv_dir = dn_dir_below - dn_dir
                int_flux_dir = (int_dir @ conv_dir[:, :, None])[:, :, 0]
                int_flux_diff += (
                    int_dir_diff @ conv_dir[:, :, None]
                )[:, :, 0]
            else:
                int_flux_dir = np.zeros((S, nreg))

            ab_coef = air_ext[:, jl] * (1.0 - air_ssa[:, jl])
            vb_coef = veg_ext[jl] * (1.0 - veg_ssa[:, jl])
            ifd = int_flux_diff.reshape(S, nreg, ns)
            ifd_mu = ifd @ (1.0 / lg.mu)
            out["clear_air_abs"][jl] = ab_coef * (
                int_flux_dir[:, 0] + ifd_mu[:, 0]
            )
            for r in range(1, nreg):
                out["veg_air_abs"][jl] += ab_coef * (
                    int_flux_dir[:, r] + ifd_mu[:, r]
                )
                out["veg_abs"][jl] += vb_coef * (
                    int_flux_dir[:, r] + ifd_mu[:, r]
                ) * od_scaling[jl, r]
                if with_direct:
                    out["veg_abs_dir"][jl] += (
                        vb_coef * int_flux_dir[:, r] * od_scaling[jl, r]
                    )

            if with_direct:
                # Sunlit fractions (radsurf_forest_sw.F90:630-649)
                tdc = np.exp(-air_ext[itransp, jl] * dz[jl] / zcos)
                if air_ext[itransp, jl] > 0.0:
                    int_dir_clear = (dn_dir_clear * (1.0 - tdc) * zcos
                                     / air_ext[itransp, jl])
                else:
                    int_dir_clear = dn_dir_clear * dz[jl]
                veg_abs_dir_clear = (
                    int_dir_clear * veg_ext[jl]
                    * (1.0 - veg_ssa[itransp, jl]) * veg_frac[jl]
                )
                out["veg_sunlit_frac"][jl] = (
                    out["veg_abs_dir"][jl, itransp]
                    / max(EPS, veg_abs_dir_clear)
                )
                dn_dir_clear *= tdc
            dn_diff = dn_diff_new

        ground_dn_dir = zcos * dn_dir.sum(axis=1)
        up_fin = up_above
        out["ground_dn"] = dn_diff.sum(axis=1)
        if with_direct:
            out["ground_dn"] = out["ground_dn"] + ground_dn_dir
            out["ground_dn_dir"] = ground_dn_dir
            out["ground_sunlit_frac"] = float(
                ground_dn_dir[itransp] / (zcos * dn_dir_clear)
            )
            out["top_dn_dir"] = np.ones(S)
            out["top_dn"] = np.ones(S)
            out["top_net"] = 1.0 - top_albedo_dir
        else:
            out["top_dn_dir"] = np.zeros(S)
            out["top_dn"] = np.ones(S)
            out["top_net"] = 1.0 - top_albedo_diff
        out["ground_net"] = out["ground_dn"] - up_fin.sum(axis=1)
        tan_over_pi = np.tile(lg.tan_ang, nreg) / np.pi
        out["ground_vertical_diff"] = (dn_diff + up_fin) @ tan_over_pi
        return out

    return sweep(True), sweep(False), bc


def urban_sw(col, lg, nreg, cfg, with_profiles=False):
    """One urban column (radsurf_urban_sw.F90).  As forest_sw plus
    building_fraction/scale [L], roof/wall albedos [S, L],
    wall_specular_frac [S, L], veg_contact_fraction [L]."""
    dz = col["dz"]
    nlay = len(dz)
    ns = lg.nstream
    nd = nreg * ns
    air_ext, air_ssa = col["air_ext"], col["air_ssa"]
    veg_ext, veg_ssa = col["veg_ext"], col["veg_ssa"]
    veg_frac = col["veg_fraction"]
    bf = col["building_fraction"]
    S = air_ext.shape[0]
    min_v = cfg["min_vegetation_fraction"]
    min_b = cfg["min_building_fraction"]

    zcos = max(col["cos_sza"], 1.0e-6)
    sin0 = np.sqrt(1.0 - zcos * zcos)
    tan0 = sin0 / zcos

    # Region fractions (radsurf_urban_sw.F90:284-291)
    frac = np.zeros((nreg, nlay))
    frac[0] = 1.0 - bf
    if nreg > 1:
        frac[0] = np.maximum(0.0, frac[0] - veg_frac)
        frac[1:] = np.maximum(0.0, 1.0 - bf - frac[0]) / (nreg - 1)

    # Exposed roof / non-building fractions (lines 292-298)
    roof_fraction = np.zeros(nlay + 1)
    roof_fraction[nlay - 1] = bf[nlay - 1]
    roof_fraction[:nlay - 1] = np.maximum(0.0, bf[:nlay - 1] - bf[1:nlay])
    non_building = np.ones(nlay + 1)
    non_building[:nlay] = 1.0 - bf

    itransp = int(np.argmin(np.sum(air_ext * dz[None, :], axis=1)))
    u_ov, v_ov = overlap_matrices_urban(frac, min_v)
    norm_perim, norm_perim_wall = norm_perim_urban(
        nlay, nreg, bf, col["building_scale"], veg_frac, col["veg_scale"],
        col["veg_contact_fraction"], cfg,
    )

    lay = []
    od_scaling = np.ones((nlay, nreg))
    f_wall = np.zeros((nreg, nlay))
    f_wall_dir_clear = np.zeros(nlay)
    for jl in range(nlay):
        ext_reg, ssa_reg, od = od_scaling_and_region_optics_sw(
            nreg, jl, air_ext, air_ssa, veg_ext, veg_ssa, col["veg_fsd"]
        )
        od_scaling[jl] = od
        f_ex = exchange_rates(nreg, jl, frac, norm_perim, min_v)
        for r in range(nreg):
            f_wall[r, jl] = (
                norm_perim_wall[r, jl] / (np.pi * frac[r, jl])
                if frac[r, jl] > min_v else 0.0
            )
        if non_building[jl] > min_b:
            f_wall_dir_clear[jl] = (
                norm_perim_wall[:, jl].sum() / (np.pi * non_building[jl])
            )
        wall_ext = 1.0 - col["wall_albedo"][:, jl] * \
            col["wall_specular_frac"][:, jl]
        wall_factor = col["wall_albedo"][:, jl] * (
            1.0 - col["wall_specular_frac"][:, jl]
        )
        g0, g1, g2, g3 = assemble_gammas_sw(
            lg, nreg, ext_reg, ssa_reg, f_ex, f_wall[:, jl],
            wall_ext, wall_factor, zcos, sin0, tan0,
        )
        veg_l = veg_frac[jl] if nreg > 1 else 0.0
        lay.append(layer_operators_sw(
            dz[jl], zcos, nreg, ns, frac[:, jl], veg_l, min_v,
            g0, g1, g2, g3,
        ))

    # Adding method with the exposed-roof pseudo-region
    # (radsurf_urban_sw.F90:604-654)
    a_above = [None] * (nlay + 1)
    d_above = [None] * (nlay + 1)
    a_below = [None] * (nlay + 1)
    d_below = [None] * (nlay + 1)
    denom = [None] * nlay
    a_above[0], d_above[0] = _ground_ops(
        nreg, ns, col["ground_albedo"], col["ground_albedo_dir"], zcos, lg
    )
    eye_nd = np.eye(nd)
    nfull = (nreg + 1) * ns
    for jl in range(nlay):
        R, T, E, Sup, Sdn = lay[jl][:5]
        denom[jl] = eye_nd - a_above[jl] @ R
        ab = np.zeros((S, nfull, nfull))
        db = np.zeros((S, nfull, nreg + 1))
        ab[:, :nd, :nd] = R + T @ np.linalg.solve(
            denom[jl], a_above[jl] @ T
        )
        db[:, :nd, :nreg] = Sup + T @ np.linalg.solve(
            denom[jl], d_above[jl] @ E + a_above[jl] @ Sdn
        )
        for js in range(ns):
            ab[:, nd + js, nd:] = (
                col["roof_albedo"][:, jl] * lg.hweight[js]
            )[:, None]
            db[:, nd + js, nreg] = (
                zcos * col["roof_albedo_dir"][:, jl] * lg.hweight[js]
            )
        a_below[jl + 1] = ab
        d_below[jl + 1] = db
        ue = _expand(u_ov[jl + 1], ns)   # [nd, nfull]
        ve = _expand(v_ov[jl + 1], ns)   # [nfull, nd]
        a_above[jl + 1] = ue @ ab @ ve
        d_above[jl + 1] = ue @ db @ v_ov[jl + 1]

    top_albedo_diff = (a_above[nlay][:, :ns, :ns] @ lg.hweight).sum(axis=1)
    top_albedo_dir = d_above[nlay][:, :ns, 0].sum(axis=1) / zcos
    bc = {"top_albedo_diff": top_albedo_diff,
          "top_albedo_dir": top_albedo_dir}

    def zeros_lay():
        return np.zeros((nlay, S))

    def sweep(with_direct):
        keys = ["clear_air_abs", "roof_in", "roof_net", "wall_in",
                "wall_net"]
        if nreg > 1:
            keys += ["veg_air_abs", "veg_abs"]
        if with_direct:
            keys += ["roof_in_dir", "wall_in_dir"]
            if nreg > 1:
                keys += ["veg_abs_dir"]
        out = {k: zeros_lay() for k in keys}
        if with_direct:
            out["roof_sunlit_frac"] = np.zeros(nlay)
            out["wall_sunlit_frac"] = np.zeros(nlay)
            if nreg > 1:
                out["veg_sunlit_frac"] = np.zeros(nlay)
        if with_profiles:
            for k in ("flux_dn_layer_top", "flux_up_layer_top",
                      "flux_dn_layer_base", "flux_up_layer_base"):
                out[k] = zeros_lay()
            if with_direct:
                out["flux_dn_dir_layer_top"] = zeros_lay()
                out["flux_dn_dir_layer_base"] = zeros_lay()

        dn_dir = np.zeros((S, nreg))
        dn_diff = np.zeros((S, nd))
        if with_direct:
            dn_dir[:, 0] = 1.0 / zcos
            dn_dir_clear = 1.0 / zcos
        else:
            dn_diff[:, :ns] = lg.hweight[None, :]
            dn_dir_clear = 1.0
        up_above = np.zeros((S, nd))

        for jl in range(nlay - 1, -1, -1):
            R, T, E, Sup, Sdn, int_dir, int_diff, int_dir_diff = lay[jl]
            ve = _expand(v_ov[jl + 1], ns)
            dn_dir_below = dn_dir @ v_ov[jl + 1].T       # [S, nreg+1]
            dn_diff_below = dn_diff @ ve.T               # [S, nfull]
            up_below = (a_below[jl + 1] @ dn_diff_below[:, :, None])[:, :, 0]
            if with_direct:
                up_below += (
                    d_below[jl + 1] @ dn_dir_below[:, :, None]
                )[:, :, 0]

            # Roof fluxes (lines 716-721)
            roof_in = dn_diff_below[:, nd:].sum(axis=1)
            if with_direct:
                roof_in_dir = zcos * dn_dir_below[:, nreg]
                roof_in = roof_in + roof_in_dir
                out["roof_in_dir"][jl] = roof_in_dir
            out["roof_in"][jl] = roof_in
            out["roof_net"][jl] = roof_in - up_below[:, nd:].sum(axis=1)

            if with_direct:
                dn_dir = (E @ dn_dir_below[:, :nreg, None])[:, :, 0]
                refl_dir = (d_above[jl] @ dn_dir[:, :, None])[:, :, 0]
                rhs = (
                    (T @ dn_diff_below[:, :nd, None])[:, :, 0]
                    + (R @ refl_dir[:, :, None])[:, :, 0]
                    + (Sdn @ dn_dir_below[:, :nreg, None])[:, :, 0]
                )
                dn_diff_new = np.linalg.solve(denom[jl], rhs[:, :, None])[
                    :, :, 0]
                up_above = (
                    a_above[jl] @ dn_diff_new[:, :, None]
                )[:, :, 0] + refl_dir
            else:
                rhs = (T @ dn_diff_below[:, :nd, None])[:, :, 0]
                dn_diff_new = np.linalg.solve(denom[jl], rhs[:, :, None])[
                    :, :, 0]
                up_above = (a_above[jl] @ dn_diff_new[:, :, None])[:, :, 0]

            if with_profiles:
                if with_direct:
                    out["flux_dn_dir_layer_top"][jl] = (
                        zcos * dn_dir_below[:, :nreg].sum(1)
                    )
                    out["flux_dn_dir_layer_base"][jl] = zcos * dn_dir.sum(1)
                    out["flux_dn_layer_top"][jl] = (
                        out["flux_dn_dir_layer_top"][jl]
                        + dn_diff_below[:, :nd].sum(1)
                    )
                    out["flux_dn_layer_base"][jl] = (
                        out["flux_dn_dir_layer_base"][jl] + dn_diff_new.sum(1)
                    )
                else:
                    out["flux_dn_layer_top"][jl] = dn_diff_below[:, :nd].sum(1)
                    out["flux_dn_layer_base"][jl] = dn_diff_new.sum(1)
                out["flux_up_layer_top"][jl] = up_below[:, :nd].sum(1)
                out["flux_up_layer_base"][jl] = up_above.sum(1)

            conv_diff = (dn_diff_below[:, :nd] - dn_diff_new
                         - up_below[:, :nd] + up_above)
            int_flux_diff = (int_diff @ conv_diff[:, :, None])[:, :, 0]
            if with_direct:
                conv_dir = dn_dir_below[:, :nreg] - dn_dir
                int_flux_dir = (int_dir @ conv_dir[:, :, None])[:, :, 0]
                int_flux_diff += (
                    int_dir_diff @ conv_dir[:, :, None]
                )[:, :, 0]
            else:
                int_flux_dir = np.zeros((S, nreg))

            ab_coef = air_ext[:, jl] * (1.0 - air_ssa[:, jl])
            vb_coef = veg_ext[jl] * (1.0 - veg_ssa[:, jl])
            ifd = int_flux_diff.reshape(S, nreg, ns)
            ifd_mu = ifd @ (1.0 / lg.mu)
            ifd_tan = ifd @ lg.tan_ang
            out["clear_air_abs"][jl] = ab_coef * (
                int_flux_dir[:, 0] + ifd_mu[:, 0]
            )
            for r in range(1, nreg):
                out["veg_air_abs"][jl] += ab_coef * (
                    int_flux_dir[:, r] + ifd_mu[:, r]
                )
                out["veg_abs"][jl] += vb_coef * (
                    int_flux_dir[:, r] + ifd_mu[:, r]
                ) * od_scaling[jl, r]
                if with_direct:
                    out["veg_abs_dir"][jl] += (
                        vb_coef * int_flux_dir[:, r] * od_scaling[jl, r]
                    )

            # Wall fluxes (lines 790-802 / 955-963)
            wall_in = np.zeros(S)
            for r in range(nreg):
                wall_in += f_wall[r, jl] * ifd_tan[:, r]
            if with_direct:
                wall_in_dir = np.zeros(S)
                for r in range(nreg):
                    wall_in_dir += (
                        f_wall[r, jl] * sin0 * int_flux_dir[:, r]
                    )
                out["wall_in_dir"][jl] = wall_in_dir
                wall_in = wall_in + wall_in_dir
            out["wall_in"][jl] = wall_in
            out["wall_net"][jl] = wall_in * (
                1.0 - col["wall_albedo"][:, jl]
            )

            if with_direct:
                # Sunlit fractions (lines 804-848)
                out["roof_sunlit_frac"][jl] = (
                    out["roof_in_dir"][jl, itransp] * non_building[jl + 1]
                    / (zcos * dn_dir_clear
                       * max(min_b, roof_fraction[jl]))
                )
                dn_dir_clear *= non_building[jl] / non_building[jl + 1]
                tdc = np.exp(-air_ext[itransp, jl] * dz[jl] / zcos)
                if air_ext[itransp, jl] > 0.0:
                    int_dir_clear = (dn_dir_clear * (1.0 - tdc) * zcos
                                     / air_ext[itransp, jl])
                else:
                    int_dir_clear = dn_dir_clear * dz[jl]
                if nreg > 1:
                    veg_abs_dir_clear = (
                        int_dir_clear * veg_ext[jl]
                        * (1.0 - veg_ssa[itransp, jl]) * veg_frac[jl]
                    )
                    out["veg_sunlit_frac"][jl] = (
                        out["veg_abs_dir"][jl, itransp]
                        / max(EPS, veg_abs_dir_clear)
                    )
                out["wall_sunlit_frac"][jl] = (
                    0.5 * out["wall_in_dir"][jl, itransp]
                    / max(EPS,
                          f_wall_dir_clear[jl] * sin0 * int_dir_clear)
                )
                dn_dir_clear *= tdc
            dn_diff = dn_diff_new

        ground_dn_dir = zcos * dn_dir.sum(axis=1)
        out["ground_dn"] = dn_diff.sum(axis=1)
        if with_direct:
            out["ground_dn"] = out["ground_dn"] + ground_dn_dir
            out["ground_dn_dir"] = ground_dn_dir
            out["ground_sunlit_frac"] = float(
                ground_dn_dir[itransp] / (zcos * dn_dir_clear)
            )
            out["top_dn_dir"] = np.ones(S)
            out["top_dn"] = np.ones(S)
            out["top_net"] = 1.0 - top_albedo_dir
        else:
            out["top_dn_dir"] = np.zeros(S)
            out["top_dn"] = np.ones(S)
            out["top_net"] = 1.0 - top_albedo_diff
        out["ground_net"] = out["ground_dn"] - up_above.sum(axis=1)
        tan_over_pi = np.tile(lg.tan_ang, nreg) / np.pi
        out["ground_vertical_diff"] = (dn_diff + up_above) @ tan_over_pi
        return out

    return sweep(True), sweep(False), bc
