"""Region optical properties and Gamma-matrix assembly.

Fully-batched assembly of the SPARTACUS exchange matrices over
[ncol, nlay, nspec]; the reference assembles them per column per layer in
scalar loops (radsurf/radsurf_urban_sw.F90:340-494,
radsurf_urban_lw.F90:300-477; the forest versions are the f_wall = 0 limit).

Index convention for the diffuse system: i = region * ns + stream
(stream-minor, region-major), matching radsurf_forest_sw.F90:338-339.
Region axes are LAST, spectral axis third-from-last in the assembled
matrices: gamma1 has shape [ncol, nlay, nspec, nd, nd].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.legendre_gauss import LegendreGauss

_EXT_EPS = 1.0e-8  # floor used by the reference (radsurf_forest_sw.F90:282)


def region_optics_sw(air_ext, air_ssa, veg_ext, veg_ssa, od_scaling, nreg: int):
    """Per-region extinction and single-scattering albedo (SW).

    air_ext/air_ssa/veg_ssa: [C, L, S]; veg_ext: [C, L];
    od_scaling: [C, L, nreg-1].  Returns ext_reg, ssa_reg [C, L, S, nreg].
    Parity: radsurf/radsurf_forest_sw.F90:277-297.
    """
    ext1 = air_ext[..., None]
    ssa1 = air_ssa[..., None]
    if nreg == 1:
        return ext1, ssa1
    scaled_veg = od_scaling[..., None, :] * veg_ext[..., None, None]  # [C,L,1,nreg-1] -> [C,L,S?,..]
    ext_v = air_ext[..., None] + scaled_veg
    ssa_v = (
        air_ext[..., None] * air_ssa[..., None] + scaled_veg * veg_ssa[..., None]
    ) / jnp.maximum(ext_v, _EXT_EPS)
    return (
        jnp.concatenate([ext1, ext_v], axis=-1),
        jnp.concatenate([ssa1, ssa_v], axis=-1),
    )


def region_optics_lw(
    air_ext, air_ssa, clear_air_planck, veg_ext, veg_ssa,
    veg_planck, veg_air_planck, od_scaling, nreg: int,
):
    """Per-region ext, ssa and Planck source (LW).

    Returns ext_reg, ssa_reg, planck_reg [C, L, S, nreg].
    Parity: radsurf/radsurf_forest_lw.F90:271-301.
    """
    ext_reg, ssa_reg = region_optics_sw(
        air_ext, air_ssa, veg_ext, veg_ssa, od_scaling, nreg
    )
    p1 = clear_air_planck[..., None]
    if nreg == 1:
        return ext_reg, ssa_reg, p1
    scaled_veg = od_scaling[..., None, :] * veg_ext[..., None, None]
    num = (
        air_ext[..., None] * (1.0 - air_ssa[..., None]) * veg_air_planck[..., None]
        + scaled_veg * (1.0 - veg_ssa[..., None]) * veg_planck[..., None]
    )
    den = jnp.maximum(
        ext_reg[..., 1:] * (1.0 - ssa_reg[..., 1:]), _EXT_EPS
    )
    return ext_reg, ssa_reg, jnp.concatenate([p1, num / den], axis=-1)


def exchange_rates(norm_perim, frac, nreg: int, min_frac: float):
    """Rates of exchange between regions f_exchange[..., to, fr].

    norm_perim, frac: [..., nreg].  Pairs are (1,2), (2,3) and (3,1) with
    norm_perim[..., nreg-1] the 3<->1 edge.
    Parity: radsurf/radsurf_forest_sw.F90:299-321 (identical in all four
    solvers), including the threshold zeroing when either region is smaller
    than min_frac.
    """
    shape = frac.shape[:-1]
    f = jnp.zeros(shape + (nreg, nreg), frac.dtype)
    if nreg == 1:
        return f
    pi = np.pi

    def rate(np_edge, fr, to):
        ok = (frac[..., fr] > min_frac) & (frac[..., to] > min_frac)
        return jnp.where(ok, np_edge / (pi * jnp.maximum(frac[..., fr], min_frac)), 0.0)

    for j in range(nreg - 1):
        f = f.at[..., j + 1, j].set(rate(norm_perim[..., j], j, j + 1))
        f = f.at[..., j, j + 1].set(rate(norm_perim[..., j], j + 1, j))
    if nreg > 2:
        edge = norm_perim[..., nreg - 1]
        ok = edge > 0.0
        f = f.at[..., 0, 2].set(jnp.where(ok, rate(edge, 2, 0), 0.0))
        f = f.at[..., 2, 0].set(jnp.where(ok, rate(edge, 0, 2), 0.0))
    return f


def wall_rates(norm_perim_wall, frac, nreg: int, min_frac: float, adjustment: float):
    """Rate of interception of radiation by walls, f_wall [..., nreg].

    Parity: radsurf/radsurf_urban_sw.F90:395-403 (SW: adjustment = 1) and
    radsurf_urban_lw.F90:373-382 (LW: adjustment = lg.vadjustment2).
    """
    ok = frac > min_frac
    return jnp.where(
        ok, norm_perim_wall * adjustment / (np.pi * jnp.maximum(frac, min_frac)), 0.0
    )


def _block_eye(lg: LegendreGauss, nreg: int, vec, dtype):
    """Diagonal [nd, nd] constant with per-stream values `vec`, tiled over regions."""
    nd = nreg * lg.nstream
    return np.diag(np.tile(np.asarray(vec), nreg)).astype(dtype)


def assemble_gammas(
    ext_reg,
    ssa_reg,
    f_exchange,
    f_wall,
    wall_ext,
    wall_factor,
    lg: LegendreGauss,
    nreg: int,
    *,
    cos_sza=None,
    sin_sza=None,
    tan_sza=None,
):
    """Assemble gamma0/gamma1/gamma2/gamma3 (SW) or gamma1/gamma2 (LW).

    Args:
      ext_reg, ssa_reg: [C, L, S, nreg].
      f_exchange: [C, L, nreg, nreg]; f_wall: [C, L, nreg].
      wall_ext, wall_factor: [C, L, S] wall extinction/diffuse-scattering
        factors (zeros/ones for forests).
      cos_sza/sin_sza/tan_sza: [C] solar angles; None => longwave (no
        direct matrices are built).

    Returns (gamma0, gamma1, gamma2, gamma3) with gamma0/gamma3 None for LW.
    Parity: radsurf/radsurf_urban_sw.F90:420-494 and
    radsurf_urban_lw.F90:394-444.
    """
    ns = lg.nstream
    nd = nreg * ns
    dtype = ext_reg.dtype
    # All quadrature constants cast to the working dtype so float32 inputs
    # never get promoted under jax_enable_x64
    tan_s = np.asarray(lg.tan_ang, dtype)
    mu_s = np.asarray(lg.mu, dtype)
    w_s = np.asarray(lg.weight, dtype)
    vw_s = np.asarray(lg.vweight, dtype)
    eye_s = np.eye(ns, dtype=dtype)
    reg_eye = np.eye(nreg, dtype=dtype)
    # mask[r, s, q, u] = delta(r, q) delta(s, u): the full-system diagonal
    diag_mask = np.asarray(
        reg_eye[:, None, :, None] * eye_s[None, :, None, :], dtype
    )

    # f_exchange/f_wall broadcast over spectral: [C, L, 1, ...]
    fex = f_exchange[..., None, :, :]  # [C, L, 1, to, fr]
    fwall = f_wall[..., None, :]  # [C, L, 1, nreg]
    fex_colsum = jnp.sum(fex, axis=-2)  # [C, L, 1, fr]

    # --- gamma1 (before adding gamma2), as [.., nreg, ns, nreg, ns]
    # off-diagonal region blocks: tan_s * f_ex[to, fr], diagonal in stream:
    # off[.., to, st, fr, sf] = f_ex[to, fr] * tan[st] * delta(st, sf)
    tan_diag = eye_s * tan_s[:, None]  # [st, sf]
    off = fex[..., :, None, :, None] * tan_diag[None, :, None, :]
    # diagonal: exchange loss + extinction + wall interception
    diag_vals = -(
        fex_colsum[..., :, None] * tan_s
        + ext_reg[..., :, None] / mu_s
        + (fwall * wall_ext[..., None])[..., :, None] * tan_s
    )  # [.., nreg, ns]
    g1 = off + diag_vals[..., :, :, None, None] * diag_mask

    # --- gamma2: block diagonal over regions
    # g2[.., r, st, r, sf] = 0.5*(w[st]*ext*ssa/mu[sf]
    #                             + vw[st]*tan[sf]*f_wall*wall_factor)
    scat = ext_reg * ssa_reg  # [.., nreg]
    wallscat = fwall * wall_factor[..., None]  # [.., nreg]
    g2_block = 0.5 * (
        scat[..., :, None, None] * (w_s[:, None] / mu_s[None, :])
        + wallscat[..., :, None, None] * (vw_s[:, None] * tan_s[None, :])
    )  # [.., nreg, st, sf]
    g2 = g2_block[..., :, :, None, :] * reg_eye[:, None, :, None]

    bshape = jnp.broadcast_shapes(g1.shape, g2.shape)
    batch = bshape[:-4]
    gamma1 = jnp.broadcast_to(g1 + g2, bshape).reshape(batch + (nd, nd))
    gamma2 = jnp.broadcast_to(g2, bshape).reshape(batch + (nd, nd))

    if cos_sza is None:
        return None, gamma1, gamma2, None

    # --- gamma0 (direct beam): [C] solar angles broadcast over [L, S]
    tan0 = tan_sza[:, None, None]  # [C, 1, 1] over (L, S)
    mu0 = cos_sza[:, None, None]
    sin0 = sin_sza[:, None, None]
    off0 = fex * tan0[..., None, None]
    diag0 = -(
        fex_colsum * tan0[..., None]
        + ext_reg / mu0[..., None]
        + fwall * wall_ext[..., None] * tan0[..., None]
    )  # [C, L, S, nreg]
    gamma0 = off0 * (1.0 - reg_eye) + diag0[..., None, :] * reg_eye

    # --- gamma3: [.., nd, nreg], block diagonal in region
    g3_vals = 0.5 * (
        scat[..., :, None] * w_s
        + (wallscat * sin0[..., None])[..., :, None] * vw_s
    )  # [.., nreg, ns]
    gamma3 = (g3_vals[..., :, :, None] * reg_eye[:, None, :]).reshape(
        batch + (nd, nreg)
    )

    return gamma0, gamma1, gamma2, gamma3


def emission_rates(
    ext_reg,
    ssa_reg,
    planck_reg,
    frac,
    norm_perim_wall,
    wall_emission,
    lg: LegendreGauss,
    nreg: int,
):
    """Longwave emission-rate vector b [..., nd] plus bookkeeping rates.

    Parity: radsurf/radsurf_urban_lw.F90:446-477 (forest = zero wall terms,
    radsurf_forest_lw.F90:376-395).

    Returns dict with:
      emiss_rate [C, L, S, nd]      per-stream emission ("b" of Eq. 32)
      volume_emiss [C, L, S, nreg]  frac*ext*(1-ssa)*B per region
    """
    ns = lg.nstream
    dtype = ext_reg.dtype
    hw = np.asarray(lg.hweight, dtype)
    mu = np.asarray(lg.mu, dtype)
    vw = np.asarray(lg.vweight, dtype)

    volume_emiss = (
        frac[..., None, :] * ext_reg * (1.0 - ssa_reg) * planck_reg
    )  # [C, L, S, nreg]
    wall_emiss = (
        norm_perim_wall[..., None, :] * lg.vadjustment * wall_emission[..., None]
    )  # [C, L, S, nreg]
    b = (
        volume_emiss[..., :, None] * (hw / mu)
        + wall_emiss[..., :, None] * (0.5 * vw)
    )  # [C, L, S, nreg, ns]
    return {
        "emiss_rate": b.reshape(b.shape[:-2] + (nreg * ns,)),
        "volume_emiss": volume_emiss,
    }
