"""Statistical canopy geometry: region fractions, normalized perimeters and
maximum-random overlap matrices.

All functions are elementwise/broadcast jnp over a dense padded layer grid
[..., nlay] (padding layers have zero fractions and dz=0, which makes every
formula a no-op there), vectorized over all columns and layers at once — the
reference instead loops per column per layer.

The framework uses the URBAN machinery for every SPARTACUS column: with
building_fraction == 0 the urban region fractions, perimeters and overlap
matrices reduce exactly to the forest ones (this is the property exercised by
the reference's consistency test, test/simple/README:8-11), so forests are
simply urban canopies with no buildings.

Parity map:
  region_fracs            <-> radsurf/radsurf_urban_sw.F90:283-291 (and the
                              equivalent forest lines radsurf_forest_sw.F90:243-248)
  od_scaling_from_fsd     <-> radsurf/radsurf_forest_sw.F90:284-297
  norm_perim_urban        <-> radsurf/radsurf_norm_perim.F90:131-281
  overlap_matrices_urban  <-> radsurf/radsurf_overlap.F90:178-394
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.constants import Pi


def od_scaling_from_fsd(veg_fsd, nreg: int):
    """Optical-depth scaling of the vegetated regions from the fractional
    standard deviation (approximating a Gamma distribution).

    Returns [..., nreg-1] scalings for regions 2..nreg (1.0 when nreg == 2).
    Parity: radsurf/radsurf_forest_sw.F90:283-297.
    """
    if nreg <= 1:
        return jnp.zeros(veg_fsd.shape + (0,), veg_fsd.dtype)
    if nreg == 2:
        return jnp.ones(veg_fsd.shape + (1,), veg_fsd.dtype)
    s2 = jnp.exp(-veg_fsd * (1.0 + 0.5 * veg_fsd * (1.0 + 0.5 * veg_fsd)))
    return jnp.stack([s2, 2.0 - s2], axis=-1)


def region_fracs(veg_fraction, building_fraction, nreg: int):
    """Area fraction of each permeable region, [..., nreg].

    Region 1 is clear air; regions 2..nreg share the vegetation equally.  In
    urban columns the fractions sum to 1 - building_fraction.
    Parity: radsurf/radsurf_urban_sw.F90:283-291.
    """
    f1 = 1.0 - building_fraction
    if nreg == 1:
        return f1[..., None]
    f1v = jnp.maximum(0.0, f1 - veg_fraction)
    fveg = jnp.maximum(0.0, 1.0 - building_fraction - f1v) / (nreg - 1)
    return jnp.concatenate(
        [f1v[..., None], jnp.broadcast_to(fveg[..., None], fveg.shape + (nreg - 1,))],
        axis=-1,
    )


def norm_perim_urban(
    building_fraction,
    building_scale,
    veg_fraction,
    veg_scale,
    veg_contact_fraction,
    *,
    nreg: int,
    use_symmetric_vegetation_scale: bool,
    vegetation_isolation_factor: float,
    min_vegetation_fraction: float,
    min_building_fraction: float,
):
    """Normalized perimeter lengths (m-1) between regions and with walls.

    Returns (norm_perim [..., nreg], norm_perim_wall [..., nreg]).
    norm_perim[..., 0] is the clear/vegetation edge, norm_perim[..., 1] the
    region-2/region-3 edge and norm_perim[..., nreg-1] the region-1/region-3
    edge (nreg == 3 only).  For forests pass building_fraction = 0 (the wall
    output is then zero).
    Parity: radsurf/radsurf_norm_perim.F90:131-281 (urban) which contains
    the forest formulas (radsurf_norm_perim.F90:30-116) as the b == 0 limit.
    """
    shape = jnp.broadcast_shapes(building_fraction.shape, veg_fraction.shape)
    dtype = jnp.result_type(building_fraction, veg_fraction)
    np_cols = [jnp.zeros(shape, dtype) for _ in range(max(nreg, 1))]
    npw_cols = [jnp.zeros(shape, dtype) for _ in range(max(nreg, 1))]

    has_veg = veg_fraction > min_vegetation_fraction
    iso = vegetation_isolation_factor

    if nreg > 1:
        if use_symmetric_vegetation_scale:
            base = (
                4.0
                * veg_fraction
                * jnp.maximum(0.0, 1.0 - veg_fraction - building_fraction)
                / (
                    jnp.maximum(min_building_fraction, 1.0 - building_fraction)
                    * veg_scale
                )
            )
        else:
            base = 4.0 * veg_fraction / veg_scale
        if nreg == 2:
            np_cols[0] = jnp.where(has_veg, base, 0.0)
        else:
            np_cols[nreg - 1] = jnp.where(has_veg, 0.5 * iso * base, 0.0)
            np_cols[0] = jnp.where(has_veg, (1.0 - 0.5 * iso) * base, 0.0)
            if use_symmetric_vegetation_scale:
                mid = (
                    (1.0 - iso)
                    * 4.0
                    * (0.5 * veg_fraction)
                    * (1.0 - 0.5 * veg_fraction - building_fraction)
                    / (
                        jnp.maximum(min_building_fraction, 1.0 - building_fraction)
                        * veg_scale
                    )
                )
            else:
                # Lollipop model, Hogan, Quaife and Braghiere (2018)
                mid = (1.0 - iso) * 4.0 * veg_fraction / (jnp.sqrt(2.0) * veg_scale)
            np_cols[1] = jnp.where(has_veg, mid, 0.0)

    has_bldg = building_fraction > min_building_fraction
    wall_all = jnp.where(
        has_bldg, 4.0 * building_fraction / building_scale, 0.0
    )
    if nreg == 1:
        npw_cols[0] = wall_all
    else:
        no_clear = (
            1.0 - veg_fraction - building_fraction
        ) <= min_vegetation_fraction
        cf = veg_contact_fraction
        if nreg == 2:
            w2_full = wall_all
            w2_contact = wall_all * cf
        else:
            w2_full = wall_all * (1.0 - iso)
            w2_contact = wall_all * cf * (1.0 - iso)
        # Nominal case: clear + veg both present, contact fraction splits
        nominal = has_veg & ~no_clear
        npw_cols[0] = jnp.where(
            no_clear, 0.0, jnp.where(nominal, wall_all * (1.0 - cf), wall_all)
        )
        npw_cols[1] = jnp.where(no_clear, w2_full, jnp.where(nominal, w2_contact, 0.0))
        if nreg == 3:
            w3_full = wall_all * iso
            w3_contact = wall_all * cf * iso
            npw_cols[2] = jnp.where(
                no_clear, w3_full, jnp.where(nominal, w3_contact, 0.0)
            )

    norm_perim = jnp.stack(np_cols[:nreg], axis=-1)
    norm_perim_wall = jnp.stack(npw_cols[:nreg], axis=-1)
    return norm_perim, norm_perim_wall


def _overlap_matrix_urban(fu, fl, nreg: int):
    """Non-directional overlap matrix O [..., nreg, nreg+1].

    fu: [..., nreg] upper-layer region fractions;
    fl: [..., nreg+1] lower-layer fractions (last entry = exposed roof).
    Parity: radsurf/radsurf_overlap.F90:178-280, including the reference's
    nreg == 3 overhang quirk at radsurf_overlap.F90:271 where
    O(3,1) = O(1,2) (= 0) rather than O(2,1).
    """
    z = jnp.zeros(fu.shape[:-1], fu.dtype)
    if nreg == 1:
        o = jnp.stack([fl[..., 0], fl[..., 1]], axis=-1)
        return o[..., None, :]
    if nreg == 2:
        pc = jnp.maximum(fu[..., 1], fl[..., 1])
        no_overhang = pc <= fl[..., 0] + fl[..., 1]
        o11 = jnp.where(no_overhang, fl[..., 0] + fl[..., 1] - pc, z)
        o12 = jnp.where(no_overhang, pc - fu[..., 1], z)
        o13 = jnp.where(no_overhang, fl[..., 2], fu[..., 0])
        o21 = jnp.where(no_overhang, pc - fl[..., 1], fl[..., 0])
        o22 = jnp.where(no_overhang, fu[..., 1] + fl[..., 1] - pc, fl[..., 1])
        o23 = jnp.where(no_overhang, z, fu[..., 1] - fl[..., 0] - fl[..., 1])
        row1 = jnp.stack([o11, o12, o13], axis=-1)
        row2 = jnp.stack([o21, o22, o23], axis=-1)
        return jnp.stack([row1, row2], axis=-2)
    if nreg == 3:
        fu_veg = fu[..., 1] + fu[..., 2]
        fl_veg = fl[..., 1] + fl[..., 2]
        pc = jnp.maximum(fu_veg, fl_veg)
        no_overhang = pc <= fl[..., 0] + fl_veg
        more_lower = pc > fu_veg
        # --- no-overhang branch (radsurf_overlap.F90:237-258)
        a11 = fl[..., 0] + fl_veg - pc
        a14 = fl[..., 3]
        a21 = jnp.where(more_lower, z, fu[..., 1] - fl[..., 1])
        a31 = jnp.where(more_lower, z, fu[..., 2] - fl[..., 2])
        a22 = jnp.where(more_lower, fu[..., 1], fl[..., 1])
        a33 = jnp.where(more_lower, fu[..., 2], fl[..., 2])
        a12 = jnp.where(more_lower, fl[..., 1] - fu[..., 1], z)
        a13 = jnp.where(more_lower, fl[..., 2] - fu[..., 2], z)
        # --- overhang branch (radsurf_overlap.F90:259-277)
        b22 = fl[..., 1]
        b33 = fl[..., 2]
        b21 = fl[..., 0] * 0.5
        b31 = z  # reference quirk: O(3,1) = O(1,2) which is zero
        b24 = (fl[..., 3] - fu[..., 0]) * 0.5
        b34 = b24
        b14 = fu[..., 0]

        def sel(a, b):
            return jnp.where(no_overhang, a, b)

        row1 = jnp.stack([sel(a11, z), sel(a12, z), sel(a13, z), sel(a14, b14)], -1)
        row2 = jnp.stack([sel(a21, b21), sel(a22, b22), z, sel(z, b24)], -1)
        row3 = jnp.stack([sel(a31, b31), z, sel(a33, b33), sel(z, b34)], -1)
        return jnp.stack([row1, row2, row3], axis=-2)
    raise ValueError(f"nreg={nreg} not supported (must be 1, 2 or 3)")


def overlap_matrices_urban(frac, nreg: int, frac_threshold: float):
    """Directional overlap matrices at every interface above a layer.

    Args:
      frac: [..., nlay, nreg] region fractions of each layer (bottom-up,
        dz=0 padding layers have clear fraction 1... see note below).

    The padded layers above a column's real canopy must carry the free-
    atmosphere fractions [1, 0, ...] so that the interface at the real canopy
    top reproduces the reference's top-of-canopy overlap
    (radsurf_overlap.F90:341-346); `pad_fracs_free_atmosphere` does this.

    Returns (u_overlap [..., nlay, nreg, nreg+1],
             v_overlap [..., nlay, nreg+1, nreg]) where index l along the
    layer axis is the interface at the TOP of layer l.  The ground interface
    is not represented (the reference computes but never uses it).
    Parity: radsurf/radsurf_overlap.F90:289-394.
    """
    free_atm = jnp.zeros_like(frac[..., :1, :]).at[..., 0].set(1.0)
    frac_up = jnp.concatenate([frac[..., 1:, :], free_atm], axis=-2)

    sum_lower = frac.sum(-1)
    sum_upper = frac_up.sum(-1)
    roof = sum_upper - sum_lower
    overhang = roof < 0.0
    scale = jnp.where(
        overhang, sum_upper / jnp.where(sum_lower > 0.0, sum_lower, 1.0), 1.0
    )
    fl = jnp.concatenate(
        [frac * scale[..., None], jnp.maximum(roof, 0.0)[..., None]], axis=-1
    )

    o = _overlap_matrix_urban(frac_up, fl, nreg)  # [..., nlay, nreg, nreg+1]

    lower_ok = fl >= frac_threshold  # [..., nlay, nreg+1]
    upper_ok = frac_up >= frac_threshold  # [..., nlay, nreg]
    u_overlap = jnp.where(
        lower_ok[..., None, :],
        o / jnp.where(lower_ok, fl, 1.0)[..., None, :],
        0.0,
    )
    v_overlap = jnp.where(
        upper_ok[..., None, :],
        jnp.swapaxes(o, -1, -2) / jnp.where(upper_ok, frac_up, 1.0)[..., None, :],
        0.0,
    )
    return u_overlap, v_overlap
