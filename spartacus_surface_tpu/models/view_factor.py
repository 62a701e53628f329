"""View factors for the single-layer "simple urban" solvers.

Parity: radsurf/radsurf_view_factor.F90 (equation numbers refer to Hogan,
BLM 2019, "An exponential model of urban geometry").  Elementwise jnp,
batched over columns.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.constants import Pi

# 8-point quadrature over the cosine of zenith angle used by the exponential
# model (radsurf_view_factor.F90:85-95).
_EXP_WEIGHTS = np.array(
    [0.0506142681451884, 0.111190517226687, 0.156853322938944, 0.181341891689181,
     0.181341891689181, 0.156853322938944, 0.111190517226687, 0.0506142681451884]
)
_EXP_NODES = np.array(
    [0.0198550717512319, 0.101666761293187, 0.237233795041836, 0.408282678752175,
     0.591717321247825, 0.762766204958164, 0.898333238706813, 0.980144928248768]
)


def view_factors_inf(height_width_ratio, cos_sza=None):
    """Infinite-street view factors (radsurf_view_factor.F90:28-70).

    Returns (view_ground_sky, view_wall_wall[, view_dir_ground]).
    """
    h = height_width_ratio
    view_ground_sky = jnp.sqrt(h * h + 1.0) - h
    view_wall_wall = jnp.sqrt(1.0 / (h * h) + 1.0) - 1.0 / h
    if cos_sza is None:
        return view_ground_sky, view_wall_wall
    norm_x0 = (Pi * 0.5) * h * jnp.sqrt(1.0 / (cos_sza * cos_sza) - 1.0)
    y_over_w = jnp.sqrt(jnp.maximum(norm_x0 * norm_x0 - 1.0, 0.0))
    view_dir_ground = jnp.where(
        y_over_w > 0.0,
        (2.0 / Pi)
        * (y_over_w - norm_x0 + jnp.arctan(1.0 / jnp.where(y_over_w > 0.0, y_over_w, 1.0))),
        1.0 - 2.0 * norm_x0 / Pi,
    )
    return view_ground_sky, view_wall_wall, view_dir_ground


def view_factors_exp(height_separation_ratio, cos_sza=None):
    """Exponential-model view factors (radsurf_view_factor.F90:76-138).

    Eqs. 41/42 of Hogan (2019a); returns as view_factors_inf.
    """
    w = jnp.asarray(_EXP_WEIGHTS, dtype=jnp.result_type(height_separation_ratio))
    nodes = jnp.asarray(_EXP_NODES, dtype=w.dtype)
    hweight = w * nodes / jnp.sum(w * nodes)
    vweight = w * jnp.sqrt(1.0 - nodes * nodes)
    vweight = vweight / jnp.sum(vweight)

    tk = height_separation_ratio[..., None] * jnp.sqrt(1.0 / (nodes * nodes) - 1.0)
    exp_tk = jnp.exp(-tk)
    view_ground_sky = jnp.sum(hweight * exp_tk, axis=-1)
    view_wall_wall = 1.0 - jnp.sum(vweight * (1.0 - exp_tk) / tk, axis=-1)
    if cos_sza is None:
        return view_ground_sky, view_wall_wall
    norm_x0 = height_separation_ratio * jnp.sqrt(1.0 / (cos_sza * cos_sza) - 1.0)
    view_dir_ground = jnp.exp(-norm_x0)
    return view_ground_sky, view_wall_wall, view_dir_ground
