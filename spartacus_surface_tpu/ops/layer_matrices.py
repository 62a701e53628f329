"""Per-layer reflectance/transmittance/source factory — the hot kernel.

This is the TPU-native replacement for the reference's eigen-decomposition
route (radtool/radtool_calc_matrices_sw_eig.F90:30-298,
radtool_calc_matrices_lw_eig.F90:32-230, radtool_eigen_decomposition.F90):
instead of a branch-heavy batched QR eigensolver, we use a fully branch-free
algorithm built only from batched matmuls and pivot-free LU solves:

  1. Assemble the full two-point boundary-value Gamma matrix
         Gamma = [ -g1  -g2  -g3 ]
                 [ +g2  +g1  +g3 ]
                 [   0    0   g0 ]
     (structure documented at radtool_calc_matrices_sw_eig.F90:62-66), with
     the state x = [u; v; s] (upwelling diffuse, downwelling diffuse, scaled
     direct) and dx/dz = Gamma x, z measured downward from layer top.
  2. Compute F = expm(Gamma * dz * 2**-K) with a diagonal Pade-7 approximant
     (pre-scaled far inside its convergence region).
  3. Extract the thin-layer operators from the blocks of F:
         E   = F33                        (direct transmittance)
         R   = -F11^-1 F12                (diffuse reflectance)
         T   =  F22 - F21 F11^-1 F12      (diffuse transmittance)
         Sup = -F11^-1 F13                (direct -> up-diffuse out of top)
         Sdn =  F23 - F21 F11^-1 F13      (direct -> down-diffuse out of base)
     following from the boundary conditions v(0)=v_top, s(0)=s_top, u(dz)=0.
  4. Apply K adding-method doubling steps (each: one multi-RHS solve plus a
     handful of matmuls, all bounded quantities) to reach the full layer
     thickness unconditionally stably — growing exponential modes never
     appear, unlike a naive expm of the unscaled Gamma.

The longwave emission source is the SAME kernel: a constant emission-rate
vector b enters the ODE as dx/dz = Gamma_d x + [-b; b], which is exactly a
direct "beam" with ndir=1, gamma0=0, gamma3=b and unit s.  Then
p = Sup = Sdn is the reference's "source" vector p
(radtool_calc_matrices_lw_eig.F90:200-211).

Absorption integrals use the block-Schur inverse of Gamma
(radtool/radtool_schur.F90:32-53): with flux convergence conv and direct
convergence s_conv into the layer,

    int (u+v) dz = int_diff @ conv + int_dir_diff @ s_conv   [+ emission term]
    int  s    dz = int_dir  @ s_conv

with int_diff = g2i - g1i, int_dir = -g0i, int_dir_diff = 2 g3i
(radtool_calc_matrices_sw_eig.F90:289-296).  The longwave emission term is
2 * int_diff @ b * dz (equivalent to int_flux_source of
radtool_calc_matrices_lw_eig.F90:213-228, re-expressed in convergence form).

Everything is batched over arbitrary leading dims (columns x layers x
spectral intervals) — this is where the TPU earns its keep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .matrix import expm_pade7, inv, matmul, solve

# Pade-7 scaling thresholds for the norm-adaptive expm: K =
# ceil(log2(||Gamma dz||_inf / theta)), PER WORKING PRECISION.  3.92 is
# Higham's single-precision theta_7 (truncation ~6e-8 at the boundary,
# i.e. at f32 rounding; a smaller theta buys accuracy f32 cannot carry at
# the cost of one extra doubling step per element — ~12% of factory FLOPs
# at nd=12).  The f64 path keeps theta = 2 (truncation ~2e-11) because it
# doubles as the accuracy oracle and the reference-grade CLI path.  The
# Pallas kernels use the same dtype-dependent choice, so within one
# precision ALL paths pick the SAME K per element and agree to plain
# rounding.
PADE7_THETA_F32 = 3.9
PADE7_THETA_F64 = 2.0


def pade7_theta(dtype) -> float:
    """Scaling threshold for the given working dtype."""
    return (
        PADE7_THETA_F32 if jnp.dtype(dtype) == jnp.dtype(jnp.float32)
        else PADE7_THETA_F64
    )


def combine_layers(top: dict, bot: dict) -> dict:
    """Adding method: stack layer `top` above layer `bot`.

    Both are dicts with R, T [..., nd, nd]; E [..., ndir, ndir];
    Sup, Sdn [..., nd, ndir].  Diffuse R and T are direction-symmetric
    (guaranteed by the [[ -g1, -g2 ], [ g2, g1 ]] block symmetry; the
    reference relies on the same property in its adding sweeps, e.g.
    radsurf/radsurf_forest_sw.F90:479-504).
    """
    R1, T1, E1, S1u, S1d = top["R"], top["T"], top["E"], top["Sup"], top["Sdn"]
    R2, T2, E2, S2u, S2d = bot["R"], bot["T"], bot["E"], bot["Sup"], bot["Sdn"]
    nd = R1.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(nd, dtype=R1.dtype), R1.shape)

    s2u_e1 = matmul(S2u, E1)
    s_mid = S1d + matmul(R1, s2u_e1)
    # One LU shared between the transmission and source right-hand sides
    vt_vs = solve(eye - matmul(R1, R2), jnp.concatenate([T1, s_mid], axis=-1))
    vt = vt_vs[..., :nd]
    vs = vt_vs[..., nd:]

    return {
        "R": R1 + matmul(T1, matmul(R2, vt)),
        "T": matmul(T2, vt),
        "E": matmul(E2, E1),
        "Sup": S1u + matmul(T1, matmul(R2, vs) + s2u_e1),
        "Sdn": matmul(T2, vs) + matmul(S2d, E1),
    }


@functools.partial(
    jax.jit, static_argnames=("n_double", "with_int", "int_direct")
)
def layer_matrices(
    gamma0,
    gamma1,
    gamma2,
    gamma3,
    dz,
    *,
    n_double: int = 30,
    with_int: bool = True,
    int_direct: bool = True,
) -> dict:
    """Compute the per-layer operators for a batch of layers.

    Args:
      gamma0: [..., ndir, ndir] direct-beam exchange/extinction matrix.
      gamma1: [..., nd, nd] diffuse diagonal-block matrix (incl. +gamma2).
      gamma2: [..., nd, nd] diffuse cross-hemisphere scattering matrix.
      gamma3: [..., nd, ndir] direct -> diffuse scattering matrix.
      dz: [...] layer thickness (0 => exact identity layer; used for padding).
      n_double: number of doubling steps K; handles per-layer diffuse optical
        thickness up to ~0.5 * 2**K at full accuracy.
      with_int: also return the absorption-integral matrices.
      int_direct: include the direct-beam integral matrices (False for
        longwave, where gamma0 = 0 is singular).

    Returns dict with R, T, E, Sup, Sdn [+ int_diff, int_dir, int_dir_diff].
    """
    gamma0 = jnp.asarray(gamma0)
    gamma1 = jnp.asarray(gamma1)
    gamma2 = jnp.asarray(gamma2)
    gamma3 = jnp.asarray(gamma3)
    nd = gamma1.shape[-1]
    ndir = gamma0.shape[-1]
    dz = jnp.asarray(dz, dtype=gamma1.dtype)

    z_dir = jnp.zeros(gamma0.shape[:-2] + (ndir, 2 * nd), dtype=gamma1.dtype)
    g_dz = jnp.concatenate(
        [
            jnp.concatenate([-gamma1, -gamma2, -gamma3], axis=-1),
            jnp.concatenate([gamma2, gamma1, gamma3], axis=-1),
            jnp.concatenate([z_dir, gamma0], axis=-1),
        ],
        axis=-2,
    ) * dz[..., None, None]

    # Norm-adaptive scaling, per batch element (same policy as the Pallas
    # kernel): K = ceil(log2(||Gamma dz||_inf / theta)) clipped to
    # [0, n_double].  A fixed K = n_double (the pre-round-3 behaviour)
    # over-scales thin layers and the extra doublings amplify f32 rounding
    # ~40x (measured: T/E error 6.9e-4 fixed vs 1.6e-5 adaptive against an
    # f64 oracle on RAMI-like gammas); adaptive scaling is both the more
    # accurate and the cheaper choice.  theta is precision-dependent (see
    # pade7_theta above).
    theta = pade7_theta(gamma1.dtype)
    nrm = jnp.max(jnp.sum(jnp.abs(g_dz), axis=-1), axis=-1)
    n_k = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(nrm, 1e-30) / theta)), 0, n_double
    )
    g = g_dz * jnp.exp2(-n_k)[..., None, None]

    f = expm_pade7(g)
    f11 = f[..., :nd, :nd]
    f12 = f[..., :nd, nd : 2 * nd]
    f13 = f[..., :nd, 2 * nd :]
    f21 = f[..., nd : 2 * nd, :nd]
    f22 = f[..., nd : 2 * nd, nd : 2 * nd]
    f23 = f[..., nd : 2 * nd, 2 * nd :]
    f33 = f[..., 2 * nd :, 2 * nd :]

    x = solve(f11, jnp.concatenate([f12, f13], axis=-1))
    x1 = x[..., :nd]
    x2 = x[..., nd:]
    lay = {
        "R": -x1,
        "T": f22 - matmul(f21, x1),
        "E": f33,
        "Sup": -x2,
        "Sdn": f23 - matmul(f21, x2),
    }

    # Per-element doubling count: n_double steps with a masked commit
    # (j >= K leaves the element unchanged).  The bound stays static so the
    # loop lowers to a scan and remains reverse-mode differentiable (this
    # path is the custom_vjp backward for the Pallas kernels).
    def _dbl(j, lay_j):
        new = combine_layers(lay_j, lay_j)
        m = (j < n_k)[..., None, None]
        return {key: jnp.where(m, new[key], lay_j[key]) for key in lay_j}

    lay = jax.lax.fori_loop(0, n_double, _dbl, lay)

    if with_int:
        # Block-Schur inverse of the unscaled Gamma
        # (parity: radtool/radtool_schur.F90:45-51).
        g1_inv_g2 = solve(gamma1, gamma2)
        g1i = inv(gamma1 - matmul(gamma2, g1_inv_g2))
        g2i = matmul(g1i, matmul(gamma2, inv(gamma1)))
        lay["int_diff"] = g2i - g1i
        if int_direct:
            g0i = inv(gamma0)
            g3i = matmul(g1i - g2i, matmul(gamma3, g0i))
            lay["int_dir"] = -g0i
            lay["int_dir_diff"] = 2.0 * g3i
    return lay


@functools.partial(jax.jit, static_argnames=("n_double",))
def lw_layer_matrices(gamma1, gamma2, emiss_rate, dz, *, n_double: int = 30) -> dict:
    """Longwave wrapper: emission as a unit pseudo-beam.

    Args:
      emiss_rate: [..., nd] emission rate per unit height ("b" in Eq. 32 of
        Hogan 2019; assembled in radsurf/radsurf_forest_lw.F90:376-395).

    Returns dict with R, T, source p [..., nd], int_diff, int_source
    (the emission part of the integrated flux, = 2 * int_diff @ b * dz).
    """
    gamma1 = jnp.asarray(gamma1)
    gamma2 = jnp.asarray(gamma2)
    emiss_rate = jnp.asarray(emiss_rate)
    gamma0 = jnp.zeros(gamma1.shape[:-2] + (1, 1), dtype=gamma1.dtype)
    gamma3 = emiss_rate[..., :, None]
    lay = layer_matrices(
        gamma0, gamma1, gamma2, gamma3, dz,
        n_double=n_double, with_int=True, int_direct=False,
    )
    # Sup == Sdn analytically (symmetry of the diffuse blocks); average to
    # symmetrize roundoff.
    p = 0.5 * (lay["Sup"][..., 0] + lay["Sdn"][..., 0])
    int_source = 2.0 * jnp.einsum(
        "...nk,...k->...n", lay["int_diff"], emiss_rate, precision="highest"
    ) * jnp.asarray(dz, gamma1.dtype)[..., None]
    return {
        "R": lay["R"],
        "T": lay["T"],
        "p": p,
        "int_diff": lay["int_diff"],
        "int_source": int_source,
    }
