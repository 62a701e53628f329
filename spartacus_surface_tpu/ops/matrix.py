"""Batched small-matrix algebra for the SPARTACUS layer kernels.

TPU-native replacement for the reference's hand-written batched matrix
library (radtool/radtool_matrix.F90).  All operations act on arrays shaped
[..., n, m] with arbitrary leading batch dimensions (the reference instead
carries the batch innermost for CPU SIMD, radtool_matrix.F90:20-24; on TPU we
keep the batch leading and let XLA tile it across lanes, with a Pallas path
for the hot composite kernel in ops/layer_matrices.py).

The LU solver is pivot-free by design, matching the reference's choice
(radtool_matrix.F90:982-1015): the SPARTACUS matrices are diagonally dominant
by construction, and a pivot-free unrolled elimination is branch-free, which
is exactly what the TPU VPU wants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def matmul(a, b):
    """Batched matrix product: [..., n, k] @ [..., k, m]."""
    return jnp.matmul(a, b, precision="highest")


def matvec(a, x):
    """Batched matrix-vector product: [..., n, k] @ [..., k]."""
    return jnp.einsum("...nk,...k->...n", a, x, precision="highest")


def _lu_factor_nopiv(a):
    """Doolittle LU without pivoting, unrolled over the (static) order.

    Returns the combined LU matrix (unit lower triangle implicit).
    Parity: radtool/radtool_matrix.F90:982-1015 (lu_factorization).
    """
    n = a.shape[-1]
    for k in range(n - 1):
        inv_piv = 1.0 / a[..., k, k]
        col = a[..., k + 1 :, k] * inv_piv[..., None]  # multipliers
        a = a.at[..., k + 1 :, k].set(col)
        a = a.at[..., k + 1 :, k + 1 :].add(
            -col[..., :, None] * a[..., k : k + 1, k + 1 :]
        )
    return a


def _lu_solve_nopiv(lu, b):
    """Solve with a factored LU; b is [..., n, m].

    Parity: radtool/radtool_matrix.F90:1024-1055 (lu_substitution).
    """
    n = lu.shape[-1]
    # Forward substitution (unit lower)
    for i in range(1, n):
        b = b.at[..., i, :].add(
            -jnp.einsum(
                "...k,...km->...m", lu[..., i, :i], b[..., :i, :], precision="highest"
            )
        )
    # Back substitution
    b = b.at[..., n - 1, :].multiply(1.0 / lu[..., n - 1, n - 1][..., None])
    for i in range(n - 2, -1, -1):
        rhs = b[..., i, :] - jnp.einsum(
            "...k,...km->...m", lu[..., i, i + 1 :], b[..., i + 1 :, :],
            precision="highest",
        )
        b = b.at[..., i, :].set(rhs / lu[..., i, i][..., None])
    return b


@jax.jit
def solve(a, b):
    """Batched solve a @ x = b.

    a: [..., n, n]; b: [..., n, m] (matrix RHS) or [..., n] (vector RHS).

    On TPU this uses the pivot-free unrolled elimination matching the
    reference's deliberate choice (the SPARTACUS matrices are diagonally
    dominant; radtool_matrix.F90:982-1015) — branch-free and VPU-friendly.
    On CPU (tests, development) it defers to LAPACK via jnp.linalg.solve,
    which compiles orders of magnitude faster; pivoting only ever improves
    accuracy.
    Parity: solve_mat/solve_vec dispatchers radtool/radtool_matrix.F90:1119-1199.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    vector = b.ndim == a.ndim - 1
    if vector:
        b = b[..., None]
    if a.shape[-1] == 1:
        x = b / a[..., :, :1]
    elif a.shape[-1] == 2:
        x = _solve2(a, b)
    elif jax.default_backend() == "cpu":
        x = jnp.linalg.solve(a, b)
    else:
        lu = _lu_factor_nopiv(a)
        x = _lu_solve_nopiv(lu, b)
    return x[..., 0] if vector else x


def _solve2(a, b):
    """Cramer 2x2 solve (parity: radtool_matrix.F90:779-825)."""
    det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    inv_det = (1.0 / det)[..., None]
    x0 = (a[..., 1, 1][..., None] * b[..., 0, :] - a[..., 0, 1][..., None] * b[..., 1, :])
    x1 = (a[..., 0, 0][..., None] * b[..., 1, :] - a[..., 1, 0][..., None] * b[..., 0, :])
    return jnp.stack([x0 * inv_det, x1 * inv_det], axis=-2)


def inv(a):
    """Batched inverse via the pivot-free LU (radtool_matrix.F90:1057-1116)."""
    a = jnp.asarray(a)
    n = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    return solve(a, eye)


def identity_like(a):
    n = a.shape[-1]
    return jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)


# Pade-7 numerator coefficients (as in the diagonal Pade approximant used for
# scaling-and-squaring matrix exponentials; cf. the reference's Pade-7 expm at
# radtool/radtool_matrix.F90:1246-1344).  Valid to machine precision for
# ||A|| <~ 0.95; the layer kernel pre-scales far below that.
_PADE7_B = (17297280.0, 8648640.0, 1995840.0, 277200.0, 25200.0, 1512.0, 56.0, 1.0)


@jax.jit
def expm_pade7(a):
    """Batched matrix exponential, diagonal Pade [7/7], NO scaling/squaring.

    The caller must pre-scale so that ||a|| is small (the layer kernel scales
    by dz * 2**-n_double).  Cost: 4 matmuls + 1 multi-RHS solve.
    """
    a = jnp.asarray(a)
    b = _PADE7_B
    n = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    a2 = matmul(a, a)
    a4 = matmul(a2, a2)
    a6 = matmul(a2, a4)
    u = matmul(a, b[7] * a6 + b[5] * a4 + b[3] * a2 + b[1] * eye)
    v = b[6] * a6 + b[4] * a4 + b[2] * a2 + b[0] * eye
    return solve(v - u, v + u)


@functools.lru_cache(maxsize=None)
def _eye(n, dtype_name):
    return jnp.eye(n, dtype=dtype_name)
