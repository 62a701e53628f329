"""Pallas TPU kernel for the per-layer operator factory.

Motivation: XLA stores batched small matrices [B, n, n] with the trailing
two dims padded to (8, 128) memory tiles — a ~10-16x HBM/bandwidth blowup
for n <= 24 — and lowers tiny batched matmuls poorly onto the MXU.  This
kernel flips the layout: the BATCH lives in the (8, 128) tile and the
matrix indices become the untiled leading axis, so every elementwise and
FMA op processes a full (8, 128) vector register of batch elements at 100%
lane utilization, and the entire expm -> extraction -> doubling -> Schur
chain stays resident in VMEM (one HBM read of the Gamma blocks, one HBM
write of the operators, zero intermediate traffic).

Layout: a matrix of shape (n, m) for a tile of 1024 batch elements is a
VMEM buffer of shape [n*m, 8, 128] (row-major rows, batch as (8, 128)).
The grid runs over batch tiles.

Algorithm identical to ops/layer_matrices.py (Pade-7 expm of the scaled
Gamma + 2^K adding-doubling + block-Schur inverse); outputs agree with the
XLA path to float32 rounding.  Enabled via SolverOptions.use_pallas_factory
or SPARTACUS_PALLAS=1; the XLA path remains the reference implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
TILE = LANES * SUBLANES  # batch elements per grid program

_PADE7_B = (17297280.0, 8648640.0, 1995840.0, 277200.0, 25200.0, 1512.0,
            56.0, 1.0)


def factory_scratch_bytes(nd: int, ndir: int, itemsize: int = 4) -> int:
    """Scratch VMEM footprint of the layer-factory kernel per batch tile.

    Calibrated against the compiler's scoped-vmem accounting: the in/out
    pipeline windows overlap the scratch allocation, so scratch rows alone
    track the reported usage (nd=8: ~8 MB fits; nd=12: 17.1 MB > the 16 MB
    limit).  Used by the solver's auto-enable heuristic."""
    N = 2 * nd + ndir
    rows = (
        4 * N * N + max(N * N, 3 * nd * ndir)
        + 4 * nd * nd + 4 * nd * ndir + 2 * ndir * ndir + 1
    )
    return rows * SUBLANES * LANES * itemsize


# ----------------------------------------------------------------------
# In-VMEM batched linear algebra on [rows, 8, 128] buffers
# ----------------------------------------------------------------------

def _matmul(out, a, b, n, p, m, accumulate=False, scale=None):
    """out(n x m) = a(n x p) @ b(p x m), all [rows, 8, 128] refs.

    Row-slab form: the inner op is a whole output row [m, 8, 128] at a
    time (scalar-block x row-slab FMA), so the loop issues n*p vector
    instructions instead of n*p*m — the kernel is VPU-issue-bound, not
    scalar-overhead-bound.  All offsets are static (Python loops)."""
    for i in range(n):
        acc = a[i * p] * b[pl.ds(0, m)]
        for k in range(1, p):
            acc = acc + a[i * p + k] * b[pl.ds(k * m, m)]
        if scale is not None:
            acc = acc * scale
        if accumulate:
            acc = out[pl.ds(i * m, m)] + acc
        out[pl.ds(i * m, m)] = acc


def _solve_inplace(a, rhs, n, m, scratch):
    """Pivot-free in-place solve: a(n x n) X = rhs(n x m); X overwrites rhs.

    `a` is DESTROYED.  `scratch` is an [1, 8, 128] buffer for reciprocals.
    Matches the reference's pivot-free LU (radtool_matrix.F90:982-1055).
    Row-slab form: eliminations/back-substitutions update whole rows of
    the trailing matrix and the RHS in single vector ops."""
    for k in range(n - 1):
        piv = 1.0 / a[k * n + k]
        w = n - k - 1
        arow = a[pl.ds(k * n + k + 1, w)]
        rrow = rhs[pl.ds(k * m, m)]
        for i in range(k + 1, n):
            f = a[i * n + k] * piv
            a[pl.ds(i * n + k + 1, w)] = a[pl.ds(i * n + k + 1, w)] - f * arow
            rhs[pl.ds(i * m, m)] = rhs[pl.ds(i * m, m)] - f * rrow

    # Back substitution
    for i in range(n - 1, -1, -1):
        acc = rhs[pl.ds(i * m, m)]
        for k in range(i + 1, n):
            acc = acc - a[i * n + k] * rhs[pl.ds(k * m, m)]
        rhs[pl.ds(i * m, m)] = acc * (1.0 / a[i * n + i])


def _copy(dst, src, rows):
    dst[pl.ds(0, rows)] = src[pl.ds(0, rows)]


def _eye_fill(buf, n, rec):
    """buf(n x n) = I (rows of [8,128] blocks)."""
    z = jnp.zeros_like(rec[0])
    o = z + 1.0
    for i in range(n):
        for j in range(n):
            buf[i * n + j] = o if i == j else z


def _schur_int_kernel(nd, ndir, int_direct, g0_ref, g1_ref, g2_ref, g3_ref,
                      idiff_out, idir_out, idirdiff_out, G, F, W1, W2, W3,
                      rec):
    """Block-Schur Gamma-inverse integral matrices, in VMEM
    (parity: radtool/radtool_schur.F90:45-51).

    Uses G/F/W1/W2/W3 as nd*nd workspaces (all >= nd*nd rows)."""

    # W2 = inv(g1):  W1 <- g1 (destroyed), W2 <- I
    _copy(W1, g1_ref, nd * nd)
    _eye_fill(W2, nd, rec)
    _solve_inplace(W1, W2, nd, nd, rec)
    # G <- inv(g1) @ g2 ; F <- g2 @ inv(g1)
    _matmul(G, W2, g2_ref, nd, nd, nd)
    _matmul(F, g2_ref, W2, nd, nd, nd)
    # W1 = g1 - g2 @ G  (Schur complement)
    for i in range(nd):
        acc = g1_ref[pl.ds(i * nd, nd)]
        for k in range(nd):
            acc = acc - g2_ref[i * nd + k] * G[pl.ds(k * nd, nd)]
        W1[pl.ds(i * nd, nd)] = acc
    # W3 = g1i = inv(W1)
    _eye_fill(W3, nd, rec)
    _solve_inplace(W1, W3, nd, nd, rec)
    # G <- g2i = g1i @ F ; int_diff = g2i - g1i
    _matmul(G, W3, F, nd, nd, nd)
    idiff_out[pl.ds(0, nd * nd)] = G[pl.ds(0, nd * nd)] - W3[pl.ds(0, nd * nd)]

    if int_direct:
        # W1 <- g0 (destroyed), W2 <- g0i = inv(g0); int_dir = -g0i
        _copy(W1, g0_ref, ndir * ndir)
        _eye_fill(W2, ndir, rec)
        _solve_inplace(W1, W2, ndir, ndir, rec)
        idir_out[pl.ds(0, ndir * ndir)] = -W2[pl.ds(0, ndir * ndir)]
        # F <- g3 @ g0i (nd x ndir); int_dir_diff = 2 (g1i - g2i) @ F
        for i in range(nd):
            acc = g3_ref[i * ndir] * W2[pl.ds(0, ndir)]
            for k in range(1, ndir):
                acc = acc + g3_ref[i * ndir + k] * W2[pl.ds(k * ndir, ndir)]
            F[pl.ds(i * ndir, ndir)] = acc
        for i in range(nd):
            acc = None
            for k in range(nd):
                t = (W3[i * nd + k] - G[i * nd + k]) * F[pl.ds(k * ndir, ndir)]
                acc = t if acc is None else acc + t
            idirdiff_out[pl.ds(i * ndir, ndir)] = 2.0 * acc
    else:
        z = jnp.zeros_like(rec[0])
        idir_out[pl.ds(0, ndir * ndir)] = jnp.broadcast_to(
            z, (ndir * ndir,) + z.shape
        )
        idirdiff_out[pl.ds(0, nd * ndir)] = jnp.broadcast_to(
            z, (nd * ndir,) + z.shape
        )


def _layer_kernel(nd, ndir, n_double, g0_ref, g1_ref, g2_ref, g3_ref,
                  dz_ref, r_out, t_out, e_out, sup_out, sdn_out,
                  G, F, W1, W2, W3, RT, SS, EE, rec):
    """One batch tile: expm + thin extraction + doubling.

    The scaling exponent K is chosen PER TILE from the max row-sum norm
    of Gamma*dz over the 1024 batch elements: K = ceil(log2(norm/theta)),
    clamped to [0, n_double] (so n_double is the maximum, matching the
    XLA path's fixed count).  Pade-7 truncation at theta = 2 is ~2e-11,
    far below f32 rounding, and thin layers skip most of the doubling
    loop (measured ~2 ms per doubling step per 128k layers on v5e).

    Scratch: G,F [N*N]; W1,W2,W3 [N*N] general workspaces; RT [4*nd*nd]
    (R, T and two temps); SS [4*nd*ndir]; EE [2*ndir*ndir]; rec [1].
    """
    N = 2 * nd + ndir
    scale_val = dz_ref[0]

    # ---- assemble scaled Gamma: [[-g1,-g2,-g3],[g2,g1,g3],[0,0,g0]]
    zrow = jnp.zeros_like(g1_ref[pl.ds(0, 2 * nd)])
    for i in range(nd):
        g1row = g1_ref[pl.ds(i * nd, nd)] * scale_val
        g2row = g2_ref[pl.ds(i * nd, nd)] * scale_val
        g3row = g3_ref[pl.ds(i * ndir, ndir)] * scale_val
        G[pl.ds(i * N, nd)] = -g1row
        G[pl.ds(i * N + nd, nd)] = -g2row
        G[pl.ds(i * N + 2 * nd, ndir)] = -g3row
        G[pl.ds((nd + i) * N, nd)] = g2row
        G[pl.ds((nd + i) * N + nd, nd)] = g1row
        G[pl.ds((nd + i) * N + 2 * nd, ndir)] = g3row
    for i in range(ndir):
        G[pl.ds((2 * nd + i) * N, 2 * nd)] = zrow
        G[pl.ds((2 * nd + i) * N + 2 * nd, ndir)] = (
            g0_ref[pl.ds(i * ndir, ndir)] * scale_val
        )

    # ---- norm-adaptive scaling: K from the tile-max row-sum norm
    theta = 2.0
    nrm = jnp.zeros_like(G[0])
    for i in range(N):
        nrm = jnp.maximum(
            nrm, jnp.sum(jnp.abs(G[pl.ds(i * N, N)]), axis=0)
        )
    nmax = jnp.max(nrm)
    n_K = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(nmax, 1e-30) / theta)),
        0, n_double,
    ).astype(jnp.int32)
    fac = jnp.exp2(-n_K.astype(nmax.dtype))

    G[pl.ds(0, N * N)] = G[pl.ds(0, N * N)] * fac

    # ---- Pade-7 expm: F = expm(G), 4 matmuls + 1 solve
    b = _PADE7_B
    _matmul(W1, G, G, N, N, N)          # W1 = A2
    _matmul(W2, W1, W1, N, N, N)        # W2 = A4
    _matmul(W3, W1, W2, N, N, N)        # W3 = A6
    # V first (even polynomial, needs all powers): F <- b6*A6+b4*A4+b2*A2+b0*I
    F[pl.ds(0, N * N)] = (b[6] * W3[pl.ds(0, N * N)]
                          + b[4] * W2[pl.ds(0, N * N)]
                          + b[2] * W1[pl.ds(0, N * N)])

    for i in range(N):
        F[i * N + i] = F[i * N + i] + b[0]
    # Odd polynomial inner part in-place over A6, then U = G @ it -> W2
    W3[pl.ds(0, N * N)] = (b[7] * W3[pl.ds(0, N * N)]
                           + b[5] * W2[pl.ds(0, N * N)]
                           + b[3] * W1[pl.ds(0, N * N)])

    for i in range(N):
        W3[i * N + i] = W3[i * N + i] + b[1]
    _matmul(W2, G, W3, N, N, N)         # W2 = U
    # (V - U) F = (V + U):  build V-U in W1, V+U in F (in place), solve
    W1[pl.ds(0, N * N)] = F[pl.ds(0, N * N)] - W2[pl.ds(0, N * N)]
    F[pl.ds(0, N * N)] = F[pl.ds(0, N * N)] + W2[pl.ds(0, N * N)]
    _solve_inplace(W1, F, N, N, rec)    # F = expm(G)

    # ---- thin-layer extraction
    # X = F11^-1 [F12 | F13]  (nd x (nd + ndir))
    m_x = nd + ndir

    for i in range(nd):
        W1[pl.ds(i * nd, nd)] = F[pl.ds(i * N, nd)]
        W2[pl.ds(i * m_x, m_x)] = F[pl.ds(i * N + nd, m_x)]
    _solve_inplace(W1, W2, nd, m_x, rec)  # W2 = X

    # R = -X[:, :nd]; Sup = -X[:, nd:]
    for i in range(nd):
        RT[pl.ds(i * nd, nd)] = -W2[pl.ds(i * m_x, nd)]
        SS[pl.ds(i * ndir, ndir)] = -W2[pl.ds(i * m_x + nd, ndir)]

    # T = F22 - F21 @ X1;  Sdn = F23 - F21 @ X2  (adjacent columns: one
    # m_x-wide row slab per i, split on store)
    off_t = nd * nd  # T offset in RT
    off_sdn = nd * ndir  # Sdn offset in SS

    for i in range(nd):
        acc = F[pl.ds((nd + i) * N + nd, m_x)]
        for k in range(nd):
            acc = acc - F[(nd + i) * N + k] * W2[pl.ds(k * m_x, m_x)]
        RT[pl.ds(off_t + i * nd, nd)] = acc[:nd]
        SS[pl.ds(off_sdn + i * ndir, ndir)] = acc[nd:]

    # E = F33
    for i in range(ndir):
        EE[pl.ds(i * ndir, ndir)] = F[pl.ds((2 * nd + i) * N + 2 * nd, ndir)]

    # ---- K doubling steps (combine layer with itself)
    # Buffers: RT = [R | T | Vt | tmp]; SS = [Sup | Sdn | S_mid | SupE];
    # EE = [E | E2]
    off_vt = 2 * nd * nd
    off_tmp = 3 * nd * nd
    off_smid = 2 * nd * ndir
    off_supe = 3 * nd * ndir
    off_e2 = ndir * ndir

    def _dbl_step(_step, _):
        # SupE = Sup @ E ; S_mid = Sdn + R @ SupE
        for i in range(nd):
            acc = SS[i * ndir] * EE[pl.ds(0, ndir)]
            for k in range(1, ndir):
                acc = acc + SS[i * ndir + k] * EE[pl.ds(k * ndir, ndir)]
            SS[pl.ds(off_supe + i * ndir, ndir)] = acc
        for i in range(nd):
            acc = SS[pl.ds(off_sdn + i * ndir, ndir)]
            for k in range(nd):
                acc = acc + RT[i * nd + k] * SS[pl.ds(off_supe + k * ndir, ndir)]
            SS[pl.ds(off_smid + i * ndir, ndir)] = acc

        # W1 = I - R@R ; RHS W2 = [T | S_mid]  (nd x (nd+ndir))
        for i in range(nd):
            acc = RT[i * nd] * RT[pl.ds(0, nd)]
            for k in range(1, nd):
                acc = acc + RT[i * nd + k] * RT[pl.ds(k * nd, nd)]
            W1[pl.ds(i * nd, nd)] = -acc
            W1[i * nd + i] = W1[i * nd + i] + 1.0
            W2[pl.ds(i * m_x, nd)] = RT[pl.ds(off_t + i * nd, nd)]
            W2[pl.ds(i * m_x + nd, ndir)] = SS[pl.ds(off_smid + i * ndir, ndir)]
        _solve_inplace(W1, W2, nd, m_x, rec)  # W2 = [Vt | Vs]

        # tmp = R @ [Vt | Vs] (+ SupE on the Vs part, for the Sup update)
        for i in range(nd):
            acc = RT[i * nd] * W2[pl.ds(0, m_x)]
            for k in range(1, nd):
                acc = acc + RT[i * nd + k] * W2[pl.ds(k * m_x, m_x)]
            RT[pl.ds(off_tmp + i * nd, nd)] = acc[:nd]  # R@Vt
            # R@Vs + SupE into W3 rows (reuse W3 as nd x ndir)
            W3[pl.ds(i * ndir, ndir)] = (
                acc[nd:] + SS[pl.ds(off_supe + i * ndir, ndir)]
            )

        # R_new = R + T @ (R@Vt);  Sup_new = Sup + T @ (R@Vs + SupE)
        # T_new = T @ Vt;          Sdn_new = T @ Vs + Sdn @ E
        for i in range(nd):
            acc_r = RT[pl.ds(i * nd, nd)]
            acc_t = None
            acc_up = SS[pl.ds(i * ndir, ndir)]
            for k in range(nd):
                tik = RT[off_t + i * nd + k]
                acc_r = acc_r + tik * RT[pl.ds(off_tmp + k * nd, nd)]
                tv = tik * W2[pl.ds(k * m_x, m_x)]
                acc_t = tv if acc_t is None else acc_t + tv
                acc_up = acc_up + tik * W3[pl.ds(k * ndir, ndir)]
            acc_dn = acc_t[nd:]
            for k in range(ndir):
                acc_dn = acc_dn + (
                    SS[off_sdn + i * ndir + k] * EE[pl.ds(k * ndir, ndir)]
                )
            # stash new operators in W1 (R), F (T), W3 upper regions
            W1[pl.ds(i * nd, nd)] = acc_r
            F[pl.ds(i * nd, nd)] = acc_t[:nd]
            W3[pl.ds(nd * ndir + i * ndir, ndir)] = acc_up
            W3[pl.ds(2 * nd * ndir + i * ndir, ndir)] = acc_dn

        # E_new = E @ E
        for i in range(ndir):
            acc = EE[i * ndir] * EE[pl.ds(0, ndir)]
            for k in range(1, ndir):
                acc = acc + EE[i * ndir + k] * EE[pl.ds(k * ndir, ndir)]
            EE[pl.ds(off_e2 + i * ndir, ndir)] = acc

        # commit
        RT[pl.ds(0, nd * nd)] = W1[pl.ds(0, nd * nd)]
        RT[pl.ds(off_t, nd * nd)] = F[pl.ds(0, nd * nd)]
        SS[pl.ds(0, nd * ndir)] = W3[pl.ds(nd * ndir, nd * ndir)]
        SS[pl.ds(off_sdn, nd * ndir)] = W3[pl.ds(2 * nd * ndir, nd * ndir)]
        EE[pl.ds(0, ndir * ndir)] = EE[pl.ds(off_e2, ndir * ndir)]
        return 0

    jax.lax.fori_loop(0, n_K, _dbl_step, 0)

    # ---- write outputs
    _copy(r_out, RT, nd * nd)
    t_out[pl.ds(0, nd * nd)] = RT[pl.ds(off_t, nd * nd)]
    _copy(e_out, EE, ndir * ndir)
    _copy(sup_out, SS, nd * ndir)
    sdn_out[pl.ds(0, nd * ndir)] = SS[pl.ds(off_sdn, nd * ndir)]


@functools.partial(
    jax.jit,
    static_argnames=("nd", "ndir", "n_double", "interpret", "with_int",
                     "int_direct"),
)
def pallas_layer_thin_double(gamma0, gamma1, gamma2, gamma3, dz, *,
                             nd: int, ndir: int, n_double: int = 12,
                             interpret: bool = False, with_int: bool = False,
                             int_direct: bool = True):
    """R/T/E/Sup/Sdn (+ optional Schur integral matrices) via the Pallas
    factory.

    Inputs flattened+batched: gamma1/gamma2 [B, nd*nd], gamma3 [B, nd*ndir],
    gamma0 [B, ndir*ndir], dz [B].  B must be a multiple of 1024.
    Returns dict of flattened outputs [B, n*m].
    """
    B = gamma1.shape[0]
    assert B % TILE == 0, f"batch {B} not a multiple of {TILE}"
    nb = B // TILE
    N = 2 * nd + ndir
    dtype = gamma1.dtype

    def resh(x, rows):
        # [B, rows] -> [nb, rows, 8, 128]
        return (
            x.reshape(nb, SUBLANES, LANES, rows)
            .transpose(0, 3, 1, 2)
        )

    def unresh(y, rows):
        # [nb, rows, 8, 128] -> [B, rows]
        return y.transpose(0, 2, 3, 1).reshape(B, rows)

    args = (
        resh(gamma0, ndir * ndir),
        resh(gamma1, nd * nd),
        resh(gamma2, nd * nd),
        resh(gamma3, nd * ndir),
        resh(dz[:, None], 1),
    )

    names = ["R", "T", "E", "Sup", "Sdn"]
    rows_list = [nd * nd, nd * nd, ndir * ndir, nd * ndir, nd * ndir]
    if with_int:
        names += ["int_diff", "int_dir", "int_dir_diff"]
        rows_list += [nd * nd, ndir * ndir, nd * ndir]

    out_shapes = [
        jax.ShapeDtypeStruct((nb, rows, SUBLANES, LANES), dtype)
        for rows in rows_list
    ]

    def spec(rows):
        # Leading grid dim squeezed out of the in-kernel ref shape
        return pl.BlockSpec((None, rows, SUBLANES, LANES),
                            lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    scratch = [
        pltpu.VMEM((N * N, SUBLANES, LANES), dtype),  # G
        pltpu.VMEM((N * N, SUBLANES, LANES), dtype),  # F
        pltpu.VMEM((N * N, SUBLANES, LANES), dtype),  # W1
        pltpu.VMEM((N * N, SUBLANES, LANES), dtype),  # W2
        pltpu.VMEM((max(N * N, 3 * nd * ndir), SUBLANES, LANES), dtype),  # W3
        pltpu.VMEM((4 * nd * nd, SUBLANES, LANES), dtype),  # RT
        pltpu.VMEM((4 * nd * ndir, SUBLANES, LANES), dtype),  # SS
        pltpu.VMEM((2 * ndir * ndir, SUBLANES, LANES), dtype),  # EE
        pltpu.VMEM((1, SUBLANES, LANES), dtype),  # rec
    ]

    def kernel(g0r, g1r, g2r, g3r, dzr, *rest):
        outs_refs = rest[: len(rows_list)]
        G, F, W1, W2, W3, RT, SS, EE, rec = rest[len(rows_list):]
        ro, to, eo, supo, sdno = outs_refs[:5]
        _layer_kernel(
            nd, ndir, n_double,
            g0r, g1r, g2r, g3r, dzr,
            ro, to, eo, supo, sdno,
            G, F, W1, W2, W3, RT, SS, EE, rec,
        )
        if with_int:
            idiff, idir, idd = outs_refs[5:]
            _schur_int_kernel(
                nd, ndir, int_direct, g0r, g1r, g2r, g3r,
                idiff, idir, idd, G, F, W1, W2, W3, rec,
            )

    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            spec(ndir * ndir), spec(nd * nd), spec(nd * nd),
            spec(nd * ndir), spec(1),
        ],
        out_specs=tuple(spec(rows) for rows in rows_list),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)

    return {k: unresh(v, r) for k, v, r in zip(names, outs, rows_list)}


def pallas_layer_matrices(gamma0, gamma1, gamma2, gamma3, dz, *,
                          n_double: int = 12, with_int: bool = True,
                          int_direct: bool = True,
                          interpret: bool | None = None):
    """Drop-in replacement for ops.layer_matrices.layer_matrices, fully
    in-kernel (expm + doubling + block-Schur integral matrices).  Accepts
    the same [..., n, m] batched inputs; the batch is flattened and padded
    to a multiple of the kernel tile with identity layers
    (gamma = -I, dz = 0 => F = I)."""
    if interpret is None:
        # Mosaic needs a real TPU; fall back to the interpreter elsewhere
        interpret = jax.default_backend() != "tpu"
    batch_shape = gamma1.shape[:-2]
    nd = gamma1.shape[-1]
    ndir = gamma0.shape[-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    dtype = gamma1.dtype

    pad = (-B) % TILE
    def prep(x, n, m):
        flat = jnp.reshape(x, (B, n * m))
        if pad:
            eye = jnp.broadcast_to(
                (-jnp.eye(n, m, dtype=dtype)).reshape(1, n * m),
                (pad, n * m),
            )
            flat = jnp.concatenate([flat, eye], axis=0)
        return flat

    dz_flat = jnp.reshape(jnp.broadcast_to(dz, batch_shape), (B,))
    if pad:
        dz_flat = jnp.concatenate(
            [dz_flat, jnp.zeros((pad,), dtype)], axis=0
        )
    out = pallas_layer_thin_double(
        prep(gamma0, ndir, ndir), prep(gamma1, nd, nd),
        prep(gamma2, nd, nd), prep(gamma3, nd, ndir), dz_flat,
        nd=nd, ndir=ndir, n_double=n_double, interpret=interpret,
        with_int=with_int, int_direct=int_direct,
    )
    shapes = {"R": (nd, nd), "T": (nd, nd), "E": (ndir, ndir),
              "Sup": (nd, ndir), "Sdn": (nd, ndir)}
    if with_int:
        shapes.update({"int_diff": (nd, nd), "int_dir": (ndir, ndir),
                       "int_dir_diff": (nd, ndir)})
    lay = {
        key: out[key][:B].reshape(batch_shape + nm)
        for key, nm in shapes.items()
    }
    if with_int and not int_direct:
        lay.pop("int_dir")
        lay.pop("int_dir_diff")
    return lay


def pallas_lw_layer_matrices(gamma1, gamma2, emiss_rate, dz, *,
                             n_double: int = 12, interpret: bool | None = None):
    """Drop-in replacement for ops.layer_matrices.lw_layer_matrices: the
    emission pseudo-beam (ndir=1, gamma0=0, gamma3=b) runs through the
    Pallas factory, including the in-kernel int_diff (the direct-beam
    integrals are skipped: gamma0 = 0 is singular)."""
    batch_shape = gamma1.shape[:-2]
    gamma0 = jnp.zeros(batch_shape + (1, 1), gamma1.dtype)
    gamma3 = emiss_rate[..., :, None]
    lay = pallas_layer_matrices(
        gamma0, gamma1, gamma2, gamma3, dz,
        n_double=n_double, with_int=True, int_direct=False,
        interpret=interpret,
    )
    p = 0.5 * (lay["Sup"][..., 0] + lay["Sdn"][..., 0])
    int_source = 2.0 * jnp.einsum(
        "...nk,...k->...n", lay["int_diff"], emiss_rate,
        precision="highest",
    ) * jnp.asarray(dz, gamma1.dtype)[..., None]
    return {"R": lay["R"], "T": lay["T"], "p": p,
            "int_diff": lay["int_diff"], "int_source": int_source}
