"""Pallas TPU kernels for the adding-method up-sweep and flux down-sweeps.

Same batch-in-lanes layout as ops/pallas_layer.py: a small matrix (n, m)
for a tile of 1024 batch elements is a VMEM buffer of [n*m, 8, 128] rows,
so every FMA processes a full (8, 128) register of batch elements.  The
layer recurrences (radsurf_urban_sw.F90:590-654 up; :676-1001 down;
radsurf_urban_lw.F90:567-627 up; :639-858 down) run with the carry held in
VMEM scratch across a sequential grid over (batch tile, layer): Pallas TPU
executes the grid in order, so scratch persists layer to layer and the HBM
working set is one layer's operators at a time.

Differences from the XLA scan path (models/solver.py), both exact:
  * the up-sweep emits inv(I - a_above R) instead of the denominator, so
    the down-sweeps need no solves (pure matvecs);
  * the clear-sky direct recurrence + sunlit fractions (per-column [C, L]
    scalars, radsurf_urban_sw.F90:804-848) stay OUTSIDE the kernel as
    closed-form cumulative products (models/solver.py kernel path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_layer import LANES, SUBLANES, TILE, _View


# ----------------------------------------------------------------------
# Offset-addressed in-VMEM batched linear algebra on [rows, 8, 128] refs
# ----------------------------------------------------------------------

def _mm(out, ob, a, ab, b, bb, n, p, m, *, ostride=None, bstride=None,
        accumulate=False, eye_minus=False):
    """out[ob + i*ostride + j] (+)= sum_k a[ab+i*p+k] * b[bb+k*bstride+j]
    for the (n x m) result of an (n x p) @ (p x m) product.  eye_minus
    instead writes I - A@B (n == m).

    Row-slab form (see ops/pallas_layer._matmul): one [m, 8, 128] output
    row per inner op, static offsets."""
    ostride = m if ostride is None else ostride
    bstride = m if bstride is None else bstride

    for i in range(n):
        acc = a[ab + i * p] * b[pl.ds(bb, m)]
        for k in range(1, p):
            acc = acc + a[ab + i * p + k] * b[pl.ds(bb + k * bstride, m)]
        if eye_minus:
            acc = -acc
        elif accumulate:
            acc = out[pl.ds(ob + i * ostride, m)] + acc
        out[pl.ds(ob + i * ostride, m)] = acc
        if eye_minus:
            out[ob + i * ostride + i] = out[ob + i * ostride + i] + 1.0


def _mv(out, ob, a, ab, x, xb, n, p, *, accumulate=False):
    """out[ob + i] (+)= sum_k a[ab + i*p + k] * x[xb + k].

    Contraction form: elementwise row-slab product + axis-0 reduction."""
    xs = x[pl.ds(xb, p)]
    for i in range(n):
        acc = jnp.sum(a[pl.ds(ab + i * p, p)] * xs, axis=0)
        if accumulate:
            acc = out[ob + i] + acc
        out[ob + i] = acc


def _solve_off(a, ab, rhs, rb, n, m, rec):
    """Pivot-free in-place solve a(n x n) X = rhs(n x m) at row offsets;
    `a` destroyed, X overwrites rhs (cf. radtool_matrix.F90:982-1055).
    Row-slab form."""
    for k in range(n - 1):
        piv = 1.0 / a[ab + k * n + k]
        w = n - k - 1
        arow = a[pl.ds(ab + k * n + k + 1, w)]
        rrow = rhs[pl.ds(rb + k * m, m)]
        for i in range(k + 1, n):
            f = a[ab + i * n + k] * piv
            a[pl.ds(ab + i * n + k + 1, w)] = (
                a[pl.ds(ab + i * n + k + 1, w)] - f * arow
            )
            rhs[pl.ds(rb + i * m, m)] = rhs[pl.ds(rb + i * m, m)] - f * rrow

    for i in range(n - 1, -1, -1):
        acc = rhs[pl.ds(rb + i * m, m)]
        for k in range(i + 1, n):
            acc = acc - a[ab + i * n + k] * rhs[pl.ds(rb + k * m, m)]
        rhs[pl.ds(rb + i * m, m)] = acc * (1.0 / a[ab + i * n + i])


def _cp(dst, db, src, sb, rows):
    dst[pl.ds(db, rows)] = src[pl.ds(sb, rows)]


def _zero(dst, db, rows, zlike):
    z = jnp.zeros_like(zlike[0])
    dst[pl.ds(db, rows)] = jnp.broadcast_to(z, (rows,) + z.shape)


# ----------------------------------------------------------------------
# Shortwave up-sweep (radsurf_urban_sw.F90:590-674)
# ----------------------------------------------------------------------

def _sw_up_kernel(nd, ns, nreg, nlay, hw,
                  R, T, E, Sup, Sdn, uov, vov, ralb, ralbd, grd,
                  stacks, top,
                  AA, DA, W1, RHS, TMP, TMPD, rec):
    nregp = nreg + 1
    nd2 = nregp * ns
    mtot = 2 * nd + nreg
    l = pl.program_id(1)
    # Stack row offsets: [a_above | d_above | inv_denom | a_below | d_below]
    s_aa = 0
    s_da = nd * nd
    s_inv = s_da + nd * nreg
    s_ab = s_inv + nd * nd
    s_db = s_ab + nd2 * nd2

    @pl.when(l == 0)
    def _init():
        # Ground operators (radsurf_urban_sw.F90:593-602):
        # a_ground[(r,n),(r2,m)] = albedo * hw[m] * (r == r2)
        # d_ground[(r,n),r2]     = mu0 * albedo_dir * hw[n] * (r == r2)
        z = jnp.zeros_like(grd[0])
        for i in range(nd):
            for j in range(nd):
                if i // ns == j // ns:
                    # a_ground(to, fr) = albedo * hweight(to)
                    # (radsurf_urban_sw.F90:593-602)
                    AA[i * nd + j] = grd[0] * hw[i % ns]
                else:
                    AA[i * nd + j] = z
            for r in range(nreg):
                if i // ns == r:
                    DA[i * nreg + r] = grd[2] * grd[1] * hw[i % ns]
                else:
                    DA[i * nreg + r] = z

    # denom = I - a_above @ R  (radsurf_urban_sw.F90:607-609)
    _mm(W1, 0, AA, 0, R, 0, nd, nd, nd, eye_minus=True)
    # RHS = [a_above@T | d_above@E + a_above@Sdn | I]
    _mm(RHS, 0, AA, 0, T, 0, nd, nd, nd, ostride=mtot)
    _mm(RHS, nd, DA, 0, E, 0, nd, nreg, nreg, ostride=mtot, bstride=nreg)
    _mm(RHS, nd, AA, 0, Sdn, 0, nd, nd, nreg, ostride=mtot, bstride=nreg,
        accumulate=True)

    z = jnp.zeros_like(rec[0])
    o = z + 1.0
    for i in range(nd):
        RHS[pl.ds(i * mtot + nd + nreg, nd)] = jnp.stack(
            [o if j == i else z for j in range(nd)]
        )
    _solve_off(W1, 0, RHS, 0, nd, mtot, rec)

    # Emit the entry carry + inv(denom) (the down-sweeps' "above" operators)
    _cp(stacks, s_aa, AA, 0, nd * nd)
    _cp(stacks, s_da, DA, 0, nd * nreg)
    for i in range(nd):
        stacks[pl.ds(s_inv + i * nd, nd)] = RHS[pl.ds(i * mtot + nd + nreg, nd)]

    # a_below / d_below incl. exposed-roof rows
    # (radsurf_urban_sw.F90:607-643), written straight into the stack
    _zero(stacks, s_ab, nd2 * nd2, rec)
    _zero(stacks, s_db, nd2 * nregp, rec)

    for i in range(nd):
        acc = R[pl.ds(i * nd, nd)]
        acc_d = Sup[pl.ds(i * nreg, nreg)]
        for k in range(nd):
            tik = T[i * nd + k]
            acc = acc + tik * RHS[pl.ds(k * mtot, nd)]
            acc_d = acc_d + tik * RHS[pl.ds(k * mtot + nd, nreg)]
        stacks[pl.ds(s_ab + i * nd2, nd)] = acc
        stacks[pl.ds(s_db + i * nregp, nreg)] = acc_d
    for u in range(ns):
        for v in range(ns):
            # a_roof(to, fr) = albedo * hweight(to)
            # (radsurf_urban_sw.F90:627-643)
            stacks[s_ab + (nd + u) * nd2 + nd + v] = ralb[0] * hw[u]
        stacks[s_db + (nd + u) * nregp + nreg] = grd[2] * ralbd[0] * hw[u]

    # Overlap translation to above the interface
    # (radsurf_urban_sw.F90:646-653): (u (x) I_ns) @ below @ (v (x) I_ns)
    # Row-slab over the stream column index; the (q, r) region contraction
    # is a scalar-coefficient accumulation of ns-wide slabs.
    for t in range(nreg):
        for a in range(ns):
            row = (t * ns + a) * nd
            drow = (t * ns + a) * nreg
            dacc = None
            for f in range(nreg):
                acc = None
                for q in range(nregp):
                    uq = uov[t * nregp + q]
                    for r in range(nregp):
                        cf = uq * vov[r * nreg + f]
                        term = cf * stacks[
                            pl.ds(s_ab + (q * ns + a) * nd2 + r * ns, ns)
                        ]
                        acc = term if acc is None else acc + term
                TMP[pl.ds(row + f * ns, ns)] = acc
            for q in range(nregp):
                term = uov[t * nregp + q] * stacks[
                    pl.ds(s_db + (q * ns + a) * nregp, nregp)
                ]
                dacc = term if dacc is None else dacc + term
            for f in range(nreg):
                acc = None
                for r in range(nregp):
                    term = dacc[r] * vov[r * nreg + f]
                    acc = term if acc is None else acc + term
                TMPD[drow + f] = acc

    _cp(AA, 0, TMP, 0, nd * nd)
    _cp(DA, 0, TMPD, 0, nd * nreg)

    @pl.when(l == nlay - 1)
    def _top():
        _cp(top, 0, AA, 0, nd * nd)
        _cp(top, nd * nd, DA, 0, nd * nreg)


# ----------------------------------------------------------------------
# Shortwave down-sweep (radsurf_urban_sw.F90:676-1001, minus the
# clear-sky/sunlit bookkeeping which lives outside the kernel)
# ----------------------------------------------------------------------

def _sw_down_kernel(nd, ns, nreg, nlay, hw, rmu, rtan, modes, do_urban,
                    with_profiles, out_rows_list,
                    R, T, E, Sdn, idir, idif, idd, stacks, vov, aux, grd,
                    outs, fin,
                    DDIRS, DDIFS, DBD, DBF, UPB, DDN, REF, WRK, DNN, UPA,
                    IFD, IFR, rec):
    """Runs one or two normalizations (modes = tuple of with_direct flags)
    SEQUENTIALLY per grid step: the second mode reuses this step's
    already-resident layer operators, so fusing the direct and diffuse
    sweeps halves the down-phase HBM read traffic.  Each mode owns its own
    carry scratch (DDIRS/DDIFS slices); the temporaries are reused — every
    temp a mode reads is written earlier in the SAME mode (the gating
    mirrors the single-mode kernel exactly)."""
    off_out = 0
    off_fin = 0
    for mode_i, with_direct in enumerate(modes):
        _sw_down_mode(nd, ns, nreg, nlay, hw, rmu, rtan, with_direct,
                      do_urban, with_profiles, out_rows_list[mode_i],
                      off_out, off_fin,
                      R, T, E, Sdn, idir, idif, idd, stacks, vov, aux, grd,
                      outs, fin,
                      _View(DDIRS, mode_i * nreg), _View(DDIFS, mode_i * nd),
                      DBD, DBF, UPB, DDN, REF, WRK, DNN, UPA, IFD, IFR, rec)
        off_out += len(out_rows_list[mode_i])
        off_fin += (nreg + nd) if with_direct else nd


def _sw_down_mode(nd, ns, nreg, nlay, hw, rmu, rtan, with_direct, do_urban,
                  with_profiles, out_rows, off_out, off_fin,
                  R, T, E, Sdn, idir, idif, idd, stacks, vov, aux, grd,
                  outs, fin,
                  DDIR, DDIF, DBD, DBF, UPB, DDN, REF, WRK, DNN, UPA,
                  IFD, IFR, rec):
    nregp = nreg + 1
    nd2 = nregp * ns
    nod = max(nreg - 1, 1)
    l = pl.program_id(1)
    s_aa = 0
    s_da = nd * nd
    s_inv = s_da + nd * nreg
    s_ab = s_inv + nd * nd
    s_db = s_ab + nd2 * nd2
    # aux rows: [f_wall(nreg) | od(nod) | ab_coef | vb_coef | wall_albedo]
    a_fw, a_od = 0, nreg
    a_ab, a_vb, a_wa = nreg + nod, nreg + nod + 1, nreg + nod + 2
    zcos = grd[0]
    z = jnp.zeros_like(zcos)

    @pl.when(l == 0)
    def _init():
        # TOC conditions (radsurf_urban_sw.F90:687-700)
        for r in range(nreg):
            DDIR[r] = 1.0 / zcos if (with_direct and r == 0) else z
        for i in range(nd):
            DDIF[i] = (z + hw[i]) if (not with_direct and i < ns) else z

    # Translate across the interface at layer top (:707-714)
    for q in range(nregp):
        accd = vov[q * nreg] * DDIR[0]
        accf = vov[q * nreg] * DDIF[pl.ds(0, ns)]
        for r in range(1, nreg):
            accd = accd + vov[q * nreg + r] * DDIR[r]
            accf = accf + vov[q * nreg + r] * DDIF[pl.ds(r * ns, ns)]
        DBD[q] = accd
        DBF[pl.ds(q * ns, ns)] = accf
    _mv(UPB, 0, stacks, s_ab, DBF, 0, nd2, nd2)
    if with_direct:
        _mv(UPB, 0, stacks, s_db, DBD, 0, nd2, nregp, accumulate=True)

    # Roof fluxes (:716-721)
    roof_in_dir = zcos * DBD[nreg] if with_direct else z
    roof_in = jnp.sum(DBF[pl.ds(nd, ns)], axis=0)
    roof_up = jnp.sum(UPB[pl.ds(nd, ns)], axis=0)
    if with_direct:
        roof_in = roof_in + roof_in_dir

    # Fluxes at layer base (:723-735)
    if with_direct:
        for r in range(nreg):
            acc = E[r * nreg] * DBD[0]
            for q in range(1, nreg):
                acc = acc + E[r * nreg + q] * DBD[q]
            DDN[r] = acc
        _mv(REF, 0, stacks, s_da, DDN, 0, nd, nreg)

        dbf_s = DBF[pl.ds(0, nd)]
        ref_s = REF[pl.ds(0, nd)]
        dbd_s = DBD[pl.ds(0, nreg)]
        for i in range(nd):
            WRK[i] = (
                jnp.sum(T[pl.ds(i * nd, nd)] * dbf_s, axis=0)
                + jnp.sum(R[pl.ds(i * nd, nd)] * ref_s, axis=0)
                + jnp.sum(Sdn[pl.ds(i * nreg, nreg)] * dbd_s, axis=0)
            )
    else:
        _mv(WRK, 0, T, 0, DBF, 0, nd, nd)
    _mv(DNN, 0, stacks, s_inv, WRK, 0, nd, nd)
    _mv(UPA, 0, stacks, s_aa, DNN, 0, nd, nd)
    if with_direct:
        UPA[pl.ds(0, nd)] = UPA[pl.ds(0, nd)] + REF[pl.ds(0, nd)]

    # Integrated fluxes (:753-761): conv -> int matrices (in WRK/IFD/IFR)
    WRK[pl.ds(0, nd)] = (
        DBF[pl.ds(0, nd)] - DNN[pl.ds(0, nd)]
        - UPB[pl.ds(0, nd)] + UPA[pl.ds(0, nd)]
    )
    _mv(IFD, 0, idif, 0, WRK, 0, nd, nd)
    if with_direct:
        DBD[pl.ds(0, nreg)] = DBD[pl.ds(0, nreg)] - DDN[pl.ds(0, nreg)]
        _mv(IFR, 0, idir, 0, DBD, 0, nreg, nreg)
        _mv(IFD, 0, idd, 0, DBD, 0, nd, nreg, accumulate=True)
    else:
        for r in range(nreg):
            IFR[r] = z

    # Absorption (:763-788) + wall (:790-802)
    rmu_s = jnp.stack([z + rmu[n] for n in range(ns)])
    rtan_s = jnp.stack([z + rtan[n] for n in range(ns)])
    ifd_mu = []
    ifd_tan = []
    for r in range(nreg):
        row = IFD[pl.ds(r * ns, ns)]
        ifd_mu.append(jnp.sum(row * rmu_s, axis=0))
        ifd_tan.append(jnp.sum(row * rtan_s, axis=0))

    row = {}
    row["roof_in"] = roof_in
    row["roof_net"] = roof_in - roof_up
    if with_direct:
        row["roof_in_dir"] = roof_in_dir
    row["clear_air_abs"] = aux[a_ab] * (IFR[0] + ifd_mu[0])
    if nreg > 1:
        va = IFR[1] + ifd_mu[1]
        vs = (IFR[1] + ifd_mu[1]) * aux[a_od]
        for r in range(2, nreg):
            va = va + IFR[r] + ifd_mu[r]
            vs = vs + (IFR[r] + ifd_mu[r]) * aux[a_od + r - 1]
        row["veg_air_abs"] = aux[a_ab] * va
        row["veg_abs"] = aux[a_vb] * vs
        if with_direct:
            vd = IFR[1] * aux[a_od]
            for r in range(2, nreg):
                vd = vd + IFR[r] * aux[a_od + r - 1]
            row["veg_abs_dir"] = aux[a_vb] * vd
    if do_urban:
        wall_in = aux[a_fw] * ifd_tan[0]
        for r in range(1, nreg):
            wall_in = wall_in + aux[a_fw + r] * ifd_tan[r]
        if with_direct:
            sin0 = jnp.sqrt(jnp.maximum(1.0 - zcos * zcos, 0.0))
            wd = aux[a_fw] * IFR[0]
            for r in range(1, nreg):
                wd = wd + aux[a_fw + r] * IFR[r]
            wall_in_dir = sin0 * wd
            row["wall_in_dir"] = wall_in_dir
            wall_in = wall_in + wall_in_dir
        row["wall_in"] = wall_in
        row["wall_net"] = wall_in * (1.0 - aux[a_wa])
    if with_profiles:
        sdt = jnp.sum(DBF[pl.ds(0, nd)], axis=0)
        sut = jnp.sum(UPB[pl.ds(0, nd)], axis=0)
        sdb = jnp.sum(DNN[pl.ds(0, nd)], axis=0)
        sub = jnp.sum(UPA[pl.ds(0, nd)], axis=0)
        if with_direct:
            # DBD now holds conv_dir; recover dn_dir_below = conv + DDN
            ddn_sum = jnp.sum(DDN[pl.ds(0, nreg)], axis=0)
            ddt = jnp.sum(DBD[pl.ds(0, nreg)], axis=0) + ddn_sum
            row["flux_dn_dir_layer_top"] = zcos * ddt
            row["flux_dn_dir_layer_base"] = zcos * ddn_sum
            sdt = sdt + zcos * ddt
            sdb = sdb + zcos * ddn_sum
        row["flux_dn_layer_top"] = sdt
        row["flux_up_layer_top"] = sut
        row["flux_dn_layer_base"] = sdb
        row["flux_up_layer_base"] = sub

    for i, name in enumerate(out_rows):
        outs[off_out + i] = row[name]

    # Commit carries; final carry -> fin at the last (bottom) layer
    if with_direct:
        _cp(DDIR, 0, DDN, 0, nreg)
    _cp(DDIF, 0, DNN, 0, nd)

    @pl.when(l == nlay - 1)
    def _fin():
        if with_direct:
            _cp(fin, off_fin, DDIR, 0, nreg)
            _cp(fin, off_fin + nreg, DDIF, 0, nd)
        else:
            _cp(fin, off_fin, DDIF, 0, nd)


# ----------------------------------------------------------------------
# Longwave up-sweep (radsurf_urban_lw.F90:567-637)
# ----------------------------------------------------------------------

def _lw_up_kernel(nd, ns, nreg, nlay, hw,
                  R, T, p, uov, vov, reps, remit, exposed, grd,
                  stacks, top,
                  AA, SRC, W1, RHS, TMP, TMPS, rec):
    nregp = nreg + 1
    nd2 = nregp * ns
    mtot = 2 * nd + 1
    l = pl.program_id(1)
    # Stack rows: [a_above | source_above | inv_denom | a_below | source_below]
    s_aa = 0
    s_sa = nd * nd
    s_inv = s_sa + nd
    s_ab = s_inv + nd * nd
    s_sb = s_ab + nd2 * nd2

    @pl.when(l == 0)
    def _init():
        # Ground operators (radsurf_urban_lw.F90:551-565):
        # a_ground[(r,n),(r2,m)] = (1 - emissivity) * hw[m] * (r == r2)
        # source_ground[(r,n)]   = emission * frac0[r] * hw[n]
        z = jnp.zeros_like(grd[0])
        for i in range(nd):
            for j in range(nd):
                if i // ns == j // ns:
                    # a_ground(to, fr) = (1 - emissivity) * hweight(to)
                    AA[i * nd + j] = (1.0 - grd[0]) * hw[i % ns]
                else:
                    AA[i * nd + j] = z
            SRC[i] = grd[1] * grd[2 + i // ns] * hw[i % ns]

    # denom = I - a_above @ R; RHS = [a_above@T | source_above+a_above@p | I]
    _mm(W1, 0, AA, 0, R, 0, nd, nd, nd, eye_minus=True)
    _mm(RHS, 0, AA, 0, T, 0, nd, nd, nd, ostride=mtot)

    z = jnp.zeros_like(rec[0])
    o = z + 1.0
    ps = p[pl.ds(0, nd)]
    for i in range(nd):
        RHS[i * mtot + nd] = SRC[i] + jnp.sum(
            AA[pl.ds(i * nd, nd)] * ps, axis=0
        )
        RHS[pl.ds(i * mtot + nd + 1, nd)] = jnp.stack(
            [o if j == i else z for j in range(nd)]
        )
    _solve_off(W1, 0, RHS, 0, nd, mtot, rec)

    _cp(stacks, s_aa, AA, 0, nd * nd)
    _cp(stacks, s_sa, SRC, 0, nd)
    for i in range(nd):
        stacks[pl.ds(s_inv + i * nd, nd)] = RHS[pl.ds(i * mtot + nd + 1, nd)]

    # a_below / source_below incl. exposed-roof rows (Eq. 34; :583-605)
    _zero(stacks, s_ab, nd2 * nd2, rec)

    for i in range(nd):
        acc = R[pl.ds(i * nd, nd)]
        acc_s = p[i]
        for k in range(nd):
            tik = T[i * nd + k]
            acc = acc + tik * RHS[pl.ds(k * mtot, nd)]
            acc_s = acc_s + tik * RHS[k * mtot + nd]
        stacks[pl.ds(s_ab + i * nd2, nd)] = acc
        stacks[s_sb + i] = acc_s
    for u in range(ns):
        for v in range(ns):
            # a_roof(to, fr) = (1 - emissivity) * hweight(to)
            stacks[s_ab + (nd + u) * nd2 + nd + v] = (1.0 - reps[0]) * hw[u]
        stacks[s_sb + nd + u] = remit[0] * exposed[0] * hw[u]

    # Overlap translation (radsurf_urban_lw.F90:620-627)
    for t in range(nreg):
        for a in range(ns):
            row = (t * ns + a) * nd
            for f in range(nreg):
                acc = None
                for q in range(nregp):
                    uq = uov[t * nregp + q]
                    for r in range(nregp):
                        cf = uq * vov[r * nreg + f]
                        term = cf * stacks[
                            pl.ds(s_ab + (q * ns + a) * nd2 + r * ns, ns)
                        ]
                        acc = term if acc is None else acc + term
                TMP[pl.ds(row + f * ns, ns)] = acc
    for t in range(nreg):
        acc = uov[t * nregp] * stacks[pl.ds(s_sb, ns)]
        for q in range(1, nregp):
            acc = acc + uov[t * nregp + q] * stacks[pl.ds(s_sb + q * ns, ns)]
        TMPS[pl.ds(t * ns, ns)] = acc

    _cp(AA, 0, TMP, 0, nd * nd)
    _cp(SRC, 0, TMPS, 0, nd)

    @pl.when(l == nlay - 1)
    def _top():
        _cp(top, 0, AA, 0, nd * nd)
        _cp(top, nd * nd, SRC, 0, nd)


# ----------------------------------------------------------------------
# Longwave down-sweep (radsurf_urban_lw.F90:639-858)
# ----------------------------------------------------------------------

def _lw_down_kernel(nd, ns, nreg, nlay, hw, rmu, rtan, modes, do_urban,
                    with_profiles, out_rows_list,
                    R, T, p, idif, isrc, stacks, vov, aux,
                    outs, fin,
                    DNS, DBF, UPB, WRK, DNN, UPA, IFL, rec):
    """One or two source modes sequentially per grid step (see
    _sw_down_kernel): fusing the internal and incoming sweeps halves the
    LW down-phase HBM read traffic."""
    off_out = 0
    for mode_i, with_source in enumerate(modes):
        _lw_down_mode(nd, ns, nreg, nlay, hw, rmu, rtan, with_source,
                      do_urban, with_profiles, out_rows_list[mode_i],
                      off_out, mode_i * nd,
                      R, T, p, idif, isrc, stacks, vov, aux, outs, fin,
                      _View(DNS, mode_i * nd),
                      DBF, UPB, WRK, DNN, UPA, IFL, rec)
        off_out += len(out_rows_list[mode_i])


def _lw_down_mode(nd, ns, nreg, nlay, hw, rmu, rtan, with_source, do_urban,
                  with_profiles, out_rows, off_out, off_fin,
                  R, T, p, idif, isrc, stacks, vov, aux,
                  outs, fin,
                  DN, DBF, UPB, WRK, DNN, UPA, IFL, rec):
    nregp = nreg + 1
    nd2 = nregp * ns
    nod = max(nreg - 1, 1)
    l = pl.program_id(1)
    s_aa = 0
    s_sa = nd * nd
    s_inv = s_sa + nd
    s_ab = s_inv + nd * nd
    s_sb = s_ab + nd2 * nd2
    # aux rows: [f_wall(nreg) | od(nod) | ab | vb | weps |
    #            sub_air | sub_vegair | sub_veg | sub_wall]
    a_fw, a_od = 0, nreg
    a_ab, a_vb, a_we = nreg + nod, nreg + nod + 1, nreg + nod + 2
    a_sair, a_svair, a_sveg, a_swall = (nreg + nod + 3, nreg + nod + 4,
                                        nreg + nod + 5, nreg + nod + 6)
    z = jnp.zeros_like(rec[0])

    @pl.when(l == 0)
    def _init():
        for i in range(nd):
            DN[i] = (z + hw[i]) if (not with_source and i < ns) else z

    for q in range(nregp):
        acc = vov[q * nreg] * DN[pl.ds(0, ns)]
        for r in range(1, nreg):
            acc = acc + vov[q * nreg + r] * DN[pl.ds(r * ns, ns)]
        DBF[pl.ds(q * ns, ns)] = acc
    _mv(UPB, 0, stacks, s_ab, DBF, 0, nd2, nd2)
    if with_source:
        UPB[pl.ds(0, nd2)] = UPB[pl.ds(0, nd2)] + stacks[pl.ds(s_sb, nd2)]

    roof_in = jnp.sum(DBF[pl.ds(nd, ns)], axis=0)
    roof_up = jnp.sum(UPB[pl.ds(nd, ns)], axis=0)

    dbf_s = DBF[pl.ds(0, nd)]
    if with_source:
        sa_s = stacks[pl.ds(s_sa, nd)]
    for i in range(nd):
        acc = jnp.sum(T[pl.ds(i * nd, nd)] * dbf_s, axis=0)
        if with_source:
            acc = acc + jnp.sum(R[pl.ds(i * nd, nd)] * sa_s, axis=0) + p[i]
        WRK[i] = acc
    _mv(DNN, 0, stacks, s_inv, WRK, 0, nd, nd)
    _mv(UPA, 0, stacks, s_aa, DNN, 0, nd, nd)
    if with_source:
        UPA[pl.ds(0, nd)] = UPA[pl.ds(0, nd)] + stacks[pl.ds(s_sa, nd)]

    WRK[pl.ds(0, nd)] = (
        DBF[pl.ds(0, nd)] - DNN[pl.ds(0, nd)]
        - UPB[pl.ds(0, nd)] + UPA[pl.ds(0, nd)]
    )
    _mv(IFL, 0, idif, 0, WRK, 0, nd, nd)
    if with_source:
        IFL[pl.ds(0, nd)] = IFL[pl.ds(0, nd)] + isrc[pl.ds(0, nd)]

    rmu_s = jnp.stack([z + rmu[n] for n in range(ns)])
    rtan_s = jnp.stack([z + rtan[n] for n in range(ns)])
    if_mu = []
    if_tan = []
    for r in range(nreg):
        row_r = IFL[pl.ds(r * ns, ns)]
        if_mu.append(jnp.sum(row_r * rmu_s, axis=0))
        if_tan.append(jnp.sum(row_r * rtan_s, axis=0))

    row = {}
    row["roof_in"] = roof_in
    row["roof_net"] = roof_in - roof_up
    ca = aux[a_ab] * if_mu[0]
    if with_source:
        ca = ca - aux[a_sair]
    row["clear_air_abs"] = ca
    if nreg > 1:
        va = if_mu[1]
        vs = if_mu[1] * aux[a_od]
        for r in range(2, nreg):
            va = va + if_mu[r]
            vs = vs + if_mu[r] * aux[a_od + r - 1]
        va = aux[a_ab] * va
        vs = aux[a_vb] * vs
        if with_source:
            va = va - aux[a_svair]
            vs = vs - aux[a_sveg]
        row["veg_air_abs"] = va
        row["veg_abs"] = vs
    if do_urban:
        wall_in = aux[a_fw] * if_tan[0]
        for r in range(1, nreg):
            wall_in = wall_in + aux[a_fw + r] * if_tan[r]
        row["wall_in"] = wall_in
        wn = wall_in * aux[a_we]
        if with_source:
            wn = wn - aux[a_swall]
        row["wall_net"] = wn
    if with_profiles:
        row["flux_dn_layer_top"] = jnp.sum(DBF[pl.ds(0, nd)], axis=0)
        row["flux_up_layer_top"] = jnp.sum(UPB[pl.ds(0, nd)], axis=0)
        row["flux_dn_layer_base"] = jnp.sum(DNN[pl.ds(0, nd)], axis=0)
        row["flux_up_layer_base"] = jnp.sum(UPA[pl.ds(0, nd)], axis=0)

    for i, name in enumerate(out_rows):
        outs[off_out + i] = row[name]

    _cp(DN, 0, DNN, 0, nd)

    @pl.when(l == nlay - 1)
    def _fin():
        _cp(fin, off_fin, DN, 0, nd)


# ----------------------------------------------------------------------
# Host-side wrappers
# ----------------------------------------------------------------------

def _default_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _pad_b(x, pad, value=0.0):
    if not pad:
        return x
    fill = jnp.full((pad,) + x.shape[1:], value, x.dtype)
    return jnp.concatenate([x, fill], axis=0)


def _tiles(x):
    """[B, rows] -> [nb, rows, 8, 128]."""
    b, rows = x.shape
    return x.reshape(b // TILE, SUBLANES, LANES, rows).transpose(0, 3, 1, 2)


def _tiles_l(x):
    """[B, L, rows] -> [nb, L, rows, 8, 128]."""
    b, nlay, rows = x.shape
    return (
        x.reshape(b // TILE, SUBLANES, LANES, nlay, rows)
        .transpose(0, 3, 4, 1, 2)
    )


def _untiles_l(y):
    """[nb, L, rows, 8, 128] -> [B, L, rows]."""
    nb, nlay, rows = y.shape[:3]
    return y.transpose(0, 3, 4, 1, 2).reshape(nb * TILE, nlay, rows)


def _untiles(y):
    """[nb, rows, 8, 128] -> [B, rows]."""
    nb, rows = y.shape[:2]
    return y.transpose(0, 2, 3, 1).reshape(nb * TILE, rows)


def _lspec(rows, reverse_of=None):
    if reverse_of is None:
        idx = lambda i, l: (i, l, 0, 0, 0)
    else:
        idx = lambda i, l: (i, reverse_of - 1 - l, 0, 0, 0)
    return pl.BlockSpec((None, None, rows, SUBLANES, LANES), idx,
                        memory_space=pltpu.VMEM)


def _bspec(rows):
    return pl.BlockSpec((None, rows, SUBLANES, LANES),
                        lambda i, l: (i, 0, 0, 0), memory_space=pltpu.VMEM)


def _scr(rows, dtype):
    return pltpu.VMEM((rows, SUBLANES, LANES), dtype)


# The up/down sweep kernels' double-buffered layer windows plus the
# interface-stack window sum to ~13 MB at the largest auto-enabled config
# ((nreg+1)*ns = 16) — uncomfortably near Mosaic's 16 MiB default scoped
# vmem.  Request a higher ceiling outright (physical VMEM is 128 MiB); the
# _use_pallas_sweeps size guard still bounds what configs reach here.
_SWEEP_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)


def sw_stack_rows(nd, ns, nreg):
    nd2 = (nreg + 1) * ns
    return 2 * nd * nd + nd * nreg + nd2 * nd2 + nd2 * (nreg + 1)


def lw_stack_rows(nd, ns, nreg):
    nd2 = (nreg + 1) * ns
    return 2 * nd * nd + nd + nd2 * nd2 + nd2


def sw_out_rows(with_direct, do_urban, nreg, with_profiles):
    rows = ["roof_in", "roof_net"]
    if with_direct:
        rows.append("roof_in_dir")
    rows.append("clear_air_abs")
    if nreg > 1:
        rows += ["veg_air_abs", "veg_abs"]
        if with_direct:
            rows.append("veg_abs_dir")
    if do_urban:
        if with_direct:
            rows.append("wall_in_dir")
        rows += ["wall_in", "wall_net"]
    if with_profiles:
        if with_direct:
            rows += ["flux_dn_dir_layer_top", "flux_dn_dir_layer_base"]
        rows += ["flux_dn_layer_top", "flux_up_layer_top",
                 "flux_dn_layer_base", "flux_up_layer_base"]
    return tuple(rows)


def lw_out_rows(do_urban, nreg, with_profiles):
    rows = ["roof_in", "roof_net", "clear_air_abs"]
    if nreg > 1:
        rows += ["veg_air_abs", "veg_abs"]
    if do_urban:
        rows += ["wall_in", "wall_net"]
    if with_profiles:
        rows += ["flux_dn_layer_top", "flux_up_layer_top",
                 "flux_dn_layer_base", "flux_up_layer_base"]
    return tuple(rows)


@functools.partial(
    jax.jit,
    static_argnames=("nd", "ns", "nreg", "hw", "interpret", "tiled"),
)
def sw_up_sweep(R, T, E, Sup, Sdn, uov, vov, ralb, ralbd, grd, *,
                nd, ns, nreg, hw, interpret=False, tiled=False):
    """Upward adding sweep.  Per-layer inputs [B, L, rows] (flattened
    matrices), ground pack grd [B, 3] = [albedo, albedo_dir, cos_sza];
    B a multiple of 1024.  Returns (stacks [B, L, rows_st], top [B, rows_top])
    with stack layout [a_above | d_above | inv_denom | a_below | d_below].

    tiled=True: the layer-operator inputs (R..Sdn) arrive as raw factory
    tiles [nb, L, rows, 8, 128] and stacks is returned in tile form —
    the zero-copy handoff from pallas_layer.pallas_layer_tiles."""
    if tiled:
        nb, L = R.shape[:2]
        B = nb * TILE
    else:
        B, L = R.shape[:2]
        nb = B // TILE
    bigt = (lambda x: x) if tiled else _tiles_l
    dtype = R.dtype
    mtot = 2 * nd + nreg
    rows_st = sw_stack_rows(nd, ns, nreg)
    rows_top = nd * nd + nd * nreg

    kernel = functools.partial(_sw_up_kernel, nd, ns, nreg, L, hw)
    stacks, top = pl.pallas_call(
        kernel,
        grid=(nb, L),
        in_specs=[
            _lspec(nd * nd), _lspec(nd * nd), _lspec(nreg * nreg),
            _lspec(nd * nreg), _lspec(nd * nreg),
            _lspec(nreg * (nreg + 1)), _lspec((nreg + 1) * nreg),
            _lspec(1), _lspec(1), _bspec(3),
        ],
        out_specs=(_lspec(rows_st), _bspec(rows_top)),
        out_shape=(
            jax.ShapeDtypeStruct((nb, L, rows_st, SUBLANES, LANES), dtype),
            jax.ShapeDtypeStruct((nb, rows_top, SUBLANES, LANES), dtype),
        ),
        scratch_shapes=[
            _scr(nd * nd, dtype), _scr(nd * nreg, dtype),
            _scr(nd * nd, dtype), _scr(nd * mtot, dtype),
            _scr(nd * nd, dtype), _scr(nd * nreg, dtype), _scr(1, dtype),
        ],
        compiler_params=_SWEEP_COMPILER_PARAMS,
        interpret=interpret,
    )(
        bigt(R), bigt(T), bigt(E), bigt(Sup), bigt(Sdn),
        _tiles_l(uov), _tiles_l(vov), _tiles_l(ralb), _tiles_l(ralbd),
        _tiles(grd),
    )
    if tiled:
        return stacks, _untiles(top)
    return _untiles_l(stacks), _untiles(top)


@functools.partial(
    jax.jit,
    static_argnames=("nd", "ns", "nreg", "hw", "rmu", "rtan", "modes",
                     "do_urban", "with_profiles", "interpret", "tiled"),
)
def _sw_down_call(R, T, E, Sdn, idir, idif, idd, stacks, vov, aux, grd, *,
                  nd, ns, nreg, hw, rmu, rtan, modes, do_urban,
                  with_profiles, interpret=False, tiled=False):
    """Shared implementation of the SW down sweep for one or two
    normalizations (modes = tuple of with_direct flags).  With both modes
    the second runs in the SAME grid step against the already-resident
    layer operators, halving the down-phase HBM read traffic.  Returns
    (out_dicts tuple, fins tuple)."""
    if tiled:
        nb, L = R.shape[:2]
        B = nb * TILE
    else:
        B, L = R.shape[:2]
        nb = B // TILE
    bigt = (lambda x: x) if tiled else _tiles_l
    dtype = R.dtype
    nd2 = (nreg + 1) * ns
    rows_st = sw_stack_rows(nd, ns, nreg)
    nod = max(nreg - 1, 1)
    rows_aux = nreg + nod + 3
    out_rows_list = tuple(
        sw_out_rows(wd, do_urban, nreg, with_profiles) for wd in modes
    )
    n_out = sum(len(r) for r in out_rows_list)
    fin_rows = sum((nreg + nd) if wd else nd for wd in modes)
    nmodes = len(modes)

    kernel = functools.partial(
        _sw_down_kernel, nd, ns, nreg, L, hw, rmu, rtan, modes,
        do_urban, with_profiles, out_rows_list,
    )
    outs, fin = pl.pallas_call(
        kernel,
        grid=(nb, L),
        in_specs=[
            _lspec(nd * nd, L), _lspec(nd * nd, L), _lspec(nreg * nreg, L),
            _lspec(nd * nreg, L), _lspec(nreg * nreg, L),
            _lspec(nd * nd, L), _lspec(nd * nreg, L),
            _lspec(rows_st, L), _lspec((nreg + 1) * nreg, L),
            _lspec(rows_aux, L), _bspec(1),
        ],
        out_specs=(_lspec(n_out, L), _bspec(fin_rows)),
        out_shape=(
            jax.ShapeDtypeStruct((nb, L, n_out, SUBLANES, LANES), dtype),
            jax.ShapeDtypeStruct((nb, fin_rows, SUBLANES, LANES), dtype),
        ),
        scratch_shapes=[
            _scr(nmodes * nreg, dtype), _scr(nmodes * nd, dtype),
            _scr(nreg + 1, dtype),
            _scr(nd2, dtype), _scr(nd2, dtype), _scr(nreg, dtype),
            _scr(nd, dtype), _scr(nd, dtype), _scr(nd, dtype),
            _scr(nd, dtype), _scr(nd, dtype), _scr(nreg, dtype),
            _scr(1, dtype),
        ],
        compiler_params=_SWEEP_COMPILER_PARAMS,
        interpret=interpret,
    )(
        bigt(R), bigt(T), bigt(E), bigt(Sdn),
        bigt(idir), bigt(idif), bigt(idd),
        bigt(stacks), _tiles_l(vov), _tiles_l(aux), _tiles(grd),
    )
    outs = _untiles_l(outs)
    fin = _untiles(fin)
    out_dicts = []
    fins = []
    off_out = off_fin = 0
    for wd, out_rows in zip(modes, out_rows_list):
        out_dicts.append({
            name: outs[:, :, off_out + i] for i, name in enumerate(out_rows)
        })
        w = (nreg + nd) if wd else nd
        fins.append(fin[:, off_fin:off_fin + w])
        off_out += len(out_rows)
        off_fin += w
    return tuple(out_dicts), tuple(fins)


def sw_down_sweep(R, T, E, Sdn, idir, idif, idd, stacks, vov, aux, grd, *,
                  nd, ns, nreg, hw, rmu, rtan, with_direct, do_urban,
                  with_profiles, interpret=False, tiled=False):
    """Downward flux sweep (top to bottom), single normalization.  aux
    [B, L, rows] packs [f_wall(nreg) | od(max(nreg-1,1)) | ab_coef |
    vb_coef | wall_albedo]; grd [B, 1] = [cos_sza].  Returns
    ({name: [B, L]}, fin) where fin = [dn_dir | dn_diff] ([dn_diff] when
    not with_direct) below the lowest layer.

    tiled=True: R..idd and stacks arrive as raw tiles [nb, L, rows, 8, 128]
    (factory outputs / tiled up-sweep stacks) — no relayout."""
    out_dicts, fins = _sw_down_call(
        R, T, E, Sdn, idir, idif, idd, stacks, vov, aux, grd,
        nd=nd, ns=ns, nreg=nreg, hw=hw, rmu=rmu, rtan=rtan,
        modes=(with_direct,), do_urban=do_urban,
        with_profiles=with_profiles, interpret=interpret, tiled=tiled,
    )
    fin = fins[0]
    if not with_direct:
        # Preserve the historical [nreg + nd] fin layout (zero dn_dir)
        fin = jnp.concatenate(
            [jnp.zeros((fin.shape[0], nreg), fin.dtype), fin], axis=1
        )
    return out_dicts[0], fin


def sw_down_sweep_both(R, T, E, Sdn, idir, idif, idd, stacks, vov, aux,
                       grd, *, nd, ns, nreg, hw, rmu, rtan, do_urban,
                       with_profiles, interpret=False, tiled=False):
    """BOTH normalizations (direct then diffuse) in one fused pass: every
    layer's operators and interface stacks are read from HBM once instead
    of twice.  Returns ((outs_dir, outs_diff), (fin_dir, fin_diff)) with
    fin_dir = [dn_dir | dn_diff] and fin_diff = [dn_diff]."""
    return _sw_down_call(
        R, T, E, Sdn, idir, idif, idd, stacks, vov, aux, grd,
        nd=nd, ns=ns, nreg=nreg, hw=hw, rmu=rmu, rtan=rtan,
        modes=(True, False), do_urban=do_urban,
        with_profiles=with_profiles, interpret=interpret, tiled=tiled,
    )


@functools.partial(
    jax.jit,
    static_argnames=("nd", "ns", "nreg", "hw", "interpret", "tiled"),
)
def lw_up_sweep(R, T, p, uov, vov, reps, remit, exposed, grd, *,
                nd, ns, nreg, hw, interpret=False, tiled=False):
    """LW upward adding sweep.  grd [B, 2 + nreg] = [ground_emissivity,
    ground_emission, frac0...].  Returns (stacks, top) with stack layout
    [a_above | source_above | inv_denom | a_below | source_below].

    tiled=True: R/T/p arrive as raw factory tiles and stacks is returned
    in tile form (see sw_up_sweep)."""
    if tiled:
        nb, L = R.shape[:2]
        B = nb * TILE
    else:
        B, L = R.shape[:2]
        nb = B // TILE
    bigt = (lambda x: x) if tiled else _tiles_l
    dtype = R.dtype
    mtot = 2 * nd + 1
    rows_st = lw_stack_rows(nd, ns, nreg)
    rows_top = nd * nd + nd

    kernel = functools.partial(_lw_up_kernel, nd, ns, nreg, L, hw)
    stacks, top = pl.pallas_call(
        kernel,
        grid=(nb, L),
        in_specs=[
            _lspec(nd * nd), _lspec(nd * nd), _lspec(nd),
            _lspec(nreg * (nreg + 1)), _lspec((nreg + 1) * nreg),
            _lspec(1), _lspec(1), _lspec(1), _bspec(2 + nreg),
        ],
        out_specs=(_lspec(rows_st), _bspec(rows_top)),
        out_shape=(
            jax.ShapeDtypeStruct((nb, L, rows_st, SUBLANES, LANES), dtype),
            jax.ShapeDtypeStruct((nb, rows_top, SUBLANES, LANES), dtype),
        ),
        scratch_shapes=[
            _scr(nd * nd, dtype), _scr(nd, dtype),
            _scr(nd * nd, dtype), _scr(nd * mtot, dtype),
            _scr(nd * nd, dtype), _scr(nd, dtype), _scr(1, dtype),
        ],
        compiler_params=_SWEEP_COMPILER_PARAMS,
        interpret=interpret,
    )(
        bigt(R), bigt(T), bigt(p),
        _tiles_l(uov), _tiles_l(vov),
        _tiles_l(reps), _tiles_l(remit), _tiles_l(exposed), _tiles(grd),
    )
    if tiled:
        return stacks, _untiles(top)
    return _untiles_l(stacks), _untiles(top)


@functools.partial(
    jax.jit,
    static_argnames=("nd", "ns", "nreg", "hw", "rmu", "rtan", "modes",
                     "do_urban", "with_profiles", "interpret", "tiled"),
)
def _lw_down_call(R, T, p, idif, isrc, stacks, vov, aux, *,
                  nd, ns, nreg, hw, rmu, rtan, modes, do_urban,
                  with_profiles, interpret=False, tiled=False):
    """Shared LW down-sweep implementation for one or two source modes
    (see _sw_down_call).  Returns (out_dicts tuple, dn_fins tuple)."""
    if tiled:
        nb, L = R.shape[:2]
        B = nb * TILE
    else:
        B, L = R.shape[:2]
        nb = B // TILE
    bigt = (lambda x: x) if tiled else _tiles_l
    dtype = R.dtype
    nd2 = (nreg + 1) * ns
    rows_st = lw_stack_rows(nd, ns, nreg)
    nod = max(nreg - 1, 1)
    rows_aux = nreg + nod + 7
    out_rows_list = tuple(
        lw_out_rows(do_urban, nreg, with_profiles) for _ in modes
    )
    n_out = sum(len(r) for r in out_rows_list)
    nmodes = len(modes)

    kernel = functools.partial(
        _lw_down_kernel, nd, ns, nreg, L, hw, rmu, rtan, modes,
        do_urban, with_profiles, out_rows_list,
    )
    outs, fin = pl.pallas_call(
        kernel,
        grid=(nb, L),
        in_specs=[
            _lspec(nd * nd, L), _lspec(nd * nd, L), _lspec(nd, L),
            _lspec(nd * nd, L), _lspec(nd, L),
            _lspec(rows_st, L), _lspec((nreg + 1) * nreg, L),
            _lspec(rows_aux, L),
        ],
        out_specs=(_lspec(n_out, L), _bspec(nmodes * nd)),
        out_shape=(
            jax.ShapeDtypeStruct((nb, L, n_out, SUBLANES, LANES), dtype),
            jax.ShapeDtypeStruct((nb, nmodes * nd, SUBLANES, LANES), dtype),
        ),
        scratch_shapes=[
            _scr(nmodes * nd, dtype), _scr(nd2, dtype), _scr(nd2, dtype),
            _scr(nd, dtype), _scr(nd, dtype), _scr(nd, dtype),
            _scr(nd, dtype), _scr(1, dtype),
        ],
        compiler_params=_SWEEP_COMPILER_PARAMS,
        interpret=interpret,
    )(
        bigt(R), bigt(T), bigt(p),
        bigt(idif), bigt(isrc),
        bigt(stacks), _tiles_l(vov), _tiles_l(aux),
    )
    outs = _untiles_l(outs)
    fin = _untiles(fin)
    out_dicts = []
    fins = []
    off_out = 0
    for mode_i, out_rows in enumerate(out_rows_list):
        out_dicts.append({
            name: outs[:, :, off_out + i] for i, name in enumerate(out_rows)
        })
        fins.append(fin[:, mode_i * nd:(mode_i + 1) * nd])
        off_out += len(out_rows)
    return tuple(out_dicts), tuple(fins)


def lw_down_sweep(R, T, p, idif, isrc, stacks, vov, aux, *,
                  nd, ns, nreg, hw, rmu, rtan, with_source, do_urban,
                  with_profiles, interpret=False, tiled=False):
    """LW downward flux sweep, single source mode.  aux [B, L, rows] packs
    [f_wall(nreg) | od(max(nreg-1,1)) | ab | vb | weps | sub_air |
    sub_vegair | sub_veg | sub_wall].  Returns ({name: [B, L]},
    dn_fin [B, nd]).

    tiled=True: R/T/p/idif/isrc and stacks arrive as raw tiles."""
    out_dicts, fins = _lw_down_call(
        R, T, p, idif, isrc, stacks, vov, aux,
        nd=nd, ns=ns, nreg=nreg, hw=hw, rmu=rmu, rtan=rtan,
        modes=(with_source,), do_urban=do_urban,
        with_profiles=with_profiles, interpret=interpret, tiled=tiled,
    )
    return out_dicts[0], fins[0]


def lw_down_sweep_both(R, T, p, idif, isrc, stacks, vov, aux, *,
                       nd, ns, nreg, hw, rmu, rtan, do_urban,
                       with_profiles, interpret=False, tiled=False):
    """BOTH LW sweeps (internal emission, then incoming) in one fused
    pass: layer operators and stacks read from HBM once instead of twice.
    Returns ((outs_internal, outs_norm), (dn_fin_internal, dn_fin_norm))."""
    return _lw_down_call(
        R, T, p, idif, isrc, stacks, vov, aux,
        nd=nd, ns=ns, nreg=nreg, hw=hw, rmu=rmu, rtan=rtan,
        modes=(True, False), do_urban=do_urban,
        with_profiles=with_profiles, interpret=interpret, tiled=tiled,
    )
