"""Kernel demonstration programs: the test_sw / test_lw equivalents.

The reference ships two micro test programs (driver/test_sw.F90,
driver/test_lw.F90, built by `make test_code`) that run the layer-matrix
factories on hardcoded 2-stream Gamma matrices and print the resulting
R/T/E/sources for eyeball comparison, plus the Legendre-Gauss quadrature
table for n=1..8.  This module reproduces them, with the addition of an
automated self-check: the Schur-based absorption-integral matrices are
compared against a brute-force inverse of the assembled Gamma (the check
test_sw.F90:53-58 performs by printing both).

Usage: python -m spartacus_surface_tpu.driver.test_kernels [sw|lw|lg]
"""

from __future__ import annotations

import sys

import numpy as np

from ..ops.layer_matrices import layer_matrices, lw_layer_matrices
from ..ops.legendre_gauss import LegendreGauss
from ..utils.debug import print_matrix, print_vector


def _hardcoded_gammas():
    """A 2-stream, 2-region Gamma set comparable to test_sw.F90:19-37."""
    lg = LegendreGauss(1)
    ns, nreg = 1, 2
    ext = np.array([0.05, 0.6])
    ssa = np.array([0.6, 0.4])
    f_ex = np.array([[0.0, 0.3], [0.15, 0.0]])
    mu0 = 0.6
    tan0 = np.sqrt(1 - mu0**2) / mu0
    nd = ns * nreg
    g0 = np.zeros((nreg, nreg))
    g1 = np.zeros((nd, nd))
    g2 = np.zeros((nd, nd))
    g3 = np.zeros((nd, nreg))
    for fr in range(nreg):
        for to in range(nreg):
            if fr != to:
                g0[fr, fr] -= tan0 * f_ex[to, fr]
                g0[to, fr] += tan0 * f_ex[to, fr]
                g1[fr, fr] -= lg.tan_ang[0] * f_ex[to, fr]
                g1[to, fr] += lg.tan_ang[0] * f_ex[to, fr]
    for r in range(nreg):
        g0[r, r] -= ext[r] / mu0
        g1[r, r] -= ext[r] / lg.mu[0]
        g2[r, r] = 0.5 * ext[r] * ssa[r] / lg.mu[0]
        g3[r, r] = 0.5 * ext[r] * ssa[r]
    return g0, g1 + g2, g2, g3


def demo_sw():
    g0, g1, g2, g3 = _hardcoded_gammas()
    dz = 2.0
    lay = layer_matrices(g0[None], g1[None], g2[None], g3[None],
                         np.array([dz]))
    print("Shortwave layer operators (2-region, 1 stream/hemisphere,"
          f" dz={dz}):")
    for key in ("R", "T", "E", "Sup", "Sdn"):
        print_matrix(key, np.asarray(lay[key])[0])
    print_matrix("int_diff", np.asarray(lay["int_diff"])[0])
    print_matrix("int_dir", np.asarray(lay["int_dir"])[0])
    print_matrix("int_dir_diff", np.asarray(lay["int_dir_diff"])[0])
    # Self-check: Schur-based Gamma inverse vs brute-force inverse of the
    # assembled full Gamma (cf. test_sw.F90:53-58)
    nd, ndir = g1.shape[0], g0.shape[0]
    G = np.block([
        [-g1, -g2, -g3],
        [g2, g1, g3],
        [np.zeros((ndir, 2 * nd)), g0],
    ])
    Gi = np.linalg.inv(G)
    int_diff_bf = Gi[nd:2 * nd, nd:2 * nd] - Gi[:nd, nd:2 * nd]
    err = np.abs(np.asarray(lay["int_diff"])[0] - (-int_diff_bf)).max()
    # Sign conventions: int_diff = g2i - g1i where inv blocks follow
    # radtool_schur.F90:27-30; compare against the brute-force assembly
    g1i_bf = Gi[nd:2 * nd, nd:2 * nd]
    g2i_bf = Gi[nd:2 * nd, :nd]
    err = np.abs(np.asarray(lay["int_diff"])[0] - (g2i_bf - g1i_bf)).max()
    print(f"\nSchur vs brute-force Gamma inverse: max |diff| = {err:.3e}")
    ok = err < 1e-10
    print("SELF-CHECK", "PASSED" if ok else "FAILED")
    return ok


def demo_lw():
    _, g1, g2, _ = _hardcoded_gammas()
    b = np.array([2.0, 5.0])
    dz = 2.0
    lay = lw_layer_matrices(g1[None], g2[None], b[None], np.array([dz]))
    print(f"Longwave layer operators (dz={dz}, b={b}):")
    for key in ("R", "T"):
        print_matrix(key, np.asarray(lay[key])[0])
    print_vector("source p", np.asarray(lay["p"])[0])
    print_matrix("int_diff", np.asarray(lay["int_diff"])[0])
    print_vector("int_source", np.asarray(lay["int_source"])[0])
    return True


def demo_lg():
    """Quadrature table for n=1..8 (cf. test_lw.F90:59-66)."""
    for n in range(1, 9):
        lg = LegendreGauss(n)
        print(f"n = {n}")
        print_vector("  mu     ", lg.mu)
        print_vector("  weight ", lg.weight)
        print_vector("  hweight", lg.hweight)
        print_vector("  vweight", lg.vweight)
    return True


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    which = argv[0] if argv else "all"
    ok = True
    if which in ("sw", "all"):
        ok &= demo_sw()
    if which in ("lw", "all"):
        print()
        ok &= demo_lw()
    if which in ("lg", "all"):
        print()
        ok &= demo_lg()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
