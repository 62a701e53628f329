"""Pallas layer-factory kernel vs the XLA reference path.

Runs in interpreter mode on CPU (conftest pins the cpu backend); on real
TPU hardware the kernel Mosaic-compiles and agrees to f32 accumulation
accuracy (validated manually on a v5e chip, see ops/pallas_layer.py).
"""

import numpy as np
import pytest

from spartacus_surface_tpu.ops.layer_matrices import layer_matrices
from spartacus_surface_tpu.ops.pallas_layer import (
    TILE, pallas_layer_matrices, pallas_layer_thin_double)
from tests.test_layer_matrices import make_gammas

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("ns,nreg", [(4, 2), (2, 1), (1, 2), (4, 3)])
def test_pallas_matches_xla(ns, nreg):
    # (4,2)/(2,1)/(4,3) take the structured half-size expm; (1,2) keeps the
    # dense-Pade fallback (1-stream systems have no diffuse block split).
    # (4,3) is the RAMI-V flagship config (nd=12): its scratch now fits
    # the VMEM guard via the shared-workspace layout (BIG buffer).
    rng = np.random.default_rng(3)
    nd, ndir = ns * nreg, nreg
    B = TILE
    g0 = np.empty((B, ndir, ndir), np.float32)
    g1 = np.empty((B, nd, nd), np.float32)
    g2 = np.empty((B, nd, nd), np.float32)
    g3 = np.empty((B, nd, ndir), np.float32)
    for i in range(4):
        a0, a1, a2, a3 = make_gammas(rng, ns, nreg)
        g0[i::4], g1[i::4], g2[i::4], g3[i::4] = a0, a1, a2, a3
    dz = np.full(B, 1.3, np.float32)

    ref = layer_matrices(g0, g1, g2, g3, dz, n_double=6, with_int=False)
    got = pallas_layer_thin_double(
        g0.reshape(B, -1), g1.reshape(B, -1), g2.reshape(B, -1),
        g3.reshape(B, -1), dz, nd=nd, ndir=ndir, n_double=6, interpret=True,
    )
    for key in ("R", "T", "E", "Sup", "Sdn"):
        r = np.asarray(ref[key]).reshape(B, -1)
        g = np.asarray(got[key])
        np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-5, err_msg=key)


def test_pallas_wrapper_pads_batch():
    """Non-TILE-multiple batch: identity padding must not disturb results."""
    rng = np.random.default_rng(9)
    ns, nreg = 2, 2
    nd, ndir = ns * nreg, nreg
    B = 37  # deliberately awkward
    g0 = np.empty((B, ndir, ndir), np.float32)
    g1 = np.empty((B, nd, nd), np.float32)
    g2 = np.empty((B, nd, nd), np.float32)
    g3 = np.empty((B, nd, ndir), np.float32)
    for i in range(B):
        a0, a1, a2, a3 = make_gammas(rng, ns, nreg)
        g0[i], g1[i], g2[i], g3[i] = a0, a1, a2, a3
    dz = np.full(B, 0.8, np.float32)

    ref = layer_matrices(g0, g1, g2, g3, dz, n_double=4)
    got = pallas_layer_matrices(g0, g1, g2, g3, dz, n_double=4,
                                interpret=True)
    for key in ("R", "T", "E", "Sup", "Sdn", "int_diff", "int_dir",
                "int_dir_diff"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]),
            rtol=2e-4, atol=2e-5, err_msg=key,
        )


def test_tiles_chunking_is_exact():
    """pallas_layer_tiles with chunk_nb (lax.map over batch-tile groups —
    the branch the 16k-column TPU headline takes) must be bit-identical to
    the unchunked call, and both must match the XLA reference."""
    from spartacus_surface_tpu.ops.pallas_layer import pallas_layer_tiles

    rng = np.random.default_rng(13)
    ns, nreg = 2, 1
    nd, ndir = ns * nreg, nreg
    Bp, L = 2 * TILE, 2
    g0 = np.empty((Bp, L, ndir, ndir), np.float32)
    g1 = np.empty((Bp, L, nd, nd), np.float32)
    g2 = np.empty((Bp, L, nd, nd), np.float32)
    g3 = np.empty((Bp, L, nd, ndir), np.float32)
    for i in range(4):
        for l in range(L):
            a0, a1, a2, a3 = make_gammas(rng, ns, nreg)
            g0[i::4, l], g1[i::4, l] = a0, a1
            g2[i::4, l], g3[i::4, l] = a2, a3
    dz = np.full((Bp, L), 0.9, np.float32)
    fl = lambda x: x.reshape(Bp, L, -1)

    one = pallas_layer_tiles(fl(g0), fl(g1), fl(g2), fl(g3), dz,
                             nd=nd, ndir=ndir, n_double=4, interpret=True)
    chk = pallas_layer_tiles(fl(g0), fl(g1), fl(g2), fl(g3), dz,
                             nd=nd, ndir=ndir, n_double=4, chunk_nb=1,
                             interpret=True)
    for key in one:
        np.testing.assert_array_equal(
            np.asarray(one[key]), np.asarray(chk[key]), err_msg=key
        )

    # Cross-check one element batch against the XLA reference: tile
    # layout [nb, L, rows, 8, 128] with intra-tile index (s*128 + lane)
    ref = layer_matrices(g0[:8, 0], g1[:8, 0], g2[:8, 0], g3[:8, 0],
                         dz[:8, 0], n_double=4)
    for key in ("R", "T", "int_diff"):
        got = np.asarray(one[key])[0, 0].reshape(-1, TILE)[:, :8].T
        np.testing.assert_allclose(
            got, np.asarray(ref[key]).reshape(8, -1),
            rtol=2e-4, atol=2e-5, err_msg=key,
        )


def test_solver_with_pallas_factory():
    """The full SW solver with the Pallas factory enabled conserves energy
    and matches the XLA-factory solver (f32 accumulation differences)."""
    from spartacus_surface_tpu.models.solver import (
        SolverOptions, spartacus_sw)
    from spartacus_surface_tpu.ops.legendre_gauss import LegendreGauss
    from tests.test_solver_conservation import make_inputs, residual_sw
    import jax

    rng = np.random.default_rng(55)
    inp = make_inputs(rng, C=2, L=2, S=1, urban=True)
    inp = jax.tree_util.tree_map(
        lambda x: None if x is None else np.asarray(x, np.float32), inp
    )
    lg = LegendreGauss(2)
    kw = dict(nreg=2, nstream=2, do_urban=True, n_double=6)
    ref_d, ref_f, ref_bc = spartacus_sw(
        inp, SolverOptions(**kw), lg)
    pal_d, pal_f, pal_bc = spartacus_sw(
        inp, SolverOptions(**kw, use_pallas_factory=True), lg)
    assert np.abs(residual_sw(pal_d)).max() < 2e-4
    for key in ("ground_dn", "top_net", "wall_net"):
        np.testing.assert_allclose(
            np.asarray(pal_d[key]), np.asarray(ref_d[key]),
            rtol=3e-4, atol=3e-5, err_msg=key,
        )
