"""Pallas sweep kernels (up-sweep + down-sweeps) vs the XLA scan path.

Runs in interpreter mode on CPU (conftest pins the cpu backend); on real
TPU hardware the kernels Mosaic-compile and agree to f32 accumulation
accuracy (validated on a v5e chip: worst relative error 2.4e-7 SW,
1.5e-6 LW at C=128; see ops/pallas_sweep.py).

The kernel path differs structurally from the scan path — inv(denom)
instead of per-layer solves, and the clear-sky/sunlit recurrence in
closed form — so agreement here checks both the kernels and that
reformulation (cf. radsurf_urban_sw.F90:676-1001).
"""

import numpy as np
import pytest

from spartacus_surface_tpu.models.solver import (
    SolverOptions, spartacus_lw, spartacus_sw)
from spartacus_surface_tpu.ops.legendre_gauss import LegendreGauss
from tests.test_solver_conservation import add_lw, make_inputs

pytestmark = pytest.mark.slow


def _compare(ref, got, tag, rtol=3e-5):
    for rd, pd in zip(ref, got):
        assert set(rd) == set(pd), (tag, set(rd) ^ set(pd))
        for k in rd:
            r, p = np.asarray(rd[k]), np.asarray(pd[k])
            assert r.shape == p.shape, (tag, k, r.shape, p.shape)
            scale = max(1.0, float(np.abs(r).max()))
            err = float(np.abs(r - p).max()) / scale
            assert err < rtol, (tag, k, err)


@pytest.mark.parametrize("nreg,urban", [(1, True), (2, True), (2, False)])
def test_sw_sweep_kernels_match_scan(nreg, urban):
    rng = np.random.default_rng(17)
    inp = make_inputs(rng, C=3, L=3, S=2, urban=True)
    inp = __import__("jax").tree_util.tree_map(
        lambda x: None if x is None else np.asarray(x, np.float32), inp
    )
    lg = LegendreGauss(2)
    kw = dict(nreg=nreg, nstream=2, do_urban=urban, n_double=6)
    ref = spartacus_sw(inp, SolverOptions(**kw, use_pallas_sweeps=False),
                       lg, with_profiles=True)
    got = spartacus_sw(inp, SolverOptions(**kw, use_pallas_sweeps=True),
                       lg, with_profiles=True)
    _compare(ref, got, f"sw nreg={nreg} urban={urban}")


@pytest.mark.parametrize("nreg", [1, 2])
def test_lw_sweep_kernels_match_scan(nreg):
    rng = np.random.default_rng(23)
    inp = add_lw(make_inputs(rng, C=3, L=3, S=2, urban=True), rng)
    inp = __import__("jax").tree_util.tree_map(
        lambda x: None if x is None else np.asarray(x, np.float32), inp
    )
    lg = LegendreGauss(2)
    kw = dict(nreg=nreg, nstream=2, do_urban=True, n_double=6)
    ref = spartacus_lw(inp, SolverOptions(**kw, use_pallas_sweeps=False),
                       lg, with_profiles=True)
    got = spartacus_lw(inp, SolverOptions(**kw, use_pallas_sweeps=True),
                       lg, with_profiles=True)
    _compare(ref, got, f"lw nreg={nreg}")


@pytest.mark.parametrize("nreg", [1, 2, 3])
def test_fused_tile_path_matches_xla(nreg):
    """Factory AND sweeps both enabled routes through the fused tile-native
    path (pallas_layer_tiles -> tiled sweeps, zero factory->sweep copies);
    it must equal the all-XLA reference like the individual kernels do."""
    import jax

    rng = np.random.default_rng(41)
    inp = make_inputs(rng, C=3, L=3, S=2, urban=True)
    inp = jax.tree_util.tree_map(
        lambda x: None if x is None else np.asarray(x, np.float32), inp
    )
    inp_lw = add_lw(inp, rng)
    lg = LegendreGauss(2)
    kw = dict(nreg=nreg, nstream=2, do_urban=True, n_double=6)
    off = SolverOptions(**kw, use_pallas_factory=False,
                        use_pallas_sweeps=False)
    on = SolverOptions(**kw, use_pallas_factory=True, use_pallas_sweeps=True)
    _compare(
        spartacus_sw(inp, off, lg, with_profiles=True),
        spartacus_sw(inp, on, lg, with_profiles=True),
        f"fused sw nreg={nreg}",
    )
    _compare(
        spartacus_lw(inp_lw, off, lg, with_profiles=True),
        spartacus_lw(inp_lw, on, lg, with_profiles=True),
        f"fused lw nreg={nreg}", rtol=2e-4,
    )


def test_grad_through_pallas_path_matches_xla():
    """jax.grad works with the Pallas kernels enabled (custom_vjp whose
    backward is the XLA path's VJP), and equals the XLA path's gradient."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(31)
    inp = make_inputs(rng, C=2, L=2, S=1, urban=True)
    inp = jax.tree_util.tree_map(
        lambda x: None if x is None else np.asarray(x, np.float32), inp
    )
    lg = LegendreGauss(2)
    kw = dict(nreg=2, nstream=2, do_urban=True, n_double=6)

    def loss(veg_ext, opt):
        import dataclasses

        nd, nf, bc = spartacus_sw(
            dataclasses.replace(inp, veg_ext=veg_ext), opt, lg
        )
        return jnp.sum(nd["ground_net"]) + jnp.sum(bc["top_albedo_dir"])

    g_ref = jax.grad(loss)(inp.veg_ext, SolverOptions(**kw))
    g_pal = jax.grad(loss)(
        inp.veg_ext,
        SolverOptions(**kw, use_pallas_factory=True, use_pallas_sweeps=True),
    )
    assert np.isfinite(np.asarray(g_pal)).all()
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-6, atol=1e-8
    )
