"""Distributed scaffolding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spartacus_surface_tpu.models.solver import SolverOptions, spartacus_sw
from spartacus_surface_tpu.ops.legendre_gauss import LegendreGauss
from spartacus_surface_tpu.parallel import distributed as dist
from tests.test_solver_conservation import make_inputs, residual_sw

pytestmark = pytest.mark.slow


def test_host_column_slice_single_process():
    s = dist.host_column_slice(100)
    assert s == slice(0, 100)


def test_pad_columns():
    arrays = {"a": np.arange(10.0).reshape(5, 2), "nlay": np.arange(5)}
    padded, ncol = dist.pad_columns(arrays, 8)
    assert ncol == 5
    assert padded["a"].shape == (8, 2)
    for row in padded["a"][5:]:
        np.testing.assert_array_equal(row, padded["a"][4])


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_global_mesh_solve_with_reduction():
    """Full solve over the global mesh with a cross-device conservation
    reduction (the only collective in the pipeline)."""
    mesh = dist.make_global_mesh()
    ndev = len(mesh.devices.ravel())
    rng = np.random.default_rng(17)
    inp = make_inputs(rng, C=2 * ndev, L=2, S=1, urban=True)
    opt = SolverOptions(nreg=2, nstream=2, do_urban=True, n_double=6)
    lg = LegendreGauss(2)

    sharded = dist.global_column_array(inp, mesh, 2 * ndev)

    @jax.jit
    def solve_and_reduce(x):
        nd, nf, bc = spartacus_sw(x, opt, lg)
        total_residual = (
            jnp.sum(nd["ground_net"]) + jnp.sum(nd["clear_air_abs"])
            + jnp.sum(nd["veg_abs"]) + jnp.sum(nd["veg_air_abs"])
            + jnp.sum(nd["wall_net"]) + jnp.sum(nd["roof_net"])
            - jnp.sum(nd["top_net"])
        )
        return nd, total_residual

    nd, total = solve_and_reduce(sharded)
    assert abs(float(total)) < 1e-9
    # Matches the unsharded run
    ref_nd, _, _ = spartacus_sw(inp, opt, lg)
    np.testing.assert_allclose(
        np.asarray(nd["ground_dn"]), np.asarray(ref_nd["ground_dn"]),
        rtol=1e-12,
    )
