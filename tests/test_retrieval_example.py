"""The adjoint retrieval example (examples/retrieval.py) converges:
gradient descent through the full solver reduces the observation misfit
by orders of magnitude (a capability the reference does not have)."""

import os
import sys
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_retrieval_converges():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from examples.retrieval import make_truth
    from spartacus_surface_tpu.models.solver import (
        SolverOptions, spartacus_sw)
    from spartacus_surface_tpu.ops.legendre_gauss import LegendreGauss

    rng = np.random.default_rng(1)
    C, L, S = 4, 2, 1
    opt = SolverOptions(nreg=2, nstream=2, do_urban=True, n_double=6)
    lg = LegendreGauss(2)
    inp, true_ext = make_truth(C, L, S, rng)

    def observe(veg_ext):
        out_dir, out_diff, bc = spartacus_sw(
            dataclasses.replace(inp, veg_ext=veg_ext), opt, lg
        )
        return jnp.stack([
            bc["top_albedo_dir"][:, 0],
            out_dir["ground_dn"][:, 0],
            out_dir["veg_abs"].sum(1)[:, 0],
        ])

    obs = observe(jnp.asarray(true_ext))

    def loss_fn(log_ext):
        return jnp.mean((observe(jnp.exp(log_ext)) - obs) ** 2)

    x = jnp.log(jnp.full((C, L), 0.3, jnp.float32))
    tx = optax.adam(0.05)
    state = tx.init(x)

    @jax.jit
    def step(x, state):
        loss, grad = jax.value_and_grad(loss_fn)(x)
        updates, state = tx.update(grad, state)
        return optax.apply_updates(x, updates), state, loss

    loss0 = float(loss_fn(x))
    for _ in range(60):
        x, state, loss = step(x, state)
    assert float(loss) < 1e-2 * loss0, (loss0, float(loss))
