"""Benchmark: columns/sec/chip for the full SW+LW vegetated-urban solve.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (fixed shape, cf. BASELINE.md): vegetated-urban canopy, 8 layers,
1 spectral interval, 4 streams/hemisphere, 2 regions, SW (both
normalizations) + LW (internal + incoming) — the full per-timestep work of
the offline scheme, float32 on the available accelerator.

Measurement discipline:
  * inputs are device-resident (production keeps canopy state on-chip);
  * every output feeds a checksum so XLA cannot dead-code-eliminate any of
    the sweep outputs;
  * each timed iteration uses a DISTINCT input variant (pre-built on
    device) and completion is forced by fetching the scalar checksum —
    robust against runtimes whose block_until_ready is asynchronous or
    that memoize identical executions.

The reference publishes no benchmark numbers (BASELINE.md); vs_baseline is
measured against this project's own round-1 single-chip TPU v5e figure so
later rounds report their speedup.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Round-1 single-chip baseline (TPU v5e, this workload), columns/sec:
# first honest full-solver measurement (all outputs forced, device-resident
# inputs, pre layout optimization; C=16384, float32, 2026-08-17).
# See BASELINE.md.  vs_baseline therefore tracks optimization progress.
ROUND1_BASELINE_COLS_PER_SEC = 26.8e6


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from spartacus_surface_tpu.models.solver import (
        SolverOptions, spartacus_lw, spartacus_sw)
    from spartacus_surface_tpu.ops.legendre_gauss import LegendreGauss

    C, L, S = 16384, 8, 1
    n_iter = 8
    opt = SolverOptions(nreg=2, nstream=4, do_urban=True)
    lg = LegendreGauss(4)
    sw_inp, lw_inp = g._example_inputs(C=C, L=L, S=S, dtype=np.float32)
    put = lambda x: None if x is None else jax.device_put(x)
    sw_inp = jax.tree_util.tree_map(put, sw_inp)
    lw_inp = jax.tree_util.tree_map(put, lw_inp)

    @jax.jit
    def perturb(inp, eps):
        return dataclasses.replace(inp, veg_ext=inp.veg_ext * (1.0 + eps))

    variants = []
    for i in range(n_iter):
        variants.append((
            perturb(sw_inp, 0.003 * i), perturb(lw_inp, 0.003 * i)
        ))
    jax.block_until_ready(variants)

    @jax.jit
    def step(sw_in, lw_in, chain):
        # `chain` makes consecutive steps data-dependent, so a lazy or
        # memoizing runtime cannot skip or reorder any of them.
        sw_in = dataclasses.replace(
            sw_in, veg_ext=sw_in.veg_ext + chain * 1e-30
        )
        nd, nf, bc = spartacus_sw(sw_in, opt, lg)
        li, ln, lbc = spartacus_lw(lw_in, opt, lg)
        leaves = jax.tree_util.tree_leaves((nd, nf, bc, li, ln, lbc))
        return sum(jnp.sum(leaf) for leaf in leaves)

    @jax.jit
    def trivial(chain):
        return chain + 1.0

    # Warm-up / compile
    warm = (perturb(sw_inp, 0.9), perturb(lw_inp, 0.9))
    chain = step(*warm, jnp.float32(0.0))
    chain_val = float(chain)  # also warms the fetch path
    assert np.isfinite(chain_val)

    # Calibrate the device->host fetch round-trip with a trivial chained
    # computation (on real hardware this is microseconds; over a dev
    # tunnel it can be seconds and must be subtracted).
    t0 = time.perf_counter()
    t_fetch = float(trivial(chain))
    fetch_latency = time.perf_counter() - t0
    assert np.isfinite(t_fetch)

    t0 = time.perf_counter()
    for a, b in variants:
        chain = step(a, b, chain)
    final = float(chain)  # forces the whole chain
    total = time.perf_counter() - t0
    assert np.isfinite(final)
    dt = max(total - fetch_latency, 1e-9) / n_iter

    n_chips = jax.device_count()
    cols_per_sec_per_chip = C / dt / n_chips
    print(json.dumps({
        "metric": "columns_per_sec_per_chip_sw_lw_urban8lay",
        "value": round(cols_per_sec_per_chip, 1),
        "unit": "columns/s/chip",
        "vs_baseline": round(
            cols_per_sec_per_chip / ROUND1_BASELINE_COLS_PER_SEC, 3
        ),
    }))


if __name__ == "__main__":
    main()
