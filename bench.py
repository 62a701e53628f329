"""Benchmark: columns/sec/chip for the full SW+LW vegetated-urban solve.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (fixed shape, cf. BASELINE.md): vegetated-urban canopy, 8 layers,
1 spectral interval, 4 streams/hemisphere, 2 regions, SW (both
normalizations) + LW (internal + incoming) — the full per-timestep work of
the offline scheme, float32, inputs device-resident.

Measurement design (differential in-jit loop):
  * the timestep loop runs INSIDE one jitted program (lax.fori_loop with a
    dynamic trip count), each iteration data-dependent on the previous
    checksum so no step can be elided, reordered or memoized;
  * every solver output feeds the checksum, so nothing is dead-code
    eliminated;
  * the reported time is the DIFFERENCE between a long and a short run of
    the SAME executable divided by the iteration difference — dispatch,
    relay and fetch overheads cancel exactly, leaving pure device time.

The reference publishes no benchmark numbers (BASELINE.md); vs_baseline is
against this project's round-1 figure so later rounds report their speedup.
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

# Round-1 single-chip baseline (TPU v5e, this workload), columns/sec: the
# first honest full-solver measurement — XLA factory path, differential
# in-jit timing validated against a known-FLOPs matmul chain (150 TFLOP/s
# on the same methodology; see BASELINE.md).  Earlier 26.8M/34.8M figures
# were relay artifacts and are retracted in BASELINE.md.
ROUND1_BASELINE_COLS_PER_SEC = 7.0e3


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from spartacus_surface_tpu.models.solver import (
        SolverOptions, spartacus_lw, spartacus_sw)
    from spartacus_surface_tpu.ops.legendre_gauss import LegendreGauss

    C, L, S = 16384, 8, 1
    n_short, n_long = 3, 23
    opt = SolverOptions(nreg=2, nstream=4, do_urban=True)
    lg = LegendreGauss(4)
    sw_inp, lw_inp = g._example_inputs(C=C, L=L, S=S, dtype=np.float32)
    put = lambda x: None if x is None else jax.device_put(x)
    sw_inp = jax.tree_util.tree_map(put, sw_inp)
    lw_inp = jax.tree_util.tree_map(put, lw_inp)

    @jax.jit
    def run_n(sw_in, lw_in, n):
        def body(i, chain):
            a = dataclasses.replace(
                sw_in,
                veg_ext=sw_in.veg_ext + chain * 1e-30 + i * 1e-9,
            )
            nd, nf, bc = spartacus_sw(a, opt, lg)
            li, ln, lbc = spartacus_lw(lw_in, opt, lg)
            leaves = jax.tree_util.tree_leaves((nd, nf, bc, li, ln, lbc))
            return sum(jnp.sum(x) for x in leaves)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    # One executable for both trip counts (n is a dynamic argument)
    warm = float(run_n(sw_inp, lw_inp, 1))
    assert np.isfinite(warm)

    def timed(n):
        t0 = time.perf_counter()
        val = float(run_n(sw_inp, lw_inp, n))
        assert np.isfinite(val)
        return time.perf_counter() - t0

    # Median of three differential measurements
    steps = []
    for _ in range(3):
        t_short = timed(n_short)
        t_long = timed(n_long)
        steps.append(max(t_long - t_short, 1e-9) / (n_long - n_short))
    dt = float(np.median(steps))

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
