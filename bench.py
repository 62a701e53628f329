"""Benchmark: columns/sec/chip for the full SW+LW vegetated-urban solve.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (fixed shape, cf. BASELINE.md): vegetated-urban canopy, 8 layers,
1 spectral interval, 4 streams/hemisphere, 2 regions, SW (both
normalizations) + LW (internal + incoming) — the full per-timestep work of
the offline scheme, float32 on the available accelerator.

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
    import jax

    import __graft_entry__ as g
    from spartacus_surface_tpu.models.solver import (
        SolverOptions, spartacus_lw, spartacus_sw)
    from spartacus_surface_tpu.ops.legendre_gauss import LegendreGauss

    C, L, S = 16384, 8, 1
    opt = SolverOptions(nreg=2, nstream=4, do_urban=True)
    lg = LegendreGauss(4)
    sw_inp, lw_inp = g._example_inputs(C=C, L=L, S=S, dtype=np.float32)
    # Steady-state compute throughput: inputs resident on device (production
    # keeps canopy state on-chip across timesteps; host transfer is a
    # one-time cost and, over the dev tunnel, not representative).
    put = lambda x: None if x is None else jax.device_put(x)
    sw_inp = jax.tree_util.tree_map(put, sw_inp)
    lw_inp = jax.tree_util.tree_map(put, lw_inp)

    @jax.jit
    def step(sw_in, lw_in):
        nd, nf, bc = spartacus_sw(sw_in, opt, lg)
        li, ln, lbc = spartacus_lw(lw_in, opt, lg)
        # Reduce EVERY output so nothing is dead-code-eliminated, while
        # keeping device->host traffic negligible.
        import jax.numpy as jnp

        leaves = jax.tree_util.tree_leaves((nd, nf, bc, li, ln, lbc))
        checksum = sum(jnp.sum(leaf) for leaf in leaves)
        return nd["ground_dn"], checksum

    # Warm-up / compile
    out = step(sw_inp, lw_inp)
    jax.block_until_ready(out)

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step(sw_inp, lw_inp)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter

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
