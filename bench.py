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
    def step(sw_in, lw_in):
        nd, nf, bc = spartacus_sw(sw_in, opt, lg)
        li, ln, lbc = spartacus_lw(lw_in, opt, lg)
        leaves = jax.tree_util.tree_leaves((nd, nf, bc, li, ln, lbc))
        return sum(jnp.sum(leaf) for leaf in leaves)

    # Warm-up / compile on a throwaway variant
    warm = (perturb(sw_inp, 0.9), perturb(lw_inp, 0.9))
    w = step(*warm)
    jax.block_until_ready(w)

    # Probe whether device->host fetches complete promptly on this runtime
    # (some tunneled dev runtimes wedge on result fetches; real hardware
    # fetches in microseconds).  Fetch-based timing is the most robust
    # measurement when available, because it cannot be fooled by
    # asynchronous block_until_ready implementations.
    import threading

    fetch_ok = [False]

    def _try_fetch():
        try:
            if np.isfinite(float(w)):
                fetch_ok[0] = True
        except Exception:
            pass

    t = threading.Thread(target=_try_fetch, daemon=True)
    t.start()
    t.join(timeout=120.0)

    t0 = time.perf_counter()
    outs = [step(a, b) for a, b in variants]
    if fetch_ok[0]:
        checks = [float(o) for o in outs]  # forces completion
        assert all(np.isfinite(checks))
    else:
        jax.block_until_ready(outs)
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
