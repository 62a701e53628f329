"""Regenerate the empty-layer tolerance table (EMPTY_RTOL_FIELDS).

The empty/nearly-empty simple-suite cases put region fractions at or
below the excision threshold, where the pyref oracle removes the region
from the system (a dimension change, matching the reference's
radsurf_overlap.F90 excision) while the production dense-masked design
zeroes its couplings.  The two routes then integrate absorption through
a near-singular Gamma inverse, diverging measurably in a handful of
ABSORPTION fields.  This script MEASURES that divergence instead of
guessing it: it runs both routes in float64 on test_empty_layers_in.nc
and test_nearly_empty_layers_in.nc (test/simple/Makefile) and prints

  1. the per-field worst RELATIVE error over elements with
     |oracle| > 1e-6, maximized across both cases;
  2. the worst ABSOLUTE error anywhere (the shared atol must cover it);
  3. the regenerated EMPTY_RTOL_FIELDS dict: fields whose observed error
     exceeds the global RTOL = 1e-5, each granted ~3x headroom rounded
     up to a round number (3x not 2x: the divergence here is a
     conditioning artifact that moves with compiler/JAX versions, see
     PARITY_NOTES #13).

The committed table in tests/test_pyref_parity.py must match this
script's output; rerun after any solver or environment change that
shifts the excision-vs-masking divergence.

Usage (from the repo root, ~1 min on CPU):
    python tools/derive_empty_tolerances.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from derive_rami5_tolerances import _round_up_nice  # noqa: E402

RTOL_GLOBAL = 1e-5
SMALL = 1e-6
HEADROOM = 3.0

CASES = ("empty_layers", "nearly_empty_layers")


def main() -> int:
    from spartacus_surface_tpu.models.dispatch import run_radsurf
    from tests.pyref.harness import PYREF_TILES, pyref_radsurf
    from tests.test_pyref_parity import ATOL, EMPTY_RTOL_FIELDS, REF, _load

    worst_rel: dict[str, float] = {}
    worst_abs = 0.0
    for case in CASES:
        config, arrays = _load(f"{REF}/simple/config.nam",
                               f"{REF}/simple/test_{case}_in.nc")
        oracle = pyref_radsurf(config, arrays)
        got = run_radsurf(config, arrays)
        cols = np.isin(np.asarray(arrays["i_representation"]), PYREF_TILES)
        containers = [c for c in ("sw_norm_dir", "sw_norm_diff",
                                  "lw_internal", "lw_norm") if c in oracle]
        containers.append("bc_out")
        for cname in containers:
            for key in sorted(oracle[cname]):
                want = np.asarray(oracle[cname][key])[cols]
                have = np.asarray(got[cname][key])[cols]
                err = np.abs(have - want)
                big = np.abs(want) > SMALL
                # atol's job is the near-zero elements (rtol carries the
                # rest), so measure the absolute floor only there.
                if (~big).any():
                    worst_abs = max(
                        worst_abs, float(err[~big].max(initial=0.0)))
                if big.any():
                    rel = float((err[big] / np.abs(want[big])).max())
                    worst_rel[key] = max(worst_rel.get(key, 0.0), rel)
        print(f"# {case}: done", file=sys.stderr)

    print("# Per-field worst relative error (|oracle| > 1e-6), both cases:")
    for key, rel in sorted(worst_rel.items(), key=lambda kv: -kv[1]):
        grant = (f"  -> grant {_round_up_nice(HEADROOM * rel):g}"
                 if rel > RTOL_GLOBAL else "")
        print(f"#   {key:28s} {rel:10.2e}{grant}")
    print(f"# Worst absolute error anywhere: {worst_abs:.2e}"
          f" (atol={ATOL:g} must cover this)")

    table = {
        key: _round_up_nice(HEADROOM * rel)
        for key, rel in sorted(worst_rel.items(), key=lambda kv: -kv[1])
        if rel > RTOL_GLOBAL
    }
    print("EMPTY_RTOL_FIELDS = {")
    for key, tol in table.items():
        print(f'    "{key}": {tol:g},')
    print("}")

    ok = True
    if set(table) != set(EMPTY_RTOL_FIELDS):
        ok = False
        print("# MISMATCH vs committed table: fields "
              f"{sorted(set(table) ^ set(EMPTY_RTOL_FIELDS))}")
    else:
        for key, tol in table.items():
            if not np.isclose(tol, EMPTY_RTOL_FIELDS[key]):
                ok = False
                print(f"# MISMATCH vs committed table: {key} {tol:g} != "
                      f"{EMPTY_RTOL_FIELDS[key]:g}")
    if worst_abs > ATOL:
        ok = False
        print(f"# MISMATCH: worst abs {worst_abs:.2e} exceeds atol {ATOL:g}")
    print(f"# {'REPRODUCES' if ok else 'DOES NOT REPRODUCE'} the committed"
          " table")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
