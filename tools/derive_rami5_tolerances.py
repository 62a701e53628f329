"""Regenerate the rami5 per-field tolerance table (RAMI5_RTOL_FIELDS).

Runs the pyref oracle (the reference's eigen-route algorithm transcribed
to NumPy) against the production expm+doubling path in float64 on every
RAMI-V scene (62 layers x 14 bands, nreg=3, 4 streams — test/rami5), and
prints:

  1. the per-field worst RELATIVE error over elements with
     |oracle| > 1e-6, maximized across all five scenes;
  2. the worst ABSOLUTE error anywhere (the atol floor);
  3. the regenerated RAMI5_RTOL_FIELDS dict: fields whose observed error
     exceeds the global RTOL = 1e-5, each granted ~2x headroom rounded up
     to a round number.

The committed table in tests/test_pyref_parity.py must match this
script's output; rerun after any solver change that shifts the
eigen-vs-doubling route divergence.

Usage (from the repo root, ~4 min on CPU):
    python tools/derive_rami5_tolerances.py
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

RTOL_GLOBAL = 1e-5
SMALL = 1e-6  # relative error is meaningless below this oracle magnitude
_NICE = (1.0, 1.5, 2.0, 3.0, 4.0, 5.0, 6.0, 8.0, 10.0)


def _round_up_nice(x: float) -> float:
    """Smallest mantissa in _NICE * 10^k that is >= x."""
    exp = math.floor(math.log10(x))
    mant = x / 10.0**exp
    for n in _NICE:
        if n >= mant - 1e-12:
            return n * 10.0**exp
    return 10.0 ** (exp + 1)


def main() -> int:
    from spartacus_surface_tpu.models.dispatch import run_radsurf
    from tests.pyref.harness import PYREF_TILES, pyref_radsurf
    from tests.test_pyref_parity import (
        RAMI5_SCENES, RAMI5_RTOL_FIELDS, REF, _load)

    worst_rel: dict[str, float] = {}
    worst_abs = 0.0
    for scene in RAMI5_SCENES:
        config, arrays = _load(
            f"{REF}/rami5/config.nam",
            f"{REF}/rami5/scene_nc/rami5_{scene}_scene.nc",
            dc_updates=dict(cos_sza_override=np.cos(np.deg2rad(40.0))),
        )
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
                worst_abs = max(worst_abs, float(err.max(initial=0.0)))
                big = np.abs(want) > SMALL
                if big.any():
                    rel = float((err[big] / np.abs(want[big])).max())
                    worst_rel[key] = max(worst_rel.get(key, 0.0), rel)
        print(f"# {scene}: done", file=sys.stderr)

    print("# Per-field worst relative error (|oracle| > 1e-6), all scenes:")
    for key, rel in sorted(worst_rel.items(), key=lambda kv: -kv[1]):
        grant = (f"  -> grant {_round_up_nice(2.0 * rel):g}"
                 if rel > RTOL_GLOBAL else "")
        print(f"#   {key:28s} {rel:10.2e}{grant}")
    print(f"# Worst absolute error anywhere: {worst_abs:.2e}"
          f" (atol=1e-6 must cover this)")

    table = {
        key: _round_up_nice(2.0 * rel)
        for key, rel in sorted(worst_rel.items(), key=lambda kv: -kv[1])
        if rel > RTOL_GLOBAL
    }
    print("RAMI5_RTOL_FIELDS = {")
    for key, tol in table.items():
        print(f'    "{key}": {tol:g},')
    print("}")

    ok = True
    if set(table) != set(RAMI5_RTOL_FIELDS):
        ok = False
        print("# MISMATCH vs committed table: fields "
              f"{sorted(set(table) ^ set(RAMI5_RTOL_FIELDS))}")
    else:
        for key, tol in table.items():
            if not np.isclose(tol, RAMI5_RTOL_FIELDS[key]):
                ok = False
                print(f"# MISMATCH vs committed table: {key} {tol:g} != "
                      f"{RAMI5_RTOL_FIELDS[key]:g}")
    if worst_abs > 1e-6:
        ok = False
        print(f"# MISMATCH: worst abs {worst_abs:.2e} exceeds atol 1e-6")
    print(f"# {'REPRODUCES' if ok else 'DOES NOT REPRODUCE'} the committed"
          " table")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
