"""Benchmark: columns/sec/chip for the full SW+LW vegetated-urban solve.

Prints one JSON line per block, the HEADLINE metric LAST:
  {"metric": "compile_check_matrix_ok", ...}      AOT pre-flight, all configs
  {"metric": "pallas_xla_parity", ...}            on-chip kernel parity
  {"metric": "mesh_sharded_parity", ...}          kernels under NamedSharding
  {"metric": "columns_per_sec_per_chip_..._nreg3", ...}  hard RAMI-V config
  {"metric": "..._rami5_62lay_14band_nreg3", ...} flagship RAMI-V shape
  {"metric": "cli_end_to_end_columns_per_sec", ...}  the SHIPPED program:
      driver CLI on a 50k-column rami5 scene on hardware, read->solve->
      save, conservation-gated, output schema-checked
  {"metric": "grad_step_columns_per_sec_per_chip", ...}  full
      value-and-gradient (retrieval/adjoint) step throughput
  {"metric": "capacity_1M_columns_per_sec_per_chip", ...}
  {"metric": "columns_per_sec_per_chip_sw_lw_urban8lay", "value": N,
   "unit": "columns/s/chip", "vs_baseline": N}    headline (round-over-round)

EVERY block gates the exit code: a failed block prints {"metric", "error"}
and the bench exits nonzero even if the headline measured fine (round-3
lesson: rc ignored the nreg=3 and capacity blocks, so the exact config
whose crash erased round 2's evidence could regress silently).

Workload (fixed shape, cf. BASELINE.md): vegetated-urban canopy, 8 layers,
1 spectral interval, 4 streams/hemisphere, 2 regions, SW (both
normalizations) + LW (internal + incoming) — the full per-timestep work of
the offline scheme, float32, inputs device-resident.  The nreg=3 line is
the RAMI-V flagship configuration (n_vegetation_region=2, 4 streams,
nd=12) which round 1 could only run on the XLA fallback; the rami5 line
runs the flagship SHAPE the reference community actually submits — 62
layers x 14 spectral bands x nreg=3 x 4 streams
(test/rami5/config.nam, scene_nc/* are 1 x 62 x 14 columns).

Measurement design (differential in-jit loop):
  * the timestep loop runs INSIDE one jitted program (lax.fori_loop with a
    dynamic trip count), each iteration data-dependent on the previous
    checksum so no step can be elided, reordered or memoized;
  * every solver output feeds the checksum, so nothing is dead-code
    eliminated;
  * the reported time is the DIFFERENCE between a long and a short run of
    the SAME executable divided by the iteration difference — dispatch,
    relay and fetch overheads cancel exactly, leaving pure device time.

Parity design: for each (nreg, nstream) configuration the production
auto-selected path (Pallas factory + sweeps on real TPU) is compared
against the XLA reference path on identical device-resident inputs; the
reported number is the max relative error over every output leaf (fluxes,
sunlit fractions, profiles, boundary conditions).  This re-verifies the
"kernels agree to f32 rounding" claim on real hardware every round.

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
# Round-1 recorded figure for the headline workload (BENCH_r01.json), so
# the nreg=3 line can report its own vs_baseline meaningfully: round 1 ran
# that config on the XLA fallback at roughly baseline/6th of the nreg=2
# kernel-path throughput; we report vs the same 7k XLA-lowered baseline.
ROUND1_HEADLINE_COLS_PER_SEC = 759157.4


def _measure(run_n, sw_inp, lw_inp, C, n_short=3, n_long=23):
    """Median differential step time -> columns/sec (one executable)."""
    warm = float(run_n(sw_inp, lw_inp, 1))
    assert np.isfinite(warm)

    def timed(n):
        t0 = time.perf_counter()
        val = float(run_n(sw_inp, lw_inp, n))
        assert np.isfinite(val)
        return time.perf_counter() - t0

    steps = []
    for _ in range(3):
        t_short = timed(n_short)
        t_long = timed(n_long)
        steps.append(max(t_long - t_short, 1e-9) / (n_long - n_short))
    return C / float(np.median(steps))


def _make_run_n(opt, lg, spartacus_sw, spartacus_lw):
    import jax
    import jax.numpy as jnp

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

    return run_n


def _max_rel_err(a, b):
    """Worst per-FIELD scale-normalized error: max|x-y| / max(1, field
    scale).  Per-element relative error is not meaningful here: several
    outputs (veg_abs, wall_net) are small residuals of ~1e3-scale
    intermediate cancellations (absorption = integrated flux - emission,
    radsurf_urban_lw.F90:780-828), where f32 rounding alone injects
    ~scale*eps ~ 1e-4 absolute noise on near-zero elements.  Normalizing
    by the field's own magnitude (fluxes are per-unit-TOC, so O(1)..O(1e2))
    measures what matters: no output field deviates beyond f32 rounding of
    the quantities it was computed from."""
    import jax

    worst = 0.0
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        scale = max(1.0, float(np.abs(x).max()), float(np.abs(y).max()))
        worst = max(worst, float(np.abs(x - y).max()) / scale)
    return worst


def _parity_block(g, SolverOptions, LegendreGauss, spartacus_sw, spartacus_lw):
    """Pallas-vs-XLA full-solver parity on the real chip, per config."""
    import jax

    configs = [(1, 2), (2, 4), (3, 4), (2, 8)]
    C, L, S = 1024, 8, 1
    out = {}
    for nreg, ns in configs:
        lg = LegendreGauss(ns)
        sw_inp, lw_inp = g._example_inputs(C=C, L=L, S=S, dtype=np.float32)
        put = lambda x: None if x is None else jax.device_put(x)
        sw_inp = jax.tree_util.tree_map(put, sw_inp)
        lw_inp = jax.tree_util.tree_map(put, lw_inp)
        base = dict(nreg=nreg, nstream=ns, do_urban=True)
        opt_auto = SolverOptions(**base)  # production path (kernels on TPU)
        opt_xla = SolverOptions(
            **base, use_pallas_factory=False, use_pallas_sweeps=False
        )

        def solve(opt):
            f = jax.jit(lambda a, b: (
                spartacus_sw(a, opt, lg), spartacus_lw(b, opt, lg)))
            return jax.device_get(f(sw_inp, lw_inp))

        err = _max_rel_err(solve(opt_auto), solve(opt_xla))
        out[f"nreg{nreg}_ns{ns}"] = round(err, 9)
    return out


def _block(fn, metric):
    """Fail-soft block runner: one bad config can never erase the other
    blocks' evidence (round-2 lesson: the nreg=3 compile crash killed the
    whole bench before a single metric printed).  Prints either the
    block's own JSON line or {"metric": ..., "error": tail}; returns
    whether the block succeeded."""
    import traceback

    try:
        fn()
        return True
    except Exception:
        tail = traceback.format_exc()[-1500:]
        print(json.dumps({"metric": metric, "error": tail}))
        return False


def main() -> int:
    import jax

    import __graft_entry__ as g
    from spartacus_surface_tpu.models.solver import (
        SolverOptions, spartacus_lw, spartacus_sw)
    from spartacus_surface_tpu.ops.legendre_gauss import LegendreGauss

    n_chips = jax.device_count()
    put = lambda x: None if x is None else jax.device_put(x)
    lg4 = LegendreGauss(4)
    # Every named block must succeed for rc == 0 (see module docstring).
    ok: dict[str, bool] = {}

    # --- pre-flight: AOT-compile every auto-enabled kernel config --------
    def compile_blk():
        g.compile_check_matrix(verbose=False)
        print(json.dumps({
            "metric": "compile_check_matrix_ok",
            "value": len(g.ENTRY_CONFIGS),
            "unit": "configs_compiled",
            "vs_baseline": 1.0,
        }))

    ok["compile"] = _block(compile_blk, "compile_check_matrix_ok")

    # --- on-chip kernel parity (auto path vs XLA reference) -------------
    def parity_blk():
        parity = _parity_block(
            g, SolverOptions, LegendreGauss, spartacus_sw, spartacus_lw)
        # Threshold: the measured f32 rounding floor between the two
        # (independently correct) paths is ~1.9e-3 on the worst field —
        # LW wall_net, a residual of ~1e3-scale absorption integrals whose
        # Schur inverses amplify f32 rounding; a LOGIC bug (wrong term,
        # miscompile) shows at >= 1e-1 field scale, 50x above this gate.
        parity_ok = all(v < 2.5e-3 for v in parity.values())
        print(json.dumps({
            "metric": "pallas_xla_parity_max_rel_err",
            "value": max(parity.values()),
            "unit": "rel_err",
            "ok": parity_ok,
            "per_config": parity,
        }))
        assert parity_ok, f"parity gate failed: {parity}"

    ok["parity"] = _block(parity_blk, "pallas_xla_parity_max_rel_err")

    # --- kernels under NamedSharding (production mesh path) --------------
    def mesh_blk():
        from spartacus_surface_tpu.models.dispatch import run_radsurf
        from spartacus_surface_tpu.parallel.mesh import make_mesh
        from spartacus_surface_tpu.utils.config import Config

        config = Config(nsw=1, nlw=1, do_save_flux_profile=True)
        config.consolidate()
        arrays = g._example_arrays(C=2048, L=8, S=1)
        ref = jax.device_get(run_radsurf(config, arrays, mesh=None))
        mesh = make_mesh(n_chips)
        got = jax.device_get(run_radsurf(config, arrays, mesh=mesh))
        err = _max_rel_err(ref, got)
        # Same arithmetic on the same chip; only the sharding annotations
        # differ, so anything beyond f32 reassociation noise is a
        # partitioning bug.
        mesh_ok = err < 1e-6
        print(json.dumps({
            "metric": "mesh_sharded_parity_max_rel_err",
            "value": err,
            "unit": "rel_err",
            "ok": mesh_ok,
            "n_mesh_devices": int(mesh.devices.size),
        }))
        assert mesh_ok, f"mesh parity gate failed: {err}"

    ok["mesh"] = _block(mesh_blk, "mesh_sharded_parity_max_rel_err")

    # --- nreg=3 x 4-stream (RAMI-V flagship config, nd=12) --------------
    def nreg3_blk():
        C3 = 8192
        opt3 = SolverOptions(nreg=3, nstream=4, do_urban=True,
                             column_chunk=-1)
        sw3, lw3 = g._example_inputs(C=C3, L=8, S=1, dtype=np.float32)
        sw3 = jax.tree_util.tree_map(put, sw3)
        lw3 = jax.tree_util.tree_map(put, lw3)
        run3 = _make_run_n(opt3, lg4, spartacus_sw, spartacus_lw)
        cps3 = _measure(run3, sw3, lw3, C3) / n_chips
        print(json.dumps({
            "metric": "columns_per_sec_per_chip_sw_lw_urban8lay_nreg3",
            "value": round(cps3, 1),
            "unit": "columns/s/chip",
            "vs_baseline": round(cps3 / ROUND1_BASELINE_COLS_PER_SEC, 3),
        }))

    ok["nreg3"] = _block(
        nreg3_blk, "columns_per_sec_per_chip_sw_lw_urban8lay_nreg3")

    # --- flagship RAMI-V shape: 62 layers x 14 bands x nreg=3 x ns=4 -----
    def rami5_blk():
        C5, L5, S5 = 1024, 62, 14
        opt5 = SolverOptions(nreg=3, nstream=4, do_urban=True,
                             column_chunk=-1)
        sw5, lw5 = g._example_inputs(C=C5, L=L5, S=S5, dtype=np.float32)
        sw5 = jax.tree_util.tree_map(put, sw5)
        lw5 = jax.tree_util.tree_map(put, lw5)
        run5 = _make_run_n(opt5, lg4, spartacus_sw, spartacus_lw)
        cps5 = _measure(run5, sw5, lw5, C5, n_short=1, n_long=4) / n_chips
        # vs_baseline normalizes per unit of (layer x band) work so the
        # number is comparable with the 8-layer single-band baseline.
        work_ratio = (L5 * S5) / 8.0
        print(json.dumps({
            "metric": "columns_per_sec_per_chip_rami5_62lay_14band_nreg3",
            "value": round(cps5, 1),
            "unit": "columns/s/chip",
            "vs_baseline": round(
                cps5 * work_ratio / ROUND1_BASELINE_COLS_PER_SEC, 3
            ),
        }))

    ok["rami5"] = _block(
        rami5_blk, "columns_per_sec_per_chip_rami5_62lay_14band_nreg3")

    # --- production CLI end-to-end on hardware (rami5 scene, 50k cols) ---
    def cli_blk():
        import re
        import subprocess
        import sys
        import tempfile

        from spartacus_surface_tpu.driver.duplicate_profiles import (
            DEFAULT_COS_SZA, duplicate_profiles)

        tmp = tempfile.mkdtemp(prefix="spartacus_cli_e2e_")
        ncol = 50048  # 1088 copies of the 46-angle SZA sweep
        inp = f"{tmp}/input50k.nc"
        outp = f"{tmp}/out50k.nc"
        cos = np.tile(DEFAULT_COS_SZA, ncol // 46 + 1)[:ncol]
        duplicate_profiles(
            "/root/reference/test/rami5/scene_nc/"
            "rami5_HET07_JPS_SUM_scene.nc",
            inp, cos_sza=cos, n_copies=ncol)

        # The program the reference ships: namelist -> NetCDF read ->
        # solver (kernels auto-on, streaming auto-on at this size) ->
        # conservation check -> NetCDF write, on the real chip.
        # single precision IS the TPU production configuration (double
        # runs the XLA fallback path).  The persistent compilation cache
        # makes repeat invocations the steady-state cost.
        proc = subprocess.run(
            [sys.executable, "-m", "spartacus_surface_tpu.driver.main",
             "/root/reference/test/rami5/config.nam", inp, outp,
             "--precision", "single", "--timings"],
            capture_output=True, text=True, timeout=3000,
        )
        assert proc.returncode == 0, proc.stderr[-1500:]
        text = proc.stdout

        phases = dict(re.findall(
            r"^\s+(radsurf|save|read_input)\s+([0-9.]+) s", text, re.M))
        assert set(phases) == {"radsurf", "save", "read_input"}, phases
        residuals = [float(m) for m in re.findall(
            r"max \|residual\| = ([0-9.e+-]+)", text)]
        assert len(residuals) == 2 and max(residuals) < 1e-4, residuals

        # Output schema: dims, key variables, fill discipline, finiteness
        from scipy.io import netcdf_file

        f = netcdf_file(outp, "r", mmap=False)
        assert f.dimensions["column"] == ncol
        for name in ("height", "ground_spectral_flux_dn_sw",
                     "spectral_flux_dn_layer_top_sw",
                     "ground_sunlit_fraction", "wall_spectral_flux_net_sw"):
            assert name in f.variables, name
        g = np.array(f.variables["ground_spectral_flux_dn_sw"][:])
        assert g.shape == (ncol, 14) and np.isfinite(g).all()
        prof = np.array(
            f.variables["spectral_flux_dn_layer_top_sw"][:1000])
        assert np.isfinite(prof[prof != -9999.0]).all()
        f.close()

        import shutil

        shutil.rmtree(tmp, ignore_errors=True)  # ~2.4 GB of scratch
        total = sum(float(v) for v in phases.values())
        print(json.dumps({
            "metric": "cli_end_to_end_columns_per_sec",
            "value": round(ncol / total, 1),
            "unit": "columns/s/chip",
            "vs_baseline": round(
                ncol / total / ROUND1_BASELINE_COLS_PER_SEC, 3),
            "ncol": ncol,
            "read_s": round(float(phases["read_input"]), 1),
            "solve_s": round(float(phases["radsurf"]), 1),
            "save_s": round(float(phases["save"]), 1),
            "conservation_max_residual": max(residuals),
            "note": ("62-layer 14-band rami5 scene; solve time on this"
                     " dev relay is dominated by tunnel-bandwidth"
                     " output fetches, not device compute"),
        }))

    ok["cli"] = _block(cli_blk, "cli_end_to_end_columns_per_sec")

    # --- backward pass: full forward+gradient step throughput ------------
    def grad_blk():
        import jax.numpy as jnp

        Cg = 4096
        optg = SolverOptions(nreg=2, nstream=4, do_urban=True)
        swg, lwg = g._example_inputs(C=Cg, L=8, S=1, dtype=np.float32)
        swg = jax.tree_util.tree_map(put, swg)
        lwg = jax.tree_util.tree_map(put, lwg)

        def loss(veg_ext, sw_in, lw_in):
            a = dataclasses.replace(sw_in, veg_ext=veg_ext)
            nd, nf, bc = spartacus_sw(a, optg, lg4)
            li, ln, lbc = spartacus_lw(lw_in, optg, lg4)
            leaves = jax.tree_util.tree_leaves((nd, nf, bc, li, ln, lbc))
            return sum(jnp.sum(x) for x in leaves)

        gfun = jax.grad(loss)

        @jax.jit
        def run_n(sw_in, lw_in, n):
            def body(i, chain):
                ve = sw_in.veg_ext + chain * 1e-30 + i * 1e-9
                return jnp.sum(gfun(ve, sw_in, lw_in))

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        cps = _measure(run_n, swg, lwg, Cg, n_short=1, n_long=6) / n_chips
        print(json.dumps({
            "metric": "grad_step_columns_per_sec_per_chip",
            "value": round(cps, 1),
            "unit": "columns/s/chip",
            # normalized against the same round-1 forward baseline: a
            # full value-and-gradient step vs a plain forward solve
            "vs_baseline": round(cps / ROUND1_BASELINE_COLS_PER_SEC, 3),
        }))

    ok["grad"] = _block(grad_blk, "grad_step_columns_per_sec_per_chip")

    # --- 1M-column single-chip capacity (column_chunk streaming) ---------
    def capacity_blk():
        C1m = 1048576
        # AUTO chunking (the production default through run_radsurf):
        # resolves to ~2048-column chunks, which both bound the HBM
        # working set AND are the measured throughput optimum (131072
        # chunks ran at 1.41M cols/s, 2048 at 1.90M, v5e round 4).
        opt1m = SolverOptions(
            nreg=2, nstream=4, do_urban=True, column_chunk=-1
        )
        sw1, lw1 = g._example_inputs(C=C1m, L=8, S=1, dtype=np.float32)
        sw1 = jax.tree_util.tree_map(put, sw1)
        lw1 = jax.tree_util.tree_map(put, lw1)
        run1 = _make_run_n(opt1m, lg4, spartacus_sw, spartacus_lw)
        cps1 = _measure(run1, sw1, lw1, C1m, n_short=1, n_long=4) / n_chips
        print(json.dumps({
            "metric": "capacity_1M_columns_per_sec_per_chip",
            "value": round(cps1, 1),
            "unit": "columns/s/chip",
            "vs_baseline": round(cps1 / ROUND1_BASELINE_COLS_PER_SEC, 3),
        }))

    ok["capacity"] = _block(capacity_blk, "capacity_1M_columns_per_sec_per_chip")

    # --- headline: nreg=2 x 4-stream ------------------------------------
    def headline_blk():
        C = 16384
        opt = SolverOptions(nreg=2, nstream=4, do_urban=True,
                            column_chunk=-1)
        sw_inp, lw_inp = g._example_inputs(C=C, L=8, S=1, dtype=np.float32)
        sw_inp = jax.tree_util.tree_map(put, sw_inp)
        lw_inp = jax.tree_util.tree_map(put, lw_inp)
        run_n = _make_run_n(opt, lg4, spartacus_sw, spartacus_lw)
        cols_per_sec_per_chip = _measure(run_n, sw_inp, lw_inp, C) / n_chips
        print(json.dumps({
            "metric": "columns_per_sec_per_chip_sw_lw_urban8lay",
            "value": round(cols_per_sec_per_chip, 1),
            "unit": "columns/s/chip",
            "vs_baseline": round(
                cols_per_sec_per_chip / ROUND1_BASELINE_COLS_PER_SEC, 3
            ),
            "vs_round1": round(
                cols_per_sec_per_chip / ROUND1_HEADLINE_COLS_PER_SEC, 3
            ),
        }))

    ok["headline"] = _block(
        headline_blk, "columns_per_sec_per_chip_sw_lw_urban8lay")

    # Self-gating: EVERY block must have succeeded (compile pre-flight,
    # both parity gates, and all four throughput measurements).
    return 0 if all(ok.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
