"""Streaming column pipeline (parallel/streaming.py): chunked solves with
transfer/compute overlap must reproduce the one-shot results exactly —
library level (stream_columns around run_radsurf) and end-to-end through
the CLI's --stream-chunk flag.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_reference_cases import REF, read_out

pytestmark = pytest.mark.slow


def test_stream_columns_matches_one_shot():
    import __graft_entry__ as g
    from spartacus_surface_tpu.models.dispatch import run_radsurf
    from spartacus_surface_tpu.parallel.streaming import stream_columns
    from spartacus_surface_tpu.utils.config import Config

    config = Config(nsw=1, nlw=1, do_save_flux_profile=True)
    config.consolidate()
    # 13 columns, chunk 4: mixed tile types per chunk, a short tail chunk,
    # and more chunks than the in-flight depth.
    arrays = g._example_arrays(C=13, L=3, S=1, dtype=np.float64)

    solve = lambda a: run_radsurf(config, a)
    ref = solve(arrays)
    got = stream_columns(solve, arrays, chunk=4)

    for group in ("sw_norm_dir", "sw_norm_diff", "lw_internal", "lw_norm"):
        for key in ref[group]:
            np.testing.assert_allclose(
                np.asarray(ref[group][key]), np.asarray(got[group][key]),
                rtol=1e-12, atol=1e-12, err_msg=f"{group}/{key}",
            )
    for key in ref["bc_out"]:
        np.testing.assert_allclose(
            np.asarray(ref["bc_out"][key]), np.asarray(got["bc_out"][key]),
            rtol=1e-12, atol=1e-12, err_msg=key,
        )


def _run_cli(extra, outfile):
    res = subprocess.run(
        [sys.executable, "-m", "spartacus_surface_tpu.driver.main",
         "--platform=cpu", "--mesh=off", *extra,
         f"{REF}/simple/config.nam", f"{REF}/simple/test_surfaces_in.nc",
         str(outfile)],
        capture_output=True, text=True, timeout=900, cwd="/root/repo",
        env=dict(os.environ),
    )
    assert res.returncode == 0, res.stderr[-3000:]
    return res.stdout


def test_cli_stream_chunk_matches_one_shot(tmp_path):
    _run_cli([], tmp_path / "oneshot.nc")
    _run_cli(["--stream-chunk=2"], tmp_path / "streamed.nc")
    ref = read_out(tmp_path / "oneshot.nc")
    got = read_out(tmp_path / "streamed.nc")
    assert set(ref) == set(got)
    for name in ref:
        np.testing.assert_allclose(
            ref[name], got[name], rtol=1e-12, atol=1e-12, err_msg=name,
        )
