"""True multi-process execution through the CLI driver.

The reference's one parallel mechanism actually runs (OpenMP over column
blocks, driver/spartacus_surface_driver.F90:199-234) and always produces a
single output file (radsurf_save.F90:26).  The process-level equivalent
here is jax.distributed over column slices: N coordinated processes each
solve their own contiguous column span, write OUTPUT.pNN, and process 0
merges the shards into the single OUTPUT after a barrier
(driver/merge.py).  The tests assert the merged multi-process output
matches the single-process run variable-for-variable, including uneven
column splits (ncol % nproc != 0), a 4-process run, and --stream-chunk
under multi-process.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from scipy.io import netcdf_file

pytestmark = pytest.mark.slow

CFG = "/root/reference/test/simple/config.nam"
INFILE = "/root/reference/test/simple/test_surfaces_in.nc"
BASE = [sys.executable, "-m", "spartacus_surface_tpu.driver.main",
        "--platform=cpu", "--mesh=off"]


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _read(path):
    f = netcdf_file(str(path), "r", mmap=False)
    out = {name: np.array(v[:]) for name, v in f.variables.items()}
    f.close()
    return out


def _run_single(infile, out, extra=()):
    res = subprocess.run(BASE + list(extra) + [CFG, str(infile), str(out)],
                         capture_output=True, text=True, timeout=900,
                         cwd="/root/repo")
    assert res.returncode == 0, res.stderr[-3000:]
    return res


def _run_procs(nproc, infile, out, extra=()):
    port = _free_port()
    procs = [
        subprocess.Popen(
            BASE + list(extra)
            + [f"--coordinator=127.0.0.1:{port}",
               f"--num-processes={nproc}", f"--process-id={pid}",
               CFG, str(infile), str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd="/root/repo",
        )
        for pid in range(nproc)
    ]
    logs = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, logs):
        assert p.returncode == 0, (so[-2000:], se[-3000:])
    return logs


def _assert_outputs_equal(ref, got):
    assert set(ref) == set(got)
    checked = 0
    for name, val in ref.items():
        merged = got[name]
        assert merged.shape == val.shape, name
        if val.dtype.kind == "f":
            np.testing.assert_allclose(merged, val, rtol=1e-12, atol=1e-12,
                                       err_msg=name)
        else:
            np.testing.assert_array_equal(merged, val, err_msg=name)
        checked += 1
    assert checked >= 10


def test_two_process_run_matches_single(tmp_path):
    out1 = tmp_path / "single.nc"
    _run_single(INFILE, out1)

    out2 = tmp_path / "multi.nc"
    logs = _run_procs(2, INFILE, out2)
    # Each process logged its own slice (iverbose=2 in the namelist)
    assert "Process 0/2: columns 1 to 2" in logs[0][0]
    assert "Process 1/2: columns 3 to 4" in logs[1][0]
    assert "Merged 2 output shards" in logs[0][0]

    # The package itself produced ONE merged file (reference contract,
    # radsurf_save.F90:26); shards are cleaned up by default.
    assert out2.exists()
    assert not os.path.exists(str(out2) + ".p00")
    assert not os.path.exists(str(out2) + ".p01")
    _assert_outputs_equal(_read(out1), _read(out2))


def _make_uneven_input(path, ncol=5):
    """A derived input whose column count is coprime with the process
    counts under test: the simple file's 4 columns plus a repeat of the
    first."""
    src = netcdf_file(INFILE, "r", mmap=False)
    ncol_in = src.dimensions["column"]
    assert ncol > ncol_in
    dst = netcdf_file(str(path), "w")
    for name, size in src.dimensions.items():
        dst.createDimension(name, ncol if name == "column" else size)
    for name, var in src.variables.items():
        data = np.array(var[:])
        if var.dimensions and var.dimensions[0] == "column":
            reps = [data[i % ncol_in] for i in range(ncol)]
            data = np.stack(reps, axis=0)
        v = dst.createVariable(name, data.dtype.char, var.dimensions)
        v[:] = data
    src.close()
    dst.close()


def test_four_process_uneven_with_stream_chunk(tmp_path):
    """4 processes x 5 columns (balanced 2/1/1/1 split) with the
    host->device streaming pipeline active in every process."""
    infile = tmp_path / "uneven_in.nc"
    _make_uneven_input(infile, ncol=5)

    out1 = tmp_path / "single.nc"
    _run_single(infile, out1)

    out4 = tmp_path / "multi4.nc"
    logs = _run_procs(4, infile, out4, extra=("--stream-chunk=1",))
    assert "Process 0/4: columns 1 to 2" in logs[0][0]
    assert "Process 1/4: columns 3 to 3" in logs[1][0]
    assert "Process 2/4: columns 4 to 4" in logs[2][0]
    assert "Process 3/4: columns 5 to 5" in logs[3][0]

    assert out4.exists()
    for pid in range(4):
        assert not os.path.exists(str(out4) + f".p{pid:02d}")
    _assert_outputs_equal(_read(out1), _read(out4))


def test_keep_shards_and_standalone_merge(tmp_path):
    """--keep-shards preserves the .pNN files and the standalone merge
    tool reproduces the merged output from them."""
    out1 = tmp_path / "single.nc"
    _run_single(INFILE, out1)

    out2 = tmp_path / "multi.nc"
    _run_procs(2, INFILE, out2, extra=("--keep-shards",))
    assert out2.exists()
    assert os.path.exists(str(out2) + ".p00")
    assert os.path.exists(str(out2) + ".p01")

    remerged = tmp_path / "remerged.nc"
    for pid in (0, 1):
        os.link(str(out2) + f".p{pid:02d}", str(remerged) + f".p{pid:02d}")
    res = subprocess.run(
        [sys.executable, "-m", "spartacus_surface_tpu.driver.merge",
         str(remerged)],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    _assert_outputs_equal(_read(out1), _read(remerged))
