"""Config echo at iverbose >= 2 through the real CLI.

Parity target: radsurf_config.F90:275-362 (print_config called by the
driver after consolidate).  The echo must show the CONSOLIDATED values —
streams, regions, flags — for a reference namelist.  Fast by design: the
input file deliberately lacks the required variables, so the CLI prints
the echo, then fails input reading with a clean error (rc = 1), never
reaching the solver.
"""

import subprocess
import sys

import numpy as np
import pytest
from scipy.io import netcdf_file

CFG = "/root/reference/test/simple/config.nam"


def test_cli_config_echo_contains_consolidated_values(tmp_path):
    bogus = tmp_path / "empty.nc"
    f = netcdf_file(str(bogus), "w")
    f.createDimension("column", 1)
    v = f.createVariable("unrelated", "d", ("column",))
    v[:] = np.zeros(1)
    f.close()

    res = subprocess.run(
        [sys.executable, "-m", "spartacus_surface_tpu.driver.main",
         "--platform=cpu", CFG, str(bogus), str(tmp_path / "out.nc")],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert res.returncode == 1
    assert "Error reading" in res.stderr
    out = res.stdout

    # ~12 key lines of the consolidated config for test/simple/config.nam
    # (do_sw/do_lw true, nsw=nlw=1, 2 vegetation regions, 2 streams,
    # conservation-relevant flags) — radsurf_config.F90:275-362 analogue.
    expected = [
        "Do shortwave (SW) calculations ON",
        "Do longwave (LW) calculations ON",
        "Number of SW spectral intervals = 1",
        "Number of LW spectral intervals = 1",
        "Number of vegetation regions = 2",
        "SW diffuse streams per hemisphere = 2",
        "LW streams per hemisphere = 2",
        "Use symmetric vegetation scale ON",
        "Vegetation isolation factor = 0",
        "Minimum vegetation fraction = 1e-06",
        "Minimum building fraction = 1e-06",
        "Save broadband fluxes ON",
    ]
    for line in expected:
        assert line in out, f"echo missing: {line!r}\n--- stdout ---\n{out}"
    # Settings appear for BOTH tile families (forest and urban sections)
    assert "Settings for forests:" in out
    assert "Settings for urban areas:" in out
