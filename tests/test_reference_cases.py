"""End-to-end runs of the reference test suites (test/simple and
test/single_layer) with their own namelists and input files, validated by
the invariants the reference relies on (test/simple/README):

  * per-column energy conservation of the output fluxes;
  * forest/urban solver consistency on identical profiles;
  * empty-layer vs nearly-empty-layer closeness;
  * no-scattering analytic limits;
  * the SimpleUrban/InfiniteStreet solvers bracketing SPARTACUS on the
    single-layer sweep.
"""

import subprocess
import sys

import numpy as np
import pytest
from scipy.io import netcdf_file

# Slow tier: these spawn the full CLI driver end-to-end (multi-minute on
# CPU).  Their unique *physics* coverage (consistency, conservation,
# noscat, empty-layer metamorphics) is duplicated at unit level by the
# pyref-parity and conservation suites, which stay in the fast tier.
pytestmark = pytest.mark.slow

REF = "/root/reference/test"


def run_driver(config, infile, outfile, extra_nam=None, tmp_path=None):
    cfg = config
    if extra_nam:
        # Mimic change_namelist.sh: replace existing assignments, else
        # append to &radsurf_driver
        cfg = str(tmp_path / "config.nam")
        with open(config) as f:
            text = f.read()
        import re

        for assignment in extra_nam.split("\n"):
            key = assignment.split("=")[0].strip()
            if re.search(rf"^{key}\s*=", text, re.M):
                text = re.sub(rf"^{key}\s*=.*$", assignment.rstrip(","),
                              text, flags=re.M)
            else:
                text = text.replace(
                    "&radsurf_driver", "&radsurf_driver\n" + assignment
                )
        with open(cfg, "w") as f:
            f.write(text)
    res = subprocess.run(
        [sys.executable, "-m", "spartacus_surface_tpu.driver.main",
         "--platform=cpu", cfg, infile, str(outfile)],
        capture_output=True, text=True, timeout=900, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-3000:]
    return res.stdout


def read_out(path):
    f = netcdf_file(str(path), "r", mmap=False)
    out = {name: np.array(v[:]) for name, v in f.variables.items()}
    f.close()
    return out


def budget_residual(out, band):
    """Recompute the conservation residual from the OUTPUT file."""
    def lay_sum(name):
        if name not in out:
            return 0.0
        v = out[name]
        return np.where(v == -9999.0, 0.0, v).sum(-1)

    r = out[f"ground_flux_net_{band}"] + lay_sum(f"clear_air_absorption_{band}")
    for name in (f"wall_flux_net_{band}", f"roof_flux_net_{band}",
                 f"veg_absorption_{band}", f"veg_air_absorption_{band}"):
        r = r + lay_sum(name)
    return r - out[f"top_flux_net_{band}"]


@pytest.fixture(scope="module")
def simple_out(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("simple")
    outs = {}
    for case in ("surfaces", "consistency", "empty_layers",
                 "nearly_empty_layers", "noscat", "closed"):
        outfile = tmp / f"{case}_out.nc"
        run_driver(f"{REF}/simple/config.nam",
                   f"{REF}/simple/test_{case}_in.nc", outfile)
        outs[case] = read_out(outfile)
    return outs


def test_simple_conservation(simple_out):
    for case, out in simple_out.items():
        for band in ("sw", "lw"):
            res = budget_residual(out, band)
            np.testing.assert_allclose(
                res, 0.0, atol=5e-9,
                err_msg=f"{case} {band} residual {res}",
            )


def test_consistency_forest_vs_urban(simple_out):
    """Identical forest profiles run through the forest and urban solvers
    must agree (test/simple/README:8-11).  In this framework both use the
    same unified solver, so agreement is to rounding."""
    out = simple_out["consistency"]
    types = out["surface_type"]
    forest = np.nonzero(types == 1)[0]
    urban = np.nonzero(types == 3)[0]
    assert forest.size and urban.size and forest.size == urban.size
    for name in ("ground_flux_dn_sw", "ground_flux_net_sw", "top_flux_net_sw",
                 "ground_flux_dn_lw", "top_flux_net_lw"):
        np.testing.assert_allclose(
            out[name][forest], out[name][urban], rtol=1e-10, atol=1e-10,
            err_msg=name,
        )
    for name in ("veg_absorption_sw", "clear_air_absorption_lw"):
        np.testing.assert_allclose(
            out[name][forest], out[name][urban], rtol=1e-10, atol=1e-10,
            err_msg=name,
        )


def test_empty_vs_nearly_empty(simple_out):
    """Zero cover layers vs epsilon cover layers: outputs very close
    (test/simple/README:13-21)."""
    a = simple_out["empty_layers"]
    b = simple_out["nearly_empty_layers"]
    for name in ("ground_flux_dn_sw", "top_flux_net_sw", "ground_flux_dn_lw",
                 "top_flux_net_lw"):
        np.testing.assert_allclose(a[name], b[name], rtol=2e-4, atol=1e-3,
                                   err_msg=name)


def test_noscat_analytic(simple_out):
    """All facet albedos 0 / emissivities 1 (air still scatters slightly,
    air_ssa=0.999 default): every facet absorbs all it receives, so
    net == in at ground/roof/wall; for the flat column top net == top dn."""
    out = simple_out["noscat"]
    types = out["surface_type"]
    flat = np.nonzero(types == 0)[0]
    np.testing.assert_allclose(
        out["top_flux_net_sw"][flat], out["top_flux_dn_sw"][flat], rtol=1e-12
    )
    np.testing.assert_allclose(
        out["ground_flux_net_sw"], out["ground_flux_dn_sw"], rtol=1e-9
    )
    for name_net, name_in in (("roof_flux_net_sw", "roof_flux_in_sw"),
                              ("wall_flux_net_sw", "wall_flux_in_sw")):
        a, b = out[name_net], out[name_in]
        mask = a != -9999.0
        np.testing.assert_allclose(a[mask], b[mask], rtol=1e-9, atol=1e-9,
                                   err_msg=name_net)


def test_overhang_runs(tmp_path):
    out = tmp_path / "overhang_out.nc"
    run_driver(f"{REF}/simple/config.nam", f"{REF}/simple/test_overhang_in.nc",
               out)
    o = read_out(out)
    for band in ("sw", "lw"):
        np.testing.assert_allclose(budget_residual(o, band), 0.0, atol=5e-9)


def test_surfaces_1stream(tmp_path):
    out = tmp_path / "surf1_out.nc"
    run_driver(f"{REF}/simple/config_1stream.nam",
               f"{REF}/simple/test_surfaces_in.nc", out)
    o = read_out(out)
    for band in ("sw", "lw"):
        np.testing.assert_allclose(budget_residual(o, band), 0.0, atol=5e-9)


@pytest.mark.parametrize("itype", [2, 4, 5])
def test_single_layer_solvers(tmp_path, itype):
    """The three single-layer urban solvers (SPARTACUS 8-stream,
    SimpleUrban/exponential, InfiniteStreet) on the height sweep
    (test/single_layer/README)."""
    out = tmp_path / f"single_{itype}_out.nc"
    run_driver(f"{REF}/single_layer/config.nam",
               f"{REF}/single_layer/test_single_layer.nc", out,
               extra_nam=f"isurfacetype = {itype},", tmp_path=tmp_path)
    o = read_out(out)
    for band in ("sw", "lw"):
        res = budget_residual(o, band)
        np.testing.assert_allclose(res, 0.0, atol=1e-7,
                                   err_msg=f"type {itype} {band}")
    # Ground flux decreases as buildings get taller (deeper canyons)
    gd = o["ground_flux_dn_sw"]
    assert gd[0] > gd[-1]


def test_multiband_lw_extension(tmp_path):
    """nlw > 1 via the lw_band_fraction extension (the reference aborts,
    radsurf_simple_spectrum.F90:44-46).  The solve is linear per band and
    every input here is band-independent, so band-summed fluxes must equal
    the nlw = 1 broadband run to rounding."""
    base = "/root/reference/test/simple/config.nam"
    infile = "/root/reference/test/simple/test_surfaces_in.nc"
    out1 = tmp_path / "out1.nc"
    run_driver(base, infile, out1)

    with open(base) as f:
        text = f.read()
    text = text.replace("nlw = 1,", "nlw = 2,\nlw_band_fraction = 0.35, 0.65,")
    cfg2 = tmp_path / "config2.nam"
    cfg2.write_text(text)
    out2 = tmp_path / "out2.nc"
    run_driver(str(cfg2), infile, out2)

    a, b = read_out(out1), read_out(out2)
    checked = 0
    for k, v in a.items():
        if "lw" not in k or v.dtype.kind != "f":
            continue
        np.testing.assert_allclose(
            b[k], v, rtol=5e-6, atol=1e-6,
            err_msg=f"{k} (band-summed nlw=2 vs nlw=1)",
        )
        checked += 1
    assert checked >= 5
