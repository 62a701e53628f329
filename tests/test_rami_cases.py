"""End-to-end runs of the RAMI4PILPS and urban-SZA-sweep suites with the
duplicated-profile workflow (test/rami4pilps/Makefile, test/urban/Makefile).

The published RAMI4PILPS reference values are external (Matlab plotting
against Hogan et al. 2018); here we assert the physics invariants the
intercomparison relies on: conservation, albedo bracketing between the soil
and snow albedos, monotonic behaviour with solar zenith angle, and
stream-count convergence.
"""

import numpy as np
import pytest
from scipy.io import netcdf_file

from spartacus_surface_tpu.driver.duplicate_profiles import (
    DEFAULT_COS_SZA, duplicate_profiles)
from tests.test_reference_cases import budget_residual, read_out, run_driver

REF = "/root/reference/test"


@pytest.fixture(scope="module")
def rami_input(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rami")
    path = tmp / "rami4pilps.nc"
    duplicate_profiles(f"{REF}/rami4pilps/rami4pilps_base_profile.nc",
                       str(path))
    return path


def _run_case(tmp_path, rami_input, band, surf, frac, nvegreg=None,
              nstream=None):
    ssa = {"vis": 0.1301, "nir": 0.8058}[band]
    albedo = {("vis", "med"): 0.1217, ("vis", "snw"): 0.9640,
              ("nir", "med"): 0.2142, ("nir", "snw"): 0.5568}[(band, surf)]
    extra = (f"vegetation_fraction = {frac},\n"
             f"ground_sw_albedo = {albedo},\n"
             f"vegetation_sw_ssa = {ssa},")
    if nvegreg is not None:
        extra += f"\nn_vegetation_region_forest = {nvegreg},"
    if nstream is not None:
        extra += f"\nn_stream_sw_forest = {nstream},"
    out = tmp_path / f"{band}-{surf}-{frac}_out.nc"
    run_driver(f"{REF}/rami4pilps/config.nam", str(rami_input), out,
               extra_nam=extra, tmp_path=tmp_path)
    return read_out(out)


def test_rami4pilps_vis_snw(tmp_path, rami_input):
    """Snow under sparse dark canopy: scene albedo below snow albedo,
    above... the vegetation albedo; decreasing with veg cover."""
    albs = {}
    for frac in (0.1, 0.3, 0.5):
        out = _run_case(tmp_path, rami_input, "vis", "snw", frac)
        res = budget_residual(out, "sw")
        np.testing.assert_allclose(res, 0.0, atol=1e-9)
        # Scene albedo = 1 - top_net / top_dn (unit incoming flux)
        alb = 1.0 - out["top_flux_net_sw"] / out["top_flux_dn_sw"]
        assert np.all(alb < 0.964) and np.all(alb > 0.0)
        albs[frac] = alb
    # More dark vegetation -> lower albedo (at grazing angles the canopy
    # intercepts nearly everything regardless of cover, so exclude the two
    # most extreme angles)
    assert np.all(albs[0.5][:-4] < albs[0.3][:-4])
    assert np.all(albs[0.3][:-4] < albs[0.1][:-4])
    assert albs[0.5].mean() < albs[0.3].mean() < albs[0.1].mean()
    # Low sun: more interception by the canopy -> lower albedo than
    # overhead sun for a dark canopy over bright snow
    assert albs[0.5][0] > albs[0.5][-2]


def test_rami4pilps_stream_convergence(tmp_path, rami_input):
    """Results converge with stream count: ||alb(8 streams) - alb(4)||
    much smaller than ||alb(2) - alb(1)||
    (doc/spartacus_surface_documentation.tex:656-661: little change above
    4 streams)."""
    alb = {}
    for ns in (1, 2, 4, 8):
        out = _run_case(tmp_path, rami_input, "nir", "med", 0.3, nvegreg=2,
                        nstream=ns)
        alb[ns] = 1.0 - out["top_flux_net_sw"] / out["top_flux_dn_sw"]
    d21 = np.abs(alb[2] - alb[1]).max()
    d84 = np.abs(alb[8] - alb[4]).max()
    assert d84 < 0.25 * d21
    assert d84 < 2e-3


def test_urban_sza_sweep(tmp_path):
    """46-SZA Russell Square sweep (test/urban/Makefile:18-28): ground
    direct flux decreases monotonically as the sun lowers."""
    dup = tmp_path / "russell_sweep.nc"
    duplicate_profiles(f"{REF}/urban/russell_square.nc", str(dup))
    out_path = tmp_path / "russell_sweep_out.nc"
    run_driver(f"{REF}/urban/config.nam", str(dup), out_path,
               extra_nam="iverbose = 1,", tmp_path=tmp_path)
    out = read_out(out_path)
    np.testing.assert_allclose(budget_residual(out, "sw"), 0.0, atol=1e-8)
    gdd = out["ground_flux_dn_direct_sw"]
    assert np.all(np.diff(gdd) <= 1e-9)
    # Ground sunlit fraction also decreases with solar zenith angle
    gsf = out["ground_sunlit_fraction"]
    assert gsf[0] > gsf[-1]
