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

pytestmark = pytest.mark.slow

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


def test_rami4pilps_full_scene_matrix(rami_input):
    """The reference's full `test_scenes` matrix — 2 bands x 2 surfaces x
    3 covers (test/rami4pilps/Makefile:36-40) — solved in ONE batched run
    over (case x 46 SZA) columns instead of 12 driver invocations."""
    from spartacus_surface_tpu.driver.read_input import read_input
    from spartacus_surface_tpu.models import flux_utils
    from spartacus_surface_tpu.models.dispatch import run_radsurf
    from spartacus_surface_tpu.utils.config import Config, DriverConfig

    SSA = {"vis": 0.1301, "nir": 0.8058}
    ALB = {("vis", "med"): 0.1217, ("vis", "snw"): 0.9640,
           ("nir", "med"): 0.2142, ("nir", "snw"): 0.5568}
    cases = [(band, surf, cover)
             for band in ("vis", "nir")
             for surf in ("med", "snw")
             for cover in (0.1, 0.3, 0.5)]

    config = Config.from_namelist(f"{REF}/rami4pilps/config.nam")
    config.consolidate()
    dc = DriverConfig.from_namelist(f"{REF}/rami4pilps/config.nam")
    data = read_input(str(rami_input), config, dc)
    arrays = data["arrays"]
    nsza = arrays["cos_sza"].shape[0]

    ncase = len(cases)
    arrays = {k: np.tile(v, (ncase,) + (1,) * (v.ndim - 1))
              for k, v in arrays.items()}
    for i, (band, surf, cover) in enumerate(cases):
        sel = slice(i * nsza, (i + 1) * nsza)
        arrays["veg_fraction"][sel] = cover
        arrays["ground_albedo"][sel] = ALB[(band, surf)]
        arrays["ground_albedo_dir"][sel] = ALB[(band, surf)]
        arrays["sw_veg_ssa"][sel] = SSA[band]

    out = run_radsurf(config, arrays)
    top_dn = np.tile(data["top_flux_dn_sw"], (ncase, 1))
    dir_dn = np.tile(data["top_flux_dn_direct_sw"], (ncase, 1))
    sw = flux_utils.sum_flux(
        flux_utils.scale_flux(out["sw_norm_dir"], dir_dn),
        flux_utils.scale_flux(out["sw_norm_diff"], top_dn - dir_dn),
    )
    res = flux_utils.check_flux(sw, arrays, "sw", printer=lambda *a: None)
    np.testing.assert_allclose(res, 0.0, atol=1e-8 * np.max(top_dn))

    alb = 1.0 - sw["top_net"][:, 0] / top_dn[:, 0]
    assert np.all((alb > 0.0) & (alb < 1.0))
    for i, (band, surf, cover) in enumerate(cases):
        a = alb[i * nsza:(i + 1) * nsza]
        ground = ALB[(band, surf)]
        # Scene albedo lies between the (dark) canopy and the ground albedo
        # when the ground is brighter than the canopy, and rises above the
        # ground albedo for a bright canopy over dark soil
        if ground > SSA[band]:
            assert np.all(a < ground + 1e-12), (band, surf, cover)
        # Denser cover pulls the scene albedo toward the canopy's own
        # reflectance: monotone in cover at overhead sun (column 0 of the
        # SZA sweep is the highest sun)
    for band in ("vis", "nir"):
        for surf in ("med", "snw"):
            a0 = {c: alb[cases.index((band, surf, c)) * nsza]
                  for c in (0.1, 0.3, 0.5)}
            # Scene albedo moves monotonically from the bare-ground albedo
            # toward the canopy's effective reflectance as cover increases
            # (direction depends on which is brighter).  Skip the nir/med
            # crossover case where the two are nearly equal and the trend
            # legitimately changes sign with cover.
            ground = ALB[(band, surf)]
            d1 = a0[0.3] - a0[0.1]
            d2 = a0[0.5] - a0[0.3]
            if abs(a0[0.1] - ground) > 0.01:
                assert d1 * d2 > 0.0, (band, surf, a0)
                assert (a0[0.1] - ground) * d1 > 0.0, (band, surf, a0,
                                                       ground)


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
