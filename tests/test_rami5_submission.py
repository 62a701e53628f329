"""RAMI-V submission emitter (tools/rami5_submission.py): runs the driver
on one real scene (diffuse + black-soil + overhead-sun), emits the
submission ASCII files and checks their format plus the physics
invariants the Matlab workflow relies on
(/root/reference/test/rami5/process_spartacus_scenes.m, README:9-22).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")

from tests.test_reference_cases import read_out, run_driver

import rami5_submission as sub

pytestmark = pytest.mark.slow

REF = "/root/reference/test/rami5"
SCENE_ID = "HET07_JPS_SUM"
SCENE = f"{REF}/scene_nc/rami5_{SCENE_ID}_scene.nc"


@pytest.fixture(scope="module")
def rami5_runs(tmp_path_factory):
    """Three driver runs on HET07: diffuse real-soil, diffuse black-soil,
    and overhead-sun real-soil (the reference's 'make ... && make
    overhead' inputs for one scene)."""
    tmp = tmp_path_factory.mktemp("rami5_sub")
    runs = {}
    for name, extra in (
        ("out", "iverbose = 1,"),
        ("blacksoil", "iverbose = 1,\nground_sw_albedo = 0.0,"),
        ("overhead", ("iverbose = 1,\ntop_flux_dn_direct_sw = 1.0,"
                      "\nsolar_zenith_angle = 0,")),
    ):
        path = tmp / f"{name}.nc"
        run_driver(f"{REF}/config.nam", SCENE, path, extra_nam=extra,
                   tmp_path=tmp)
        runs[name] = path
    runs["mes"] = tmp / "mes"
    return runs


def _read_mes(path):
    with open(path) as f:
        return [[float(tok) for tok in line.split()] for line in f]


def test_emit_files_and_invariants(rami5_runs):
    written = sub.emit_scene(
        SCENE_ID, "diffuse", SCENE, rami5_runs["out"],
        rami5_runs["blacksoil"], rami5_runs["mes"], verbose=False)

    # File inventory: 13 albedo bands + 5 PAR bands x 6 other measures
    assert len(written["bhr"]) == 13
    for meas in ("fabs_tot", "fabs_fol", "ftran_coco", "ftran_uc",
                 "ftran_tot", "ftran_tot_vprof"):
        assert len(written[meas]) == 5

    # write_ascii format: '<value>\t-1.000000'
    bhr = np.array([_read_mes(p)[0][0] for p in written["bhr"]])
    assert _read_mes(written["bhr"][0])[0][1] == -1.0
    # White-sky albedo physical and spectrally varying (NIR vs VIS)
    assert np.all((bhr > 0.0) & (bhr < 1.0))
    assert bhr.max() - bhr.min() > 0.05

    ftran_tot = np.array(
        [_read_mes(p)[0][0] for p in written["ftran_tot"]])
    ftran_uc = np.array([_read_mes(p)[0][0] for p in written["ftran_uc"]])
    ftran_coco = np.array(
        [_read_mes(p)[0][0] for p in written["ftran_coco"]])
    fabs_tot = np.array(
        [_read_mes(p)[0][0] for p in written["fabs_tot"]])
    fabs_fol = np.array(
        [_read_mes(p)[0][0] for p in written["fabs_fol"]])

    # Unscattered transmission: one value (the black band's) for all PAR
    # bands, bounded by every band's total transmission on black soil
    assert np.unique(ftran_uc).size == 1
    assert np.all((ftran_uc > 0.0) & (ftran_uc < 1.0))
    assert np.all(ftran_coco >= -1e-12)
    assert np.all((ftran_tot > 0.0) & (ftran_tot < 1.0))
    # Foliage absorption is a sub-part of total vegetation absorption
    assert np.all((fabs_tot > 0.0) & (fabs_tot < 1.0))
    assert np.all((fabs_fol >= 0.0) & (fabs_fol <= fabs_tot + 1e-12))

    # Energy closure per PAR band: albedo + canopy absorption +
    # ground net + air absorption = TOC dn = 1 (the driver's
    # conservation identity restated on the emitted numbers)
    out = read_out(rami5_runs["out"])

    def lay_sum(name):
        v = np.asarray(out[name], np.float64)[0]
        return np.where(v == -9999.0, 0.0, v).sum(0)

    ground_net = np.asarray(out["ground_spectral_flux_net_sw"],
                            np.float64)[0]
    air = lay_sum("clear_air_spectral_absorption_sw") + lay_sum(
        "veg_air_spectral_absorption_sw")
    closure = bhr[:5] + fabs_tot + ground_net[:5] + air[:5]
    np.testing.assert_allclose(closure, 1.0, atol=5e-5)


def test_profile_format(rami5_runs):
    written = sub.emit_scene(
        SCENE_ID, "diffuse", SCENE, rami5_runs["out"],
        rami5_runs["blacksoil"], rami5_runs["mes"], verbose=False)
    rows = _read_mes(written["ftran_tot_vprof"][0])
    zmax = sub.SCENES[SCENE_ID]["zmax"]
    # Header: 11 levels, 3 columns, level spacing zmax/10
    assert rows[0][:2] == [11, 3]
    assert rows[0][2] == pytest.approx(zmax / 10, abs=1e-6)
    assert len(rows) == 12
    z = np.array([r[0] for r in rows[1:]])
    dn = np.array([r[2] for r in rows[1:]])
    up = np.array([r[1] for r in rows[1:]])
    np.testing.assert_allclose(z, np.linspace(zmax, 0.0, 11), atol=1e-5)
    # Normalized TOC dn = 1 at canopy top; transmission decreases downward
    assert dn[0] == pytest.approx(1.0, abs=5e-3)
    assert dn[-1] < dn[0]
    assert np.all((up >= 0.0) & (up <= 1.0))


def test_direct_illumination_naming(tmp_path, rami5_runs):
    # Direct-sun emission exercises the z<zen>a<azim> naming and the
    # direct-flux uncollided branch; reuse the overhead run as a stand-in
    # "56-degree" output pair (format-only checks).
    written = sub.emit_scene(
        SCENE_ID, "56", SCENE, rami5_runs["overhead"],
        rami5_runs["overhead"], tmp_path / "mes", verbose=False)
    assert written["dhr"][0].endswith(
        f"{SCENE_ID}_O03_z56a153-dhr_spartacus.mes")
    vals = _read_mes(written["ftran_coco"][0])
    assert np.isfinite(vals[0][0])


def test_fractional_cover_check(rami5_runs, capsys):
    results = sub.check_fractional_cover(
        {SCENE_ID: rami5_runs["overhead"]})
    fsc, truth, rel = results[SCENE_ID]
    assert truth == 0.406  # check_fractional_cover.m:13-16
    assert 0.0 < fsc < 1.0
    # SPARTACUS diagnoses scene coverage from unscattered overhead
    # transmission; agreement with the RAMI-V website value is the
    # reference workflow's own sanity bar (check_fractional_cover.m).
    assert abs(rel) < 0.25
    assert f"FSCtrue={truth:g}" in capsys.readouterr().out


def test_fractional_cover_het14(tmp_path):
    """Second scene, different canopy geometry (understory, zmax 4.12 m):
    the diagnosed cover matches the published RAMI-V value to ~1% — an
    oracle independent of both this codebase and the reference code."""
    scene_id = "HET14_WCO_UND"
    scene = f"{REF}/scene_nc/rami5_{scene_id}_scene.nc"
    out = tmp_path / "overhead.nc"
    run_driver(f"{REF}/config.nam", scene, out,
               extra_nam=("iverbose = 1,\ntop_flux_dn_direct_sw = 1.0,"
                          "\nsolar_zenith_angle = 0,"),
               tmp_path=tmp_path)
    (fsc, truth, rel), = sub.check_fractional_cover(
        {scene_id: out}, verbose=False).values()
    assert truth == 0.392
    assert abs(rel) < 0.05  # measured 1.1% on the f64 route
