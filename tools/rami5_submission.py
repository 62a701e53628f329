"""RAMI-V submission post-processing: output NetCDF -> submission ASCII.

Python equivalent of the reference's Matlab workflow
(/root/reference/test/rami5/process_spartacus_scenes.m,
process_spartacus.m, write_ascii.m, write_ascii_profile.m,
check_fractional_cover.m; README:9-22): converts the driver's rami5
output files into the ``mes/`` ASCII files submitted to the RAMI-V
intercomparison, and diagnoses fractional scene coverage from the
overhead-sun direct flux.

Usage (one scene x one solar configuration):

    python tools/rami5_submission.py emit \
        --scene-id HET07_JPS_SUM --solar-id diffuse \
        --scene-nc .../rami5_HET07_JPS_SUM_scene.nc \
        --out-nc out.nc --blacksoil-nc out_blacksoil.nc --mes-dir mes/

Fractional-cover cross-check (overhead-sun outputs, real soil):

    python tools/rami5_submission.py check-cover \
        HET07_JPS_SUM=overhead_out.nc [SCENE=file ...]

Every formula below mirrors process_spartacus.m line-for-line (cited
inline); the ASCII formats mirror write_ascii.m / write_ascii_profile.m.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# Scene metadata (process_spartacus.m:24-48): canopy-top height for the
# profile grid and the RAMI-V solar ids run for each scene.
SCENES = {
    "HET15_JBS_WIN": dict(zmax=30.5130, solar_ids=["diffuse", "76", "56"]),
    "HET09_JBS_SUM": dict(zmax=30.5130, solar_ids=["diffuse", "56", "41"]),
    "HET07_JPS_SUM": dict(zmax=18.56, solar_ids=["diffuse", "56", "41"]),
    "HET14_WCO_UND": dict(zmax=4.12, solar_ids=["diffuse", "42", "60", "67"]),
    "HET08_OPS_WIN": dict(zmax=15.0213, solar_ids=["diffuse", "76", "56"]),
}

# Band names; the 14th band in the scene files is the black-surfaces
# diagnostic band (process_spartacus.m:51-56).
BANDS = ["O03", "O04", "O06", "O08", "O10", "O11", "O12", "M08", "O17",
         "MD5", "M11", "MD7", "M12"]
BANDS_PAR = BANDS[:5]        # photosynthetically active range
IBAND_BLACK = len(BANDS)     # 0-based index of the black-surfaces band

MODEL = "spartacus"

# Solar azimuth per zenith angle (write_ascii.m:15-16: azim([56 41 76 42
# 60 67]+1) = [153 147 155 76 45 41], Matlab 1-based).
AZIMUTH = {56: 153, 41: 147, 76: 155, 42: 76, 60: 45, 67: 41}

# "True" fractional scene coverage from the RAMI-V website
# (check_fractional_cover.m:13-16).
FRACTIONAL_COVER_TRUTH = {
    "HET07_JPS_SUM": 0.406,
    "HET08_OPS_WIN": 0.1248,
    "HET09_JBS_SUM": 0.5044,
    "HET14_WCO_UND": 0.392,
    "HET15_JBS_WIN": 0.2510,
}


def read_nc(path):
    from scipy.io import netcdf_file

    f = netcdf_file(str(path), "r", mmap=False)
    out = {name: np.array(v[:]) for name, v in f.variables.items()}
    f.close()
    return out


def illumination_string(solar_id: str) -> str:
    """'DIFFUSE' or z<zen>a<azim> (write_ascii.m:9-17).  Angles outside
    the RAMI-V table default to azimuth 0, as the Matlab's zero-filled
    azim(0:90) lookup does (e.g. the overhead 'make overhead' runs)."""
    if solar_id == "diffuse":
        return "DIFFUSE"
    zen = int(solar_id)
    return f"z{zen:02d}a{AZIMUTH.get(zen, 0):03d}"


def write_ascii(mes_dir, scene, bands, solar_id, meas, values,
                verbose=True):
    """One value per band file: '<value>\\t-1' (write_ascii.m:19-25)."""
    illum = illumination_string(solar_id)
    paths = []
    for iband, band in enumerate(bands):
        path = os.path.join(
            mes_dir, f"{scene}_{band}_{illum}-{meas}_{MODEL}.mes")
        if verbose:
            print(f"Writing {path}")
        with open(path, "w") as f:
            f.write(f"{float(values[iband]):.6f}\t{-1:.6f}\n")
        paths.append(path)
    return paths


def write_ascii_profile(mes_dir, scene, bands, solar_id, meas, zmax, z,
                        flux_up, flux_dn, verbose=True):
    """11-level flux profile files (write_ascii_profile.m): header
    '  11    3\\t<zmax/10>' then rows '<z>\\t<up>\\t<dn>' from canopy top
    down to the ground."""
    illum = illumination_string(solar_id)
    zint = np.linspace(zmax, 0.0, 11)
    paths = []
    for iband, band in enumerate(bands):
        fup = np.interp(zint, z, flux_up[iband])
        fdn = np.interp(zint, z, flux_dn[iband])
        path = os.path.join(
            mes_dir, f"{scene}_{band}_{illum}-{meas}_{MODEL}.mes")
        if verbose:
            print(f"Writing {path}")
        with open(path, "w") as f:
            f.write(f"{11:4d} {3:4d}\t{zmax / 10:.6f}\n")
            for iz in range(11):
                f.write(f"{zint[iz]:.6f}\t{fup[iz]:.6f}\t{fdn[iz]:.6f}\n")
        paths.append(path)
    return paths


def _col0(arr):
    """First (only) column of a [C, ...] output array."""
    return np.asarray(arr, np.float64)[0]


def _lay_sum(out, name):
    """Sum a [C, layer, band] spectral field over layers -> [band],
    treating -9999 fill as 0 (inactive layers)."""
    v = _col0(out[name])
    return np.where(v == -9999.0, 0.0, v).sum(axis=0)


def emit_scene(scene_id, solar_id, scene_nc, out_nc, blacksoil_nc,
               mes_dir, verbose=True):
    """Produce every .mes file for one (scene, solar configuration);
    mirror of the per-solar-id loop in process_spartacus.m:66-135.

    Returns {measure: [paths]}.
    """
    zmax = SCENES[scene_id]["zmax"]
    inp = read_nc(scene_nc)
    out = read_nc(out_nc)
    bs = read_nc(blacksoil_nc)
    os.makedirs(mes_dir, exist_ok=True)
    written = {}

    top_dn = _col0(out["top_spectral_flux_dn_sw"])
    top_net = _col0(out["top_spectral_flux_net_sw"])

    # White-sky (bhr) / black-sky (dhr) albedo: top dn - top net
    # (process_spartacus.m:85-93; fluxes are normalized per unit TOC dn).
    meas = "bhr" if solar_id == "diffuse" else "dhr"
    written[meas] = write_ascii(
        mes_dir, scene_id, BANDS, solar_id, meas, top_dn - top_net,
        verbose)

    # Absorption by all vegetation: foliage + wood, where trunks are
    # represented as walls/roofs (trees-as-urban trick, README:4-8)
    # (process_spartacus.m:95-99).
    veg_abs = _lay_sum(out, "veg_spectral_absorption_sw")
    wall_net = _lay_sum(out, "wall_spectral_flux_net_sw")
    roof_net = _lay_sum(out, "roof_spectral_flux_net_sw")
    written["fabs_tot"] = write_ascii(
        mes_dir, scene_id, BANDS_PAR, solar_id, "fabs_tot",
        veg_abs + wall_net + roof_net, verbose)

    # Foliage-only absorption: scale the per-layer vegetation absorption
    # by the foliage share of scattering-weighted extinction
    # (process_spartacus.m:101-108).  veg_extinction merges leaves +
    # branches; foliage_* are the leaf-only components.
    fol_ext = np.asarray(inp["foliage_extinction"], np.float64)[0]  # [L]
    veg_ext = np.asarray(inp["veg_extinction"], np.float64)[0]      # [L]
    fol_ssa = np.asarray(inp["foliage_sw_ssa"], np.float64)[0]      # [L, B]
    veg_ssa = np.asarray(inp["veg_sw_ssa"], np.float64)[0]          # [L, B]
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = (fol_ext[:, None] * fol_ssa) / (veg_ext[:, None] * veg_ssa)
    ratio = np.nan_to_num(ratio, nan=0.0, posinf=0.0, neginf=0.0)
    veg_abs_lay = _col0(out["veg_spectral_absorption_sw"])  # [L, B]
    veg_abs_lay = np.where(veg_abs_lay == -9999.0, 0.0, veg_abs_lay)
    nlay = min(ratio.shape[0], veg_abs_lay.shape[0])
    fabs_fol = (veg_abs_lay[:nlay] * ratio[:nlay]).sum(axis=0)
    written["fabs_fol"] = write_ascii(
        mes_dir, scene_id, BANDS_PAR, solar_id, "fabs_fol", fabs_fol,
        verbose)

    # Canopy-only collided transmission: black-soil ground dn minus its
    # unscattered part — the black band's dn for diffuse sun, the direct
    # dn for direct sun (process_spartacus.m:110-121).
    bs_ground_dn = _col0(bs["ground_spectral_flux_dn_sw"])
    if solar_id == "diffuse":
        uncollided = bs_ground_dn[IBAND_BLACK]
    else:
        uncollided = _col0(bs["ground_spectral_flux_dn_direct_sw"])
    written["ftran_coco"] = write_ascii(
        mes_dir, scene_id, BANDS_PAR, solar_id, "ftran_coco",
        np.broadcast_to(bs_ground_dn - uncollided,
                        bs_ground_dn.shape), verbose)

    # Unscattered transmission: the black-surfaces band's total dn,
    # constant across bands (process_spartacus.m:123-126).
    written["ftran_uc"] = write_ascii(
        mes_dir, scene_id, BANDS_PAR, solar_id, "ftran_uc",
        np.full(len(BANDS_PAR), bs_ground_dn[IBAND_BLACK]), verbose)

    # Total transmission (process_spartacus.m:128-130).
    written["ftran_tot"] = write_ascii(
        mes_dir, scene_id, BANDS_PAR, solar_id, "ftran_tot",
        _col0(out["ground_spectral_flux_dn_sw"]), verbose)

    # Flux profile: average of layer-base and layer-top values at each
    # interface (they differ slightly because of the stepped trunk
    # description), interpolated onto an 11-level grid from the canopy
    # top to the ground (process_spartacus.m:132-146).  Interface k of
    # the output 'height' axis is ground for k=0, top of layer k-1
    # otherwise; profile[k] = avg(base of layer k, top of layer k-1).
    z = _col0(out["height"])                       # [L+1]
    up_base = _col0(out["spectral_flux_up_layer_base_sw"]).T   # [B, L]
    up_top = _col0(out["spectral_flux_up_layer_top_sw"]).T
    dn_base = _col0(out["spectral_flux_dn_layer_base_sw"]).T
    dn_top = _col0(out["spectral_flux_dn_layer_top_sw"]).T

    def interfaces(base, top):
        nb, nl = base.shape
        prof = np.zeros((nb, nl + 1))
        prof[:, :nl] += base
        prof[:, 1:] += top
        prof[:, 1:nl] *= 0.5
        return prof

    written["ftran_tot_vprof"] = write_ascii_profile(
        mes_dir, scene_id, BANDS_PAR, solar_id, "ftran_tot_vprof", zmax,
        z, interfaces(up_base, up_top), interfaces(dn_base, dn_top),
        verbose)
    return written


def check_fractional_cover(outputs, verbose=True):
    """Diagnose fractional scene coverage from overhead-sun direct flux
    (check_fractional_cover.m): fsc = 1 - black-band direct dn at the
    ground, compared with the RAMI-V website truth values.

    outputs: {scene_id: overhead-run output path (real soil, sza=0)}.
    Returns {scene_id: (fsc_model, fsc_truth, rel_err)}.
    """
    results = {}
    for scene_id, path in outputs.items():
        out = read_nc(path)
        direct = _col0(out["ground_spectral_flux_dn_direct_sw"])
        fsc = 1.0 - float(direct[IBAND_BLACK])
        truth = FRACTIONAL_COVER_TRUTH[scene_id]
        rel = (fsc - truth) / truth
        results[scene_id] = (fsc, truth, rel)
        if verbose:
            print(f"{scene_id} FSCtrue={truth:g}, FSCspartacus={fsc:g}"
                  f" ({100 * rel:.4g}%)")
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("emit", help="write .mes submission files")
    pe.add_argument("--scene-id", required=True, choices=sorted(SCENES))
    pe.add_argument("--solar-id", required=True,
                    help="'diffuse' or the solar zenith angle in degrees")
    pe.add_argument("--scene-nc", required=True)
    pe.add_argument("--out-nc", required=True)
    pe.add_argument("--blacksoil-nc", required=True)
    pe.add_argument("--mes-dir", default="mes")

    pc = sub.add_parser("check-cover",
                        help="fractional-cover cross-check")
    pc.add_argument("outputs", nargs="+", metavar="SCENE=OUT_NC",
                    help="overhead-sun output file per scene")

    args = p.parse_args(argv)
    if args.cmd == "emit":
        emit_scene(args.scene_id, args.solar_id, args.scene_nc,
                   args.out_nc, args.blacksoil_nc, args.mes_dir)
        return 0
    outputs = dict(spec.split("=", 1) for spec in args.outputs)
    results = check_fractional_cover(outputs)
    worst = max(abs(r[2]) for r in results.values())
    return 0 if worst < 0.5 else 1


if __name__ == "__main__":
    sys.exit(main())
