"""End-to-end RAMI-V scene runs (test/rami5): 40-62 layer canopies, 14
spectral bands, 3 regions (2 vegetated), trees-as-urban trick
(trunks=buildings, test/rami5/README:4-8), spectral + profile outputs.

Marked slow; two representative configurations: diffuse illumination and
41-degree direct sun with black soil (the RAMI-V "bsoil" variant).
"""

import numpy as np
import pytest

from tests.test_reference_cases import read_out, run_driver

REF = "/root/reference/test/rami5"
SCENE = f"{REF}/scene_nc/rami5_HET07_JPS_SUM_scene.nc"


def spectral_residual(out, nlay_mask=True):
    """Per-column, per-band SW energy residual from the spectral outputs."""
    def lay_sum(name):
        v = out[name]
        return np.where(v == -9999.0, 0.0, v).sum(1)  # sum layers -> [C, B]

    r = out["ground_spectral_flux_net_sw"]
    for name in ("clear_air_spectral_absorption_sw",
                 "veg_spectral_absorption_sw",
                 "veg_air_spectral_absorption_sw",
                 "wall_spectral_flux_net_sw", "roof_spectral_flux_net_sw"):
        r = r + lay_sum(name)
    return r - out["top_spectral_flux_net_sw"]


@pytest.mark.parametrize("mode", ["diffuse", "direct41_blacksoil"])
def test_rami5_het07(tmp_path, mode):
    extra = "iverbose = 1,"
    if mode == "direct41_blacksoil":
        extra += ("\ntop_flux_dn_direct_sw = 1.0,"
                  "\nsolar_zenith_angle = 41,"
                  "\nground_sw_albedo = 0.0,")
    out_path = tmp_path / f"het07_{mode}.nc"
    run_driver(f"{REF}/config.nam", SCENE, out_path, extra_nam=extra,
               tmp_path=tmp_path)
    out = read_out(out_path)
    res = spectral_residual(out)
    # Residual per unit incoming flux; sub-threshold-region leakage allows
    # O(1e-6) (same semantics as the reference's frac_threshold zeroing)
    assert np.abs(res).max() < 5e-6
    # Canopy albedo per band physical and spectrally varying
    alb = 1.0 - (out["top_spectral_flux_net_sw"]
                 / out["top_spectral_flux_dn_sw"])
    assert np.all(alb > 0.0) and np.all(alb < 1.0)
    assert alb.max() - alb.min() > 0.05  # NIR brighter than VIS
    if mode == "direct41_blacksoil":
        # Black soil absorbs everything it receives
        np.testing.assert_allclose(
            out["ground_spectral_flux_net_sw"],
            out["ground_spectral_flux_dn_sw"], rtol=1e-9,
        )
