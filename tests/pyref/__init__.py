"""pyref: an independent NumPy/SciPy float64 transcription of the reference
SPARTACUS-Surface algorithm (ecmwf/spartacus-surface), used purely as a test
oracle.

Unlike the production framework (expm + adding-doubling, dense masked
batches), pyref follows the reference's own numerical route: per-column
Python loops, the DISORT eigen-decomposition trick for the layer operators
(radtool_calc_matrices_sw_eig.F90 / radtool_calc_matrices_lw_eig.F90), the
adding method with explicit degenerate-region excision
(radsurf_forest_sw.F90:408-455), and separate forest/urban solvers
(radsurf_forest_{sw,lw}.F90, radsurf_urban_{sw,lw}.F90).  Agreement between
the two is therefore a genuine cross-check of both the physics transcription
and the numerics.

Intentional divergences from the reference (matching the production
framework's documented quirk list, PARITY_NOTES.md):
  * the lw_norm ground_vertical_diff accumulation lands in lw_norm, not
    lw_internal (reference bug, radsurf_forest_lw.F90:691);
  * cos_sza is clamped to >= 1e-6 in the forest SW path too (the reference
    clamps only inside tan0 there; urban clamps globally).
Everything else — including the nreg=3 overhang overlap quirk
(radsurf_overlap.F90:271) — is transcribed as-is.
"""
