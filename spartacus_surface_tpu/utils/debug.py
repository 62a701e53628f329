"""Debug printing utilities.

Parity: utilities/print_matrix.F90 (print_matrix/print_vector used by the
reference's PRINT_ARRAYS debug path, e.g. radsurf_forest_sw.F90:389-403,
and its eyeball-comparison kernel tests driver/test_sw.F90:60-76).

Setting the environment variable SPARTACUS_DEBUG_ARRAYS=1 makes the solver
print the assembled Gamma matrices and per-layer operators for the first
column/band (the PRINT_ARRAYS equivalent).
"""

from __future__ import annotations

import os

import numpy as np


def debug_arrays_enabled() -> bool:
    return os.environ.get("SPARTACUS_DEBUG_ARRAYS", "0") not in ("0", "")


def print_vector(name: str, vec, printer=print):
    """Parity: print_vector, utilities/print_matrix.F90."""
    vals = " ".join(f"{v:10.6f}" for v in np.asarray(vec).ravel())
    printer(f"{name} = {vals}")


def print_matrix(name: str, mat, printer=print):
    """Parity: print_matrix, utilities/print_matrix.F90."""
    mat = np.asarray(mat)
    printer(f"{name} =")
    for row in np.atleast_2d(mat):
        printer("  " + " ".join(f"{v:10.6f}" for v in row))


def maybe_dump(tag: str, arrays: dict):
    """Print first-column/first-band slices of named arrays when
    SPARTACUS_DEBUG_ARRAYS is set."""
    if not debug_arrays_enabled():
        return
    print(f"--- DEBUG ARRAYS: {tag} ---")
    for name, arr in arrays.items():
        a = np.asarray(arr)
        while a.ndim > 2:
            a = a[0]
        if a.ndim <= 1:
            print_vector(name, a)
        else:
            print_matrix(name, a)
