"""Batched matrix-op tests against scipy/numpy (pivoted, independent) oracles."""

import numpy as np
import pytest
import scipy.linalg

from spartacus_surface_tpu.ops import matrix as M


def _random_dd(rng, batch, n):
    """Random diagonally-dominant batch (the SPARTACUS regime)."""
    a = rng.standard_normal((*batch, n, n))
    d = np.abs(a).sum(-1) + 1.0
    idx = np.arange(n)
    a[..., idx, idx] = np.sign(rng.standard_normal((*batch, n))) * d
    return a


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 16, 24])
def test_solve_matches_numpy(n):
    rng = np.random.default_rng(0)
    a = _random_dd(rng, (7,), n)
    b = rng.standard_normal((7, n, 3))
    x = np.asarray(M.solve(a, b))
    assert np.allclose(x, np.linalg.solve(a, b), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("n", [2, 4, 9])
def test_solve_vector_rhs(n):
    rng = np.random.default_rng(1)
    a = _random_dd(rng, (3, 5), n)
    b = rng.standard_normal((3, 5, n))
    x = np.asarray(M.solve(a, b))
    assert np.allclose(x, np.linalg.solve(a, b[..., None])[..., 0], rtol=1e-10)


@pytest.mark.parametrize("n", [1, 2, 6, 13])
def test_inv(n):
    rng = np.random.default_rng(2)
    a = _random_dd(rng, (4,), n)
    assert np.allclose(np.asarray(M.inv(a)), np.linalg.inv(a), rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("n", [1, 2, 5, 10, 20])
def test_expm_small_norm(n):
    rng = np.random.default_rng(3)
    a = rng.standard_normal((6, n, n))
    a = 0.4 * a / np.abs(a).sum(-1).max(-1)[..., None, None]
    got = np.asarray(M.expm_pade7(a))
    want = np.stack([scipy.linalg.expm(ai) for ai in a.reshape(-1, n, n)])
    assert np.allclose(got.reshape(-1, n, n), want, rtol=1e-12, atol=1e-14)


def test_expm_zero_is_identity():
    z = np.zeros((2, 4, 4))
    assert np.allclose(np.asarray(M.expm_pade7(z)), np.eye(4), atol=1e-15)
