"""Scattered-data pipeline tests (prototype-parity layer)."""

import numpy as np
import pytest

import jax.numpy as jnp

from auvtpu.config import Extent
from auvtpu.scattered import (
    fit_variogram_scattered,
    idw_knn,
    knn_search,
    kriging_knn,
    linear_knn,
    sample_and_reconstruct,
)
from auvtpu.synthetic import shelf_seamount


def test_knn_search_matches_bruteforce():
    r = np.random.RandomState(0)
    pts = r.randn(500, 2).astype(np.float32)
    tgt = r.randn(40, 2).astype(np.float32)
    d2, idx = knn_search(jnp.asarray(tgt), jnp.asarray(pts), k=5, pt_chunk=128)
    d2 = np.asarray(d2)
    idx = np.asarray(idx)
    full = ((tgt[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    want = np.sort(full, axis=1)[:, :5]
    np.testing.assert_allclose(d2, want, rtol=1e-4, atol=1e-5)
    # indices actually point at those distances
    np.testing.assert_allclose(
        np.take_along_axis(full, idx, axis=1), d2, rtol=1e-4, atol=1e-5
    )


def test_linear_knn_exact_on_plane():
    r = np.random.RandomState(1)
    pts = r.uniform(0, 10, (800, 2)).astype(np.float32)
    vals = (2.0 * pts[:, 0] - 3.0 * pts[:, 1] + 7.0).astype(np.float32)
    tgt = r.uniform(2, 8, (50, 2)).astype(np.float32)
    got = np.asarray(linear_knn(jnp.asarray(pts), jnp.asarray(vals), jnp.asarray(tgt)))
    want = 2.0 * tgt[:, 0] - 3.0 * tgt[:, 1] + 7.0
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)


def test_idw_knn_constant_field():
    r = np.random.RandomState(2)
    pts = r.uniform(0, 5, (300, 2)).astype(np.float32)
    vals = np.full(300, -1234.5, np.float32)
    tgt = r.uniform(1, 4, (20, 2)).astype(np.float32)
    got = np.asarray(idw_knn(jnp.asarray(pts), jnp.asarray(vals), jnp.asarray(tgt), k=8))
    np.testing.assert_allclose(got, -1234.5, rtol=1e-5)


def test_kriging_knn_constant_field():
    r = np.random.RandomState(3)
    pts = r.uniform(0, 5, (300, 2)).astype(np.float32)
    vals = np.full(300, 55.5, np.float32)
    tgt = r.uniform(1, 4, (20, 2)).astype(np.float32)
    got = np.asarray(
        kriging_knn(
            jnp.asarray(pts), jnp.asarray(vals), jnp.asarray(tgt),
            k=12, vparams=(1.0, 100.0, 10.0),
        )
    )
    np.testing.assert_allclose(got, 55.5, rtol=1e-3)


def test_fit_variogram_scattered_runs():
    r = np.random.RandomState(4)
    pts = r.uniform(0, 10, (1000, 2)).astype(np.float32)
    vals = (np.sin(pts[:, 0]) * 10 + pts[:, 1]).astype(np.float32)
    n, s, rg = fit_variogram_scattered(jnp.asarray(pts), jnp.asarray(vals))
    assert float(n) > 0 and float(s) > 0 and float(rg) > 0


@pytest.mark.parametrize("method,max_rnrmse", [("idw", 6.0), ("linear", 5.0), ("kriging", 6.0)])
def test_sample_and_reconstruct(method, max_rnrmse):
    # the prototype's flow: 1% sample of a smooth field -> full-grid predict;
    # range-normalized RMSE should be small (test_interpolation.py:111-146
    # reported ~1-3% for the real tile)
    elev = shelf_seamount(80, 100)
    ext = Extent(0.0, 99.0, 0.0, 79.0)
    pred, mask = sample_and_reconstruct(
        elev, ext, subset_fraction=0.05, method=method, k=16, target_chunk=4096
    )
    assert pred.shape == elev.shape
    rmse = np.sqrt(np.mean((pred - elev) ** 2))
    rnrmse = 100.0 * rmse / (elev.max() - elev.min())
    assert rnrmse < max_rnrmse, f"{method}: {rnrmse:.2f}%"


def test_knn_search_large_coordinate_offsets():
    # regression: raw geographic magnitudes (lon ~ -73) must not destroy
    # small squared distances in f32 (catastrophic cancellation)
    r = np.random.RandomState(7)
    pts = (r.uniform(0, 0.5, (400, 2)) + np.array([-73.0, 35.0])).astype(np.float32)
    tgt = (r.uniform(0.1, 0.4, (30, 2)) + np.array([-73.0, 35.0])).astype(np.float32)
    d2, idx = knn_search(jnp.asarray(tgt), jnp.asarray(pts), k=4, pt_chunk=128)
    full = ((tgt.astype(np.float64)[:, None, :] - pts.astype(np.float64)[None, :, :]) ** 2).sum(-1)
    want = np.sort(full, axis=1)[:, :4]
    np.testing.assert_allclose(np.asarray(d2), want, rtol=1e-2, atol=1e-7)
