"""Direct unit tests of the dense variogram pipeline (VERDICT r3 weak #6):
empirical binning vs a brute-force oracle, and the GN fit's parameter
recovery per model — previously only exercised indirectly through the
sharded fit and the graft dryrun."""

import numpy as np
import pytest

import jax.numpy as jnp

from auvtpu.config import Extent
from auvtpu.grid import RegularGrid
from auvtpu.masking import mask_grid
from auvtpu.synthetic import shelf_seamount
from auvtpu.variogram import (
    empirical_variogram,
    fit_best_model,
    fit_model,
    fit_variogram,
    variogram_model,
)

EXT = Extent(-74.0, -70.0, 35.0, 38.0)


def _brute_variogram(nanp, max_lag, n_bins):
    """O(N^2) float64 oracle: every unordered valid pair once, Matheron."""
    H, W = nanp.shape
    ys, xs = np.nonzero(np.isfinite(nanp))
    z = nanp[ys, xs]
    edges = np.linspace(0.0, float(max_lag), n_bins + 1)
    s = np.zeros(n_bins)
    c = np.zeros(n_bins)
    for i in range(len(z)):
        dy = ys[i + 1:] - ys[i]
        dx = xs[i + 1:] - xs[i]
        h = np.hypot(dx, dy)
        m = (h > 0) & (h <= max_lag)
        b = np.clip(np.digitize(h[m], edges) - 1, 0, n_bins - 1)
        d2 = (z[i + 1:][m] - z[i]) ** 2
        np.add.at(s, b, d2)
        np.add.at(c, b, 1.0)
    gamma = np.where(c > 0, s / (2 * np.maximum(c, 1)), 0.0)
    return gamma, c


def test_empirical_variogram_vs_bruteforce():
    elev = shelf_seamount(18, 22)
    reduced, _, _ = mask_grid(elev, 0.3, seed=5)
    grid = RegularGrid.from_nan_array(reduced, EXT)
    lags, gamma, counts = empirical_variogram(grid, max_lag=6, n_bins=6)
    want_g, want_c = _brute_variogram(np.asarray(reduced), 6, 6)
    np.testing.assert_allclose(np.asarray(counts), want_c, rtol=0, atol=0.5)
    np.testing.assert_allclose(np.asarray(gamma), want_g, rtol=1e-4)
    edges = np.linspace(0, 6, 7)
    np.testing.assert_allclose(np.asarray(lags), 0.5 * (edges[:-1] + edges[1:]))


@pytest.mark.parametrize("model,params", [
    ("exponential", (0.5, 80.0, 4.0)),
    ("spherical", (0.3, 60.0, 5.0)),
    ("gaussian", (0.4, 50.0, 3.0)),
    ("linear", (0.2, 8.0, 1.0)),
])
def test_fit_model_recovers_known_parameters(model, params):
    # synthesize a clean gamma curve from known parameters and require the
    # Gauss-Newton fit to reproduce the CURVE tightly (parameters can trade
    # off near-degenerately, e.g. nugget vs short-range behavior, so the
    # recovery criterion is the fitted model's values on the lag grid)
    lags = jnp.linspace(0.4, 8.0, 12)
    gamma = variogram_model(lags, params, model)
    counts = jnp.full((12,), 100.0)
    fit = fit_model(lags, gamma, counts, model=model, iters=60)
    got = np.asarray(variogram_model(lags, fit, model), np.float64)
    want = np.asarray(gamma, np.float64)
    assert np.abs(got - want).max() < 0.02 * want.max()
    # and the headline parameters are in the right regime
    if model != "linear":
        assert 0.5 * params[1] < float(fit[1]) < 2.0 * params[1]  # sill


def test_fit_model_weighted_ignores_empty_bins():
    lags = jnp.linspace(0.4, 8.0, 12)
    params = (0.5, 80.0, 4.0)
    gamma = variogram_model(lags, params, "exponential")
    # poison two bins but give them zero pair weight: fit must not move
    gamma = gamma.at[3].set(1e4).at[7].set(0.0)
    counts = jnp.full((12,), 100.0).at[3].set(0.0).at[7].set(0.0)
    fit = fit_model(lags, gamma, counts, model="exponential", iters=60)
    keep = np.array([i for i in range(12) if i not in (3, 7)])
    got = np.asarray(variogram_model(lags, fit, "exponential"))[keep]
    want = np.asarray(variogram_model(lags, params, "exponential"))[keep]
    assert np.abs(got - want).max() < 0.03 * want.max()


def test_fit_best_model_selects_generator():
    lags = jnp.linspace(0.4, 8.0, 12)
    counts = jnp.full((12,), 100.0)
    for gen in ("exponential", "gaussian"):
        gamma = variogram_model(lags, (0.3, 60.0, 3.0), gen)
        name, p, sse = fit_best_model(lags, gamma, counts, iters=60)
        assert name == gen, (gen, name, sse)


def test_fit_variogram_dense_grid_end_to_end():
    # the convenience dense pipeline: empirical + exponential fit on a real
    # masked field — the fitted curve must track the empirical one where
    # pair support exists (the criterion the kriging consumer cares about)
    elev = shelf_seamount(64, 80)
    reduced, _, _ = mask_grid(elev, 0.2, seed=9)
    grid = RegularGrid.from_nan_array(reduced, EXT)
    nugget, sill, rng_ = (float(v) for v in fit_variogram(grid))
    assert np.isfinite([nugget, sill, rng_]).all()
    assert nugget >= 0 and sill > 0 and rng_ > 0
    lags, gamma, counts = empirical_variogram(grid)
    step = 0.5 * (abs(grid.lat_step) + abs(grid.lon_step))
    got = np.asarray(variogram_model(lags * step, (nugget, sill, rng_), "exponential"))
    g = np.asarray(gamma)
    w = np.asarray(counts)
    w = w / w.sum()
    rel = np.sqrt((w * (got - g) ** 2).sum()) / g.max()
    assert rel < 0.2
