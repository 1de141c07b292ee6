"""Learned-interpolation baseline (auvtpu.learned): training sanity and the
residual-corrector invariant (untrained == window-mean fill)."""

import numpy as np
import pytest

from auvtpu.config import Extent
from auvtpu.grid import RegularGrid
from auvtpu.masking import mask_grid
from auvtpu.ops import fill_window_mean
from auvtpu.synthetic import shelf_seamount

learned = pytest.importorskip("auvtpu.learned")
if not learned.learned_available():  # pragma: no cover
    pytest.skip("flax/optax unavailable", allow_module_level=True)

import jax


W_, D_ = 8, 1  # tiny net: the suite must train in seconds on one CPU core


@pytest.fixture(scope="module")
def eval_grid():
    base = shelf_seamount(48, 48)
    reduced, rc, truth = mask_grid(base, 0.15, seed=2)
    g = RegularGrid.from_nan_array(reduced, Extent(0.0, 47.0, 0.0, 47.0))
    return g, rc, truth


def test_untrained_equals_window_mean(eval_grid):
    """Zero-initialized head => the model IS the classical baseline."""
    g, rc, truth = eval_grid
    params = learned.init_params(jax.random.PRNGKey(0), width=W_, depth=D_, tile=32)
    out = np.asarray(learned.fill_learned(g, params, width=W_, depth=D_))
    mf = np.asarray(fill_window_mean(g))
    want = np.where(np.asarray(g.valid) > 0.5, np.asarray(g.elev), mf)
    assert np.allclose(out, want, atol=1e-5, equal_nan=True)


def test_training_reduces_masked_mse_and_beats_mean(eval_grid):
    g, rc, truth = eval_grid
    params, hist = learned.train(steps=60, width=W_, depth=D_, tile=32, batch=4, seed=1)
    assert hist[-1] < hist[0] * 0.7, (hist[0], hist[-1])

    out = np.asarray(learned.fill_learned(g, params, width=W_, depth=D_))
    pred = out[rc[:, 0], rc[:, 1]]
    ok = ~np.isnan(pred)
    rmse = float(np.sqrt(np.mean((pred[ok] - truth[ok]) ** 2)))
    mf = np.asarray(fill_window_mean(g))[rc[:, 0], rc[:, 1]]
    rmse_mean = float(np.sqrt(np.mean((mf[ok] - truth[ok]) ** 2)))
    # held-out synthetic tile: the trained corrector must improve on its own
    # starting point (the window-mean baseline)
    assert rmse < rmse_mean, (rmse, rmse_mean)


def test_observed_cells_pass_through(eval_grid):
    g, _, _ = eval_grid
    params = learned.init_params(jax.random.PRNGKey(3), width=W_, depth=D_, tile=32)
    out = np.asarray(learned.fill_learned(g, params, width=W_, depth=D_))
    v = np.asarray(g.valid) > 0.5
    assert np.array_equal(out[v], np.asarray(g.elev)[v])


def test_params_checkpoint_roundtrip(tmp_path, eval_grid):
    g, _, _ = eval_grid
    params = learned.init_params(jax.random.PRNGKey(5), width=W_, depth=D_, tile=32)
    path = str(tmp_path / "ckpt.npz")
    learned.save_params(path, params, width=W_, depth=D_)
    params2, w, d = learned.load_params(path)
    assert (w, d) == (W_, D_)
    a = np.asarray(learned.fill_learned(g, params, width=W_, depth=D_))
    b = np.asarray(learned.fill_learned(g, params2, width=w, depth=d))
    assert np.array_equal(a, b, equal_nan=True)
