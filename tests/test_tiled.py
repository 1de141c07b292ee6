"""Tile-streaming scattered ops (ops/tiled.py) parity tests.

The tiled path must agree with the windowed scattered ops (which are
themselves pinned to golden_v2): same v2 selection, same math — only the
extraction strategy differs (tile-sorted one-hot matmuls vs gathers).
Small tiles/blocks force multi-tile partitions, pad lanes, and the
last-tile-row/column slab path.
"""

import numpy as np
import pytest

from auvtpu.config import Extent
from auvtpu.grid import RegularGrid
from auvtpu.masking import mask_grid
from auvtpu.ops import (
    scattered_bicubic,
    scattered_bilinear,
    scattered_idw,
    scattered_kriging,
)
from auvtpu.ops.tiled import (
    _partition,
    tiled_bicubic,
    tiled_bilinear,
    tiled_idw,
    tiled_kriging,
)
from auvtpu.synthetic import shelf_seamount

H, W = 96, 130
EXT = Extent(0.0, float(W - 1), 0.0, float(H - 1))
TK = dict(tile=(32, 64), qblk=256)


def _grid(masked):
    elev = shelf_seamount(H, W)
    if masked:
        elev, _, _ = mask_grid(elev, 0.25, seed=8)
    return RegularGrid.from_nan_array(elev, EXT)


def _queries(n=3000, seed=3):
    r = np.random.RandomState(seed)
    lons = r.uniform(1e-5, W - 1 - 1e-5, n).astype(np.float32)
    lats = r.uniform(1e-5, H - 1 - 1e-5, n).astype(np.float32)
    return lons, lats


def _check(a, b, atol=1e-3):
    a, b = np.asarray(a), np.asarray(b)
    assert (np.isnan(a) == np.isnan(b)).all()
    both = ~np.isnan(a)
    np.testing.assert_allclose(a[both], b[both], rtol=1e-5, atol=atol)


@pytest.mark.parametrize("masked", [False, True])
def test_tiled_bilinear_matches_scattered(masked):
    g = _grid(masked)
    lons, lats = _queries()
    _check(tiled_bilinear(g, lons, lats, **TK), scattered_bilinear(g, lons, lats))


def test_tiled_bicubic_matches_scattered():
    g = _grid(False)
    lons, lats = _queries()
    _check(
        tiled_bicubic(g, lons, lats, **TK),
        scattered_bicubic(g, lons, lats, fallback="never"),
    )


@pytest.mark.parametrize("masked", [False, True])
def test_tiled_kriging_matches_scattered(masked):
    g = _grid(masked)
    lons, lats = _queries()
    _check(
        tiled_kriging(g, lons, lats, window_radius=2, **TK),
        scattered_kriging(g, lons, lats, max_radius=2),
        atol=0.05,
    )


@pytest.mark.parametrize("masked", [False, True])
def test_tiled_idw_matches_scattered(masked):
    g = _grid(masked)
    lons, lats = _queries()
    _check(
        tiled_idw(g, lons, lats, k=8, window_radius=2, **TK),
        scattered_idw(g, lons, lats, k=8, max_radius=2),
        atol=0.01,
    )


def test_tiled_oob_queries_nan():
    g = _grid(False)
    out = np.asarray(
        tiled_bilinear(g, np.array([-1.0, 5.0, W + 1.0]), np.array([5.0, 5.0, 5.0]), **TK)
    )
    assert np.isnan(out[0]) and np.isnan(out[2]) and not np.isnan(out[1])


def test_partition_covers_every_query_once():
    lons, lats = _queries(n=777, seed=5)
    import jax.numpy as jnp

    bt, qx, qy, src, n_tx = _partition(
        jnp.asarray(lons), jnp.asarray(lats), H, W, anchor="floor", tile=(32, 64), qblk=64
    )
    src = np.asarray(src).ravel()
    live = src[src >= 0]
    assert len(live) == 777 and len(np.unique(live)) == 777
    # each live lane's query sits in its block's claimed tile
    qx, qy, bt = np.asarray(qx), np.asarray(qy), np.asarray(bt)
    for b in range(bt.shape[0]):
        lanes = src.reshape(bt.shape[0], -1)[b] >= 0
        if not lanes.any():
            continue
        tx = np.floor(qx[b][lanes]).astype(int) // 64
        ty = np.floor(qy[b][lanes]).astype(int) // 32
        assert (ty * n_tx + tx == bt[b]).all()
