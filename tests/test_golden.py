"""Golden-engine semantics tests.

The golden model is validated two ways:
1. against hand-computed values on tiny grids (unit level);
2. against the reference's *published* Grid B error tables on the real GEBCO
   tiles (integration level; Mid-Atlantic inline, Mariana behind --run-slow).
   Matching all printed digits of results/MidAtlantic_runtimes_errors.csv
   pins the whole semantic chain: flip, seed-42 masking, index->geo mapping,
   ring search, selection-sort tie-breaks, variogram, Gauss-Jordan.
"""

import os

import numpy as np
import pytest

from auvtpu import metrics
from auvtpu.config import GEBCO_TILES
from auvtpu.golden import GoldenGrid, ring_offsets
from auvtpu.masking import mask_grid, select_random_points
from auvtpu.synthetic import shelf_seamount, sinusoid

GEBCO_ROOT = "/root/reference/GEBCO-Data"


def make_golden(elev, extent=(0.0, 10.0, 0.0, 8.0)):
    min_lon, max_lon, min_lat, max_lat = extent
    return GoldenGrid(np.asarray(elev, float), min_lon, max_lon, min_lat, max_lat)


# ---------------------------------------------------------------------------
# ring offset table
# ---------------------------------------------------------------------------

def test_ring_offsets_shape_and_order():
    offs, seg = ring_offsets(10)
    assert offs.shape == (441, 2)
    assert (np.diff(seg) >= 0).all()
    # center first
    assert tuple(offs[0]) == (0, 0) and seg[0] == 0
    # ring 1 phase A: (dx,-1),(dx,+1) for dx=-1,0,1
    assert [tuple(o) for o in offs[1:7]] == [(-1, -1), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 1)]
    # ring 1 phase B: left,right at dy=0
    assert [tuple(o) for o in offs[7:9]] == [(-1, 0), (1, 0)]
    # every ring r contributes 8r cells
    for r in range(1, 11):
        ring_cells = np.abs(offs).max(axis=1) == r
        assert ring_cells.sum() == 8 * r


# ---------------------------------------------------------------------------
# bilinear
# ---------------------------------------------------------------------------

def test_bilinear_exact_plane():
    # a plane is reproduced exactly by bilinear interpolation
    H, W = 9, 11
    jj, ii = np.mgrid[0:H, 0:W]
    elev = 3.0 * ii - 2.0 * jj + 5.0
    g = make_golden(elev, (0.0, 10.0, 0.0, 8.0))
    rngl = np.random.RandomState(0)
    lons = rngl.uniform(0, 10, 100)
    lats = rngl.uniform(0, 8, 100)
    x = lons / g.lon_step
    y = lats / g.lat_step
    expect = 3.0 * x - 2.0 * y + 5.0
    np.testing.assert_allclose(g.bilinear(lons, lats), expect, rtol=1e-12)


def test_bilinear_out_of_bounds_nan():
    g = make_golden(np.ones((4, 4)), (0, 3, 0, 3))
    out = g.bilinear([-0.1, 3.1, 1.0, 1.0], [1.0, 1.0, -0.1, 3.1])
    assert np.isnan(out).all()


def test_bilinear_corner_fallback_mean():
    elev = np.array([[1.0, np.nan], [3.0, 5.0]])
    g = make_golden(elev, (0, 1, 0, 1))
    # query inside the cell: corner z01 is NaN -> mean of the other three
    out = g.bilinear([0.25], [0.25])
    np.testing.assert_allclose(out, [(1.0 + 3.0 + 5.0) / 3.0])
    # all four NaN -> NaN
    g2 = make_golden(np.full((2, 2), np.nan), (0, 1, 0, 1))
    assert np.isnan(g2.bilinear([0.5], [0.5])[0])


def test_bilinear_grid_b_holes():
    # masked cell whose 3 other corners are also masked -> hole (paper Fig. 10)
    elev = np.full((3, 3), 7.0)
    elev[0, 0] = np.nan
    elev[0, 1] = np.nan
    elev[1, 0] = np.nan
    elev[1, 1] = np.nan
    g = make_golden(elev, (0, 2, 0, 2))
    assert np.isnan(g.bilinear([0.0], [0.0])[0])


# ---------------------------------------------------------------------------
# bicubic
# ---------------------------------------------------------------------------

def test_cubic_reproduces_quadratic_polynomial():
    # Catmull-Rom (central-difference tangents) reproduces degree<=2 exactly
    W, H = 20, 5
    i = np.arange(W, dtype=float)
    row = -0.2 * i**2 + i - 3
    elev = np.tile(row, (H, 1))
    g = make_golden(elev, (0.0, W - 1.0, 0.0, H - 1.0))
    lons = np.array([2.25, 5.5, 10.75, 16.4])
    lats = np.full_like(lons, 2.0)
    expect = -0.2 * lons**2 + lons - 3
    np.testing.assert_allclose(g.cubic(lons, lats), expect, rtol=1e-10)


def test_cubic_nan_triggers_ring_fallback():
    # any NaN in the 4x4 patch -> average of 4 ring-nearest valid cells
    elev = np.arange(64, dtype=float).reshape(8, 8)
    elev[3, 3] = np.nan
    g = make_golden(elev, (0, 7, 0, 7))
    out = g.cubic([3.0], [3.0])[0]
    # query exactly at the masked cell (3,3): candidates per collection order
    # with distances hypot(dx+.5, dy+.5): ring1 phase A gives 4 candidates at
    # d=sqrt(0.5): (2,2),(2,4),(3,2),(3,4)  [(di,dj)=(-1,-1),(-1,1),(0,-1),(0,1)]
    expect = (elev[2, 2] + elev[4, 2] + elev[2, 3] + elev[4, 3]) / 4.0
    assert out == pytest.approx(expect, rel=1e-12)


def test_cubic_all_masked_window_nan():
    elev = np.full((30, 30), np.nan)
    g = make_golden(elev, (0, 29, 0, 29))
    assert np.isnan(g.cubic([15.0], [15.0])[0])


# ---------------------------------------------------------------------------
# kriging
# ---------------------------------------------------------------------------

def test_kriging_constant_field_is_exact():
    # kriging weights sum to 1 -> constant field reproduced exactly
    elev = np.full((12, 12), -42.5)
    g = make_golden(elev, (0, 11, 0, 11))
    out = g.kriging([3.3, 7.9], [4.1, 2.2])
    np.testing.assert_allclose(out, -42.5, rtol=1e-9)


def test_kriging_weights_interpolate_between_neighbors():
    jj, ii = np.mgrid[0:12, 0:12]
    elev = 2.0 * ii + 0.5 * jj
    g = make_golden(elev, (0, 11, 0, 11))
    out = g.kriging([5.5], [5.5])[0]
    vals = [elev[5, 5], elev[5, 6], elev[6, 5], elev[6, 6], elev[4, 5], elev[4, 6], elev[6, 6]]
    assert min(vals) - 1.0 <= out <= max(vals) + 1.0


def test_kriging_fewer_than_k_neighbors_mean_fallback():
    elev = np.full((41, 41), np.nan)
    elev[20, 21] = 10.0
    elev[22, 20] = 20.0
    g = make_golden(elev, (0, 40, 0, 40))
    out = g.kriging([20.0], [20.0])[0]
    assert out == pytest.approx(15.0)


def test_kriging_no_neighbors_nan():
    elev = np.full((41, 41), np.nan)
    g = make_golden(elev, (0, 40, 0, 40))
    assert np.isnan(g.kriging([20.0], [20.0])[0])


# ---------------------------------------------------------------------------
# masking pipeline determinism
# ---------------------------------------------------------------------------

def test_select_random_points_is_reference_deterministic():
    # np.random.seed(42); np.random.choice(12, 3, replace=False)
    np.random.seed(42)
    expect = np.random.choice(12, size=3, replace=False)
    got = select_random_points((3, 4), 0.25, seed=42)
    np.testing.assert_array_equal(got, expect)


def test_mask_grid_counts():
    elev = np.arange(100, dtype=float).reshape(10, 10)
    reduced, rc, vals = mask_grid(elev, 0.10, seed=42)
    assert len(vals) == 10
    assert np.isnan(reduced[rc[:, 0], rc[:, 1]]).all()
    np.testing.assert_array_equal(elev[rc[:, 0], rc[:, 1]], vals)


# ---------------------------------------------------------------------------
# published-table integration (the de-facto ground truth)
# ---------------------------------------------------------------------------

def _grid_b_setup(region, removal):
    from auvtpu.io import load_gebco_flipped

    tile = GEBCO_TILES[region]
    path = os.path.join(GEBCO_ROOT, tile["path"])
    if not os.path.exists(path):
        pytest.skip(f"GEBCO tile for {region} not available")
    _, _, elev = load_gebco_flipped(path)
    reduced, rc, vals = mask_grid(elev, removal)
    ext = tile["extent"]
    g = GoldenGrid(reduced, ext.min_lon, ext.max_lon, ext.min_lat, ext.max_lat)
    qlat = ext.min_lat + rc[:, 0] * ((ext.max_lat - ext.min_lat) / (elev.shape[0] - 1))
    qlon = ext.min_lon + rc[:, 1] * ((ext.max_lon - ext.min_lon) / (elev.shape[1] - 1))
    return g, qlon, qlat, vals


PUBLISHED_MAR = {  # results/MidAtlantic_runtimes_errors.csv
    "bilinear": (16.8584, 26.5357, 165.667),
    "cubic": (15.7884, 27.2985, 212.75),
    "kriging": (13.4503, 22.6796, 194.635),
}

PUBLISHED_MARIANA = {  # results/Mariana_runtimes_errors.csv
    "bilinear": (33.5738, 50.5098, 693.333),
    "cubic": (35.7862, 57.7545, 755.0),
    "kriging": (28.0409, 42.8661, 1102.08),
}


@pytest.mark.parametrize("method", ["bilinear", "cubic", "kriging"])
def test_published_midatlantic_errors(method):
    g, qlon, qlat, vals = _grid_b_setup("mid_atlantic", 0.01)
    pred = getattr(g, method if method != "bilinear" else "bilinear")(qlon, qlat)
    mae, rmse, mx = PUBLISHED_MAR[method]
    m = metrics.all_reference_metrics(vals, pred)
    assert m["MAE"] == pytest.approx(mae, abs=5e-5)
    assert m["RMSE"] == pytest.approx(rmse, abs=5e-5)
    assert m["MaxError"] == pytest.approx(mx, abs=5e-3)


@pytest.mark.slow
@pytest.mark.parametrize("method", ["bilinear", "cubic", "kriging"])
def test_published_mariana_errors(method):
    g, qlon, qlat, vals = _grid_b_setup("mariana", 0.05)
    pred = getattr(g, method)(qlon, qlat)
    mae, rmse, mx = PUBLISHED_MARIANA[method]
    m = metrics.all_reference_metrics(vals, pred)
    assert m["MAE"] == pytest.approx(mae, abs=5e-5)
    assert m["RMSE"] == pytest.approx(rmse, abs=5e-5)
    assert m["MaxError"] == pytest.approx(mx, abs=5e-3)


# ---------------------------------------------------------------------------
# metrics semantics
# ---------------------------------------------------------------------------

def test_metrics_reference_bias():
    ref = np.array([1.0, 2.0, 3.0, 4.0])
    pred = np.array([1.5, np.nan, 3.0, 5.0])
    # biased: NaN prediction skipped in the sum but kept in the denominator
    assert metrics.mae_reference(ref, pred) == pytest.approx((0.5 + 0.0 + 1.0) / 4)
    assert metrics.mae_corrected(ref, pred) == pytest.approx((0.5 + 0.0 + 1.0) / 3)
    assert metrics.rmse_reference(ref, pred) == pytest.approx(np.sqrt((0.25 + 1.0) / 4))
    assert metrics.max_error_reference(ref, pred) == pytest.approx(1.0)
    assert metrics.coverage(pred) == pytest.approx(0.75)


def test_metrics_all_nan_max_is_zero():
    ref = np.array([1.0, 2.0])
    pred = np.array([np.nan, np.nan])
    assert metrics.max_error_reference(ref, pred) == 0.0


# ---------------------------------------------------------------------------
# synthetic generators
# ---------------------------------------------------------------------------

def test_shelf_seamount_formula():
    g = shelf_seamount(5, 5)
    # corner (0,0): baseline -(10 + 0), mountain exp tiny
    assert g[0, 0] == pytest.approx(-10.0, abs=1e-3)
    # deepest corner x=100: baseline -(10+200)
    assert g[0, 4] == pytest.approx(-210.0, abs=1.0)


def test_sinusoid_formula():
    g = sinusoid(3, 3)
    assert g[0, 0] == pytest.approx(-1000.0 - 15.0)
    assert g[1, 2] == pytest.approx(-1000.0 - 10.0 * np.sin(0.02) - 15.0 * np.cos(0.01))


PUBLISHED_EPR = {  # results/EastPacific_runtimes_errors.csv
    "bilinear": (14.4228, 24.8556, 305.667),
    "cubic": (14.4862, 25.9785, 363.25),
    "kriging": (11.1512, 19.4132, 453.267),
}


@pytest.mark.slow
@pytest.mark.parametrize("method", ["bilinear", "cubic", "kriging"])
def test_published_east_pacific_errors(method):
    g, qlon, qlat, vals = _grid_b_setup("east_pacific", 0.01)
    pred = getattr(g, method)(qlon, qlat)
    mae, rmse, mx = PUBLISHED_EPR[method]
    m = metrics.all_reference_metrics(vals, pred)
    assert m["MAE"] == pytest.approx(mae, abs=5e-5)
    assert m["RMSE"] == pytest.approx(rmse, abs=5e-5)
    assert m["MaxError"] == pytest.approx(mx, abs=5e-3)
