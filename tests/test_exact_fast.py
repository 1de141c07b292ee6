"""Two-tier exact mode (ops/exact_fast.py) parity tests.

The claim: the dense streaming selection + tie escalation reproduces
ops/exact.py's selection bit-for-bit (same found counts, same neighbors in
the same order), and the two-tier kriging matches the strict path to f64
noise ('coords' solve) / lattice-gamma tolerance ('table' solve), including
on the real published-table workload.
"""

import numpy as np
import pytest

from auvtpu.config import Extent
from auvtpu.golden import GoldenGrid
from auvtpu.grid import RegularGrid
from auvtpu.masking import mask_grid
from auvtpu.ops.exact import exact_kriging_at_cells, exact_select_at_cells
from auvtpu.ops.exact_fast import (
    exact_kriging_at_cells_fast,
    exact_select_at_cells_fast,
)
from auvtpu.synthetic import shelf_seamount

from test_exact import AWKWARD, _real_region, x64  # noqa: F401  (fixture)

# an extent whose index->geo->index round-trip is residue-free (binary-exact
# steps), so EVERY distance tie is an exact T tie -> maximal escalation
DEGENERATE = Extent(0.0, 79.0, -32.0, 31.0)


def _masked(h, w, removal, seed, extent=AWKWARD):
    elev = shelf_seamount(h, w)
    reduced, rc, vals = mask_grid(elev, removal, seed=seed)
    grid = RegularGrid.from_nan_array(reduced, extent)
    return grid, rc, vals, reduced


def _row_keys(q, rc, gi, gj):
    """Reconstruct each selected slot's exact (d2, T) key from its offsets
    (the derivation in ops/exact.py's docstring)."""
    v = q.variant
    ax = -(v >> 1)
    ay = -(v & 1)
    dx = gi - q.ci[:, None] + ax[:, None]
    dy = gj - q.cj[:, None] + ay[:, None]
    d2 = ((dx + 0.5) ** 2 + (dy + 0.5) ** 2).astype(np.float32)
    T = (
        q.ex_key[:, None] * (2 * dx + 1) + q.ey_key[:, None] * (2 * dy + 1)
    ).astype(np.float32)
    return d2, T


def _canon(q, rc, gi, gj, v):
    """Sort each row's 4 slots canonically by (d2 asc, T desc, gi, gj): the
    exact selection ORDER except inside exact-key ties, where the reference's
    swap-mutated order and the dense pass's collection order may differ
    (solve-equivalent; see ops/exact_fast.py docstring)."""
    d2, T = _row_keys(q, rc, gi, gj)
    order = np.lexsort((gj, gi, -T, d2), axis=1)
    take = np.take_along_axis
    return take(gi, order, 1), take(gj, order, 1), take(v, order, 1), d2, T


def _assert_selection_equal(grid, rc):
    f1, v1, gi1, gj1, q1 = exact_select_at_cells(grid, rc[:, 0], rc[:, 1])
    f2, v2, gi2, gj2, q2, esc = exact_select_at_cells_fast(grid, rc[:, 0], rc[:, 1])
    np.testing.assert_array_equal(f2, f1)
    live = ~q1.oob
    ok = (f1 >= 4) & live
    # canonical order: the selected SETs must be identical everywhere
    cgi1, cgj1, cv1, d2_1, T_1 = _canon(q1, rc, gi1, gj1, v1)
    cgi2, cgj2, cv2, _, _ = _canon(q1, rc, gi2, gj2, v2)
    np.testing.assert_array_equal(cgi2[ok], cgi1[ok])
    np.testing.assert_array_equal(cgj2[ok], cgj1[ok])
    np.testing.assert_array_equal(cv2[ok], cv1[ok])
    # raw slot order must be bitwise-identical wherever the 4 keys are
    # pairwise distinct (no in-tie reordering freedom)
    key = (d2_1.astype(np.float64) * (1 << 30)) - T_1.astype(np.float64)
    distinct = ok & (np.diff(np.sort(key, axis=1), axis=1) != 0).all(axis=1)
    np.testing.assert_array_equal(gi2[distinct], gi1[distinct])
    np.testing.assert_array_equal(gj2[distinct], gj1[distinct])
    np.testing.assert_array_equal(v2[distinct], v1[distinct])
    # found<4 slots: all eligible candidates are selected; sets must match
    few = (f1 > 0) & (f1 < 4) & live
    if few.any():
        np.testing.assert_array_equal(np.sort(v2[few]), np.sort(v1[few]))
    return esc


@pytest.mark.parametrize("removal,seed", [(0.1, 0), (0.3, 5), (0.5, 2), (0.7, 3)])
def test_dense_selection_matches_strict(removal, seed):
    grid, rc, _, _ = _masked(64, 80, removal, seed)
    esc = _assert_selection_equal(grid, rc)
    # awkward extents break ties via T; escalation should be the exception
    assert esc.mean() < 0.20


def test_dense_selection_degenerate_ties_escalate():
    # residue-free extent: T == 0 everywhere, every distance tie is exact.
    # Boundary ties (4th key == 5th key) must fire the flag and the
    # escalated answers must still agree; ties fully inside the top four
    # stay on the dense path (set-identical, solve-equivalent)
    grid, rc, _, _ = _masked(48, 64, 0.3, seed=1, extent=DEGENERATE)
    esc = _assert_selection_equal(grid, rc)
    assert 0.05 < esc.mean() < 0.5  # fires, but only at the boundary


def test_dense_selection_sparse_never_stops():
    # removal so heavy that many cells never hold 4 candidates: exercises the
    # full-extent scan + found<4 fallback
    grid, rc, _, _ = _masked(40, 56, 0.97, seed=4)
    _assert_selection_equal(grid, rc)


@pytest.mark.parametrize("solve,tol", [("coords", 1e-11), ("table", 1e-6)])
def test_two_tier_kriging_matches_strict(x64, solve, tol):
    grid, rc, _, _ = _masked(64, 80, 0.3, seed=5)
    grid64 = RegularGrid.from_nan_array(np.asarray(grid.to_nan_array(), np.float64), AWKWARD, dtype=np.float64)
    want = np.asarray(exact_kriging_at_cells(grid64, rc[:, 0], rc[:, 1]), np.float64)
    got = np.asarray(
        exact_kriging_at_cells_fast(grid64, rc[:, 0], rc[:, 1], solve=solve), np.float64
    )
    assert (np.isnan(got) == np.isnan(want)).all()
    m = ~np.isnan(want)
    np.testing.assert_allclose(got[m], want[m], atol=tol)


def test_two_tier_kriging_matches_golden(x64):
    g_elev = shelf_seamount(64, 80)
    reduced, rc, _ = mask_grid(g_elev, 0.3, seed=5)
    g = GoldenGrid(reduced, AWKWARD.min_lon, AWKWARD.max_lon, AWKWARD.min_lat, AWKWARD.max_lat)
    grid = RegularGrid.from_nan_array(reduced, AWKWARD, dtype=np.float64)
    qlon = g.min_lon + rc[:, 1] * g.lon_step
    qlat = g.min_lat + rc[:, 0] * g.lat_step
    want = g.kriging(qlon, qlat)
    got = np.asarray(exact_kriging_at_cells_fast(grid, rc[:, 0], rc[:, 1]), np.float64)
    assert (np.isnan(got) == np.isnan(want)).all()
    m = ~np.isnan(want)
    np.testing.assert_allclose(got[m], want[m], atol=1e-6)


PUBLISHED_MAR_KRIGING = (13.4503, 22.6796, 194.635)


def test_published_midatlantic_two_tier(x64):
    from auvtpu import metrics

    reduced, rc, vals, ext = _real_region("mid_atlantic", 0.01)
    grid = RegularGrid.from_nan_array(reduced, ext, dtype=np.float64)
    pred = np.asarray(exact_kriging_at_cells_fast(grid, rc[:, 0], rc[:, 1]), np.float64)
    mae, rmse, mx = PUBLISHED_MAR_KRIGING
    m = metrics.all_reference_metrics(vals, pred)
    assert m["MAE"] == pytest.approx(mae, abs=5e-5)
    assert m["RMSE"] == pytest.approx(rmse, abs=5e-5)
    assert m["MaxError"] == pytest.approx(mx, abs=5e-3)


def test_empty_queries(x64):
    grid, _, _, _ = _masked(32, 32, 0.1, 0)
    out = exact_kriging_at_cells_fast(grid, np.zeros(0, np.int64), np.zeros(0, np.int64))
    assert out.shape == (0,)
