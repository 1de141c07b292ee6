"""Stencil-pack scattered ops vs the plain scattered ops / golden oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from auvtpu.config import Extent
from auvtpu.grid import RegularGrid
from auvtpu.masking import mask_grid
from auvtpu.ops import scattered_bicubic, scattered_bilinear, scattered_idw, scattered_kriging
from auvtpu.ops.packs import (
    StencilPack,
    fetch_pack,
    build_pack,
    packed_bicubic,
    packed_bilinear,
    packed_idw,
    packed_kriging,
)
from auvtpu.synthetic import shelf_seamount

H, W = 70, 90
EXT = Extent(0.0, float(W - 1), 0.0, float(H - 1))


def _mk(masked):
    elev = shelf_seamount(H, W)
    if masked:
        elev, _, _ = mask_grid(elev, 0.08, seed=12)
    return RegularGrid.from_nan_array(elev, EXT)


def _queries(n=400, seed=5):
    r = np.random.RandomState(seed)
    return (
        r.uniform(1e-6, W - 1 - 1e-6, n).astype(np.float32),
        r.uniform(1e-6, H - 1 - 1e-6, n).astype(np.float32),
    )


def test_fetch_pack_roundtrip():
    grid = _mk(False)
    pack, P = build_pack(grid, [(0, 0), (0, 1), (1, 0)], clamp=True)
    assert P == 4
    idx = jnp.asarray([0, 5, W + 3, H * W - 1], jnp.int32)
    st = np.asarray(fetch_pack(pack, P, idx))
    elev = np.asarray(grid.elev)
    rr, cc = np.divmod(np.asarray(idx), W)
    np.testing.assert_allclose(st[:, 0], elev[rr, cc], rtol=1e-6)
    np.testing.assert_allclose(st[:, 1], elev[rr, np.minimum(cc + 1, W - 1)], rtol=1e-6)
    np.testing.assert_allclose(st[:, 2], elev[np.minimum(rr + 1, H - 1), cc], rtol=1e-6)
    assert np.isnan(st[:, 3]).all()  # padding lane


@pytest.mark.parametrize("masked", [False, True])
def test_packed_bilinear_matches_scattered(masked):
    grid = _mk(masked)
    sp = StencilPack(grid)
    lons, lats = _queries()
    a = np.asarray(packed_bilinear(sp.bilinear, grid, lons, lats))
    b = np.asarray(scattered_bilinear(grid, lons, lats))
    assert (np.isnan(a) == np.isnan(b)).all()
    both = ~np.isnan(a)
    np.testing.assert_allclose(a[both], b[both], rtol=1e-5, atol=1e-3)


def test_packed_bicubic_matches_scattered_on_valid_grid():
    grid = _mk(False)
    sp = StencilPack(grid)
    lons, lats = _queries()
    a = np.asarray(packed_bicubic(sp.bicubic, grid, lons, lats))
    b = np.asarray(scattered_bicubic(grid, lons, lats, fallback="never"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("masked", [False, True])
def test_packed_kriging_matches_scattered(masked):
    grid = _mk(masked)
    sp = StencilPack(grid, window_radius=2)
    lons, lats = _queries(300)
    a = np.asarray(packed_kriging(sp.window, grid, lons, lats, window_radius=2))
    b = np.asarray(scattered_kriging(grid, lons, lats, max_radius=2))
    assert (np.isnan(a) == np.isnan(b)).all()
    both = ~np.isnan(a)
    np.testing.assert_allclose(a[both], b[both], rtol=1e-4, atol=0.1)


@pytest.mark.parametrize("masked", [False, True])
def test_packed_idw_matches_scattered(masked):
    grid = _mk(masked)
    sp = StencilPack(grid, window_radius=2)
    lons, lats = _queries()
    a = np.asarray(packed_idw(sp.window, grid, lons, lats, k=8, window_radius=2))
    b = np.asarray(scattered_idw(grid, lons, lats, k=8, max_radius=2))
    assert (np.isnan(a) == np.isnan(b)).all()
    both = ~np.isnan(a)
    np.testing.assert_allclose(a[both], b[both], rtol=1e-5, atol=1e-2)


def test_two_tier_matches_full_window():
    from auvtpu.ops.two_tier import TwoTierInterpolator

    # heavy removal so some queries genuinely escalate past radius 2
    elev = shelf_seamount(H, W)
    elev, _, _ = mask_grid(elev, 0.6, seed=31)
    grid = RegularGrid.from_nan_array(elev, EXT)
    tt = TwoTierInterpolator(grid, escalate_cap=64)
    r = np.random.RandomState(9)
    lons = r.uniform(1e-6, W - 1 - 1e-6, 500).astype(np.float32)
    lats = r.uniform(1e-6, H - 1 - 1e-6, 500).astype(np.float32)
    got_k = np.asarray(tt.kriging(lons, lats))
    want_k = np.asarray(scattered_kriging(grid, lons, lats, max_radius=10))
    assert (np.isnan(got_k) == np.isnan(want_k)).all()
    both = ~np.isnan(got_k)
    np.testing.assert_allclose(got_k[both], want_k[both], rtol=1e-4, atol=0.1)
    got_i = np.asarray(tt.idw(lons, lats, k=8))
    want_i = np.asarray(scattered_idw(grid, lons, lats, k=8, max_radius=10))
    both = ~np.isnan(got_i) & ~np.isnan(want_i)
    np.testing.assert_allclose(got_i[both], want_i[both], rtol=1e-4, atol=0.05)


def test_two_tier_escalation_respects_cap():
    """escalate_cap must bound every slow-path trace shape: the escalated
    recompute is chunked, never padded to the full batch (VERDICT r1 weak #2:
    unbounded pad_n materialized ~(N, 441) candidate tensors -> OOM at 5M)."""
    from auvtpu.ops.two_tier import TwoTierInterpolator

    elev = shelf_seamount(H, W)
    elev, _, _ = mask_grid(elev, 0.85, seed=7)  # heavy: many escalations
    grid = RegularGrid.from_nan_array(elev, EXT)
    cap = 128
    tt = TwoTierInterpolator(grid, escalate_cap=cap)
    seen_shapes = []
    orig_run = tt._run

    def spying_run(fast_fn, slow_fn, lons, lats, k):
        def spy_slow(lo, la):
            seen_shapes.append(lo.shape[0])
            return slow_fn(lo, la)

        return orig_run(fast_fn, spy_slow, lons, lats, k)

    tt._run = spying_run
    r = np.random.RandomState(11)
    n = 4000
    lons = r.uniform(1e-6, W - 1 - 1e-6, n).astype(np.float32)
    lats = r.uniform(1e-6, H - 1 - 1e-6, n).astype(np.float32)
    got = np.asarray(tt.kriging(lons, lats))
    assert seen_shapes, "expected escalations at 85% removal"
    assert max(seen_shapes) <= cap
    assert len(seen_shapes) >= 2  # genuinely chunked
    want = np.asarray(scattered_kriging(grid, lons, lats, max_radius=10))
    assert (np.isnan(got) == np.isnan(want)).all()
    both = ~np.isnan(got)
    np.testing.assert_allclose(got[both], want[both], rtol=1e-4, atol=0.1)


def test_packed_assume_valid_matches_general_on_valid_grid():
    # the single-reduction fast path must be value-identical on fully-valid
    # grids (it skips only the fallback/NaN-detection reductions)
    grid = _mk(False)
    sp = StencilPack(grid, window_radius=2)
    lons, lats = _queries()
    for pack, fn in [(sp.bilinear, packed_bilinear), (sp.bicubic, packed_bicubic)]:
        a = np.asarray(fn(pack, grid, lons, lats, assume_valid=True))
        b = np.asarray(fn(pack, grid, lons, lats))
        np.testing.assert_array_equal(a, b)


def test_two_tier_fused_backend_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    from auvtpu.ops import TwoTierInterpolator

    grid = _mk(masked=True)
    lons, lats = _queries(400, seed=21)
    a = TwoTierInterpolator(grid, backend="xla")
    with pltpu.force_tpu_interpret_mode():
        b = TwoTierInterpolator(grid, backend="fused")
        got_k = np.asarray(b.kriging(lons, lats))
        got_i = np.asarray(b.idw(lons, lats))
    want_k = np.asarray(a.kriging(lons, lats))
    want_i = np.asarray(a.idw(lons, lats))
    for got, want in [(got_k, want_k), (got_i, want_i)]:
        assert (np.isnan(got) == np.isnan(want)).all()
        m = ~np.isnan(want)
        np.testing.assert_allclose(got[m], want[m], rtol=1e-4, atol=1e-3)


def test_two_tier_transposed_backend_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    from auvtpu.ops import TwoTierInterpolator
    from auvtpu.pallas import pallas_packed_idw_t, pallas_packed_kriging_t

    # carve an 11x11 hole so queries at its center MUST escalate (no valid
    # cell within the radius-2 window)
    elev = shelf_seamount(H, W)
    elev, _, _ = mask_grid(elev, 0.08, seed=12)
    elev[30:41, 30:41] = np.nan
    grid = RegularGrid.from_nan_array(elev, EXT)
    lons, lats = _queries(400, seed=21)
    lons = np.concatenate([lons, np.array([35.0, 35.4], np.float32)])
    lats = np.concatenate([lats, np.array([35.0, 34.6], np.float32)])
    a = TwoTierInterpolator(grid, backend="xla")
    # the fused in-kernel resolution row must equal _resolved_mask_jit
    # (same found>=k && kth-d2<thresh test), so escalation picks the SAME
    # query set
    mask_k, bad_k = a._resolved_mask(lons, lats, 4)
    mask_i, bad_i = a._resolved_mask(lons, lats, 8)
    thresh = a._outside_min_d2()
    with pltpu.force_tpu_interpret_mode():
        _, fm_k, fb_k = pallas_packed_kriging_t(
            a.pack.window, grid, lons, lats, resolve_thresh=thresh, tile_n=256
        )
        _, fm_i, fb_i = pallas_packed_idw_t(
            a.pack.window, grid, lons, lats, k=8, resolve_thresh=thresh, tile_n=256
        )
        b = TwoTierInterpolator(grid, backend="transposed")
        got_k = np.asarray(b.kriging(lons, lats))
        got_i = np.asarray(b.idw(lons, lats))
    np.testing.assert_array_equal(np.asarray(fm_k), np.asarray(mask_k))
    np.testing.assert_array_equal(np.asarray(fm_i), np.asarray(mask_i))
    assert int(fb_k) == int(bad_k) and int(fb_i) == int(bad_i)
    assert int(bad_k) > 0  # the fixture must actually exercise escalation
    want_k = np.asarray(a.kriging(lons, lats))
    want_i = np.asarray(a.idw(lons, lats))
    for got, want in [(got_k, want_k), (got_i, want_i)]:
        assert (np.isnan(got) == np.isnan(want)).all()
        m = ~np.isnan(want)
        np.testing.assert_allclose(got[m], want[m], rtol=1e-4, atol=1e-3)


def test_tie_line_queries_fast_equals_slow():
    """Constructed tie-line queries (the 3fx+2fy=1 family): the packed fast
    path, its radius-10 escalation, the fused Pallas select, and the GoldenV2
    oracle must all break the equal-actual-d2 tie the same way — by reference
    COLLECTION order (ring 1 before ring 2), never by the static window-table
    order.  Regression test for the old distance-sorted pack layout, under
    which `lax.top_k` picked the ring-2 cell (static d2 2.5 < 4.5) while the
    escalation picked the ring-1 cell (VERDICT r2 ask #5)."""
    from auvtpu.golden.v2 import GoldenV2
    from auvtpu.ops.packs import packed_window_select
    from auvtpu.ops.window import window_select

    HH = WW = 32
    # queries on 3fx+2fy=1 with dyadic (exact-in-f32) fractions; center (10,10)
    ci, cj = 10, 10
    fracs = [(0.25, 0.125), (0.375, -0.0625), (0.125, 0.3125), (0.4375, -0.15625)]
    for fx, fy in fracs:
        # offsets (dx,dy): A=(1,1) ring 1, B=(-2,-1) ring 2 tie exactly
        dA = (1.5 - fx) ** 2 + (1.5 - fy) ** 2
        dB = (1.5 + fx) ** 2 + (0.5 + fy) ** 2
        assert np.float32(dA) == np.float32(dB), (fx, fy)

    elev = np.full((HH, WW), np.nan, np.float64)
    near = {(0, 0): 1.0, (0, -1): 2.0, (-1, 0): 3.0}  # d2 < tie distance
    for (dx, dy), v in near.items():
        elev[cj + dy, ci + dx] = v
    elev[cj + 1, ci + 1] = 100.0    # A: ring 1 — collection order winner
    elev[cj - 1, ci - 2] = -100.0   # B: ring 2 — static-d2 order winner
    ext = Extent(0.0, float(WW - 1), 0.0, float(HH - 1))
    grid = RegularGrid.from_nan_array(elev, ext)
    gv2 = GoldenV2(elev, 0.0, float(WW - 1), 0.0, float(HH - 1))

    lons = np.asarray([ci + fx for fx, _ in fracs], np.float32)
    lats = np.asarray([cj + fy for _, fy in fracs], np.float32)
    x = jnp.asarray(lons)
    y = jnp.asarray(lats)
    cii = jnp.full((len(fracs),), ci, jnp.int32)
    cjj = jnp.full((len(fracs),), cj, jnp.int32)

    sp = StencilPack(grid, window_radius=2)
    sel_fast = packed_window_select(sp.window, grid, x, y, k=4, window_radius=2)
    sel_slow = window_select(grid, x, y, cii, cjj, k=4, max_radius=10)
    want_val, *_ = gv2._window_topk(lons.astype(np.float64), lats.astype(np.float64),
                                    np.full(len(fracs), ci), np.full(len(fracs), cj), 4)
    # slot 3 holds the tie winner: must be A (+100), by collection order
    assert (want_val[:, 3] == 100.0).all()
    np.testing.assert_allclose(np.asarray(sel_fast["val"]), want_val, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sel_slow["val"]), want_val, atol=1e-5)

    # end-to-end: TwoTier fast path == its own escalation == oracle
    from auvtpu.ops.two_tier import TwoTierInterpolator

    tt = TwoTierInterpolator(grid)
    got_k = np.asarray(tt.kriging(x, y))
    want_k = np.asarray(scattered_kriging(grid, x, y, max_radius=10))
    np.testing.assert_allclose(got_k, want_k, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(got_k, gv2.kriging(lons, lats), rtol=1e-4, atol=1e-2)
    got_i = np.asarray(tt.idw(x, y, k=4))
    want_i = np.asarray(scattered_idw(grid, x, y, k=4, max_radius=10))
    np.testing.assert_allclose(got_i, want_i, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(got_i, gv2.idw(lons, lats, k=4), rtol=1e-4, atol=1e-2)

    # fused Pallas select (interpret mode) uses the same collection-order table
    from auvtpu.pallas import pallas_available

    if pallas_available():
        from jax.experimental.pallas import tpu as pltpu

        from auvtpu.pallas import pallas_window_select

        with pltpu.force_tpu_interpret_mode():
            sel_f = pallas_window_select(sp.window, grid, x, y, k=4, window_radius=2)
            np.testing.assert_allclose(np.asarray(sel_f["val"]), want_val, atol=1e-5)


def test_packed_kriging_valid_matches_windowed():
    """The 16-lane {-2..1}^2 fast path must equal the full radius-2 windowed
    v2 top-4 on fully-valid grids — including near-half-cell fractional
    positions (where a first, WRONG design that assumed a static 2x2
    neighbor set diverged: at |f| ~ 0.5 the 4th neighbor can be the (+1, 0)
    cell, not (-1, -1)), exact tie positions, and edge-clipped anchors
    (containment proof in ops.packs.packed_kriging_valid's docstring)."""
    from auvtpu.ops.packs import build_valid16_pack, packed_kriging_valid

    grid = _mk(False)
    sp = StencilPack(grid, window_radius=2)
    p16 = build_valid16_pack(grid)
    lons, lats = _queries(500, seed=33)
    extra_x = np.asarray(
        [10.0, 10.5, 0.2, W - 1.2, 1e-6, 33.25, 17.5, 0.4, 5.4999, 7.0], np.float32
    )
    extra_y = np.asarray(
        [12.0, 7.5, 0.3, 5.0, H - 1.3, 41.5, 0.1, H - 1 - 1e-6, 3.4999, 9.5], np.float32
    )
    lons = np.concatenate([lons, extra_x])
    lats = np.concatenate([lats, extra_y])
    a = np.asarray(packed_kriging_valid(p16, grid, lons, lats))
    b = np.asarray(packed_kriging(sp.window, grid, lons, lats, window_radius=2))
    assert (np.isnan(a) == np.isnan(b)).all()
    m = ~np.isnan(a)
    np.testing.assert_allclose(a[m], b[m], rtol=1e-6, atol=1e-4)


def test_packed_kriging_valid_rejects_centered():
    from auvtpu.ops.packs import build_valid16_pack, packed_kriging_valid

    grid = _mk(False)
    p16 = build_valid16_pack(grid)
    with pytest.raises(ValueError):
        packed_kriging_valid(p16, grid, *_queries(8), convention="centered")


def test_packed_kriging_variance_matches_dense():
    """Scattered-serving kriging variance at masked cell centers equals the
    dense fill's variance plane (same radius-2 selection semantics)."""
    from auvtpu.ops import fill_kriging

    grid = _mk(True)
    sp = StencilPack(grid, window_radius=2)
    gv = np.asarray(grid.valid) > 0.5
    rows, cols = np.where(~gv)
    rows, cols = rows[:300], cols[:300]
    lons = grid.min_lon + cols * grid.lon_step
    lats = grid.min_lat + rows * grid.lat_step
    pred, var = packed_kriging(
        sp.window, grid, lons, lats, window_radius=2, with_variance=True
    )
    pred, var = np.asarray(pred), np.asarray(var)
    dp, dv = fill_kriging(grid, max_radius=2, with_variance=True)
    dp = np.asarray(dp)[rows, cols]
    dv = np.asarray(dv)[rows, cols]
    assert (np.isnan(var) == np.isnan(dv)).all()
    m = ~np.isnan(var)
    assert (var[m] >= 0).all()
    np.testing.assert_allclose(var[m], dv[m], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(pred[m], dp[m], rtol=1e-4, atol=1e-2)


def test_two_tier_variance_matches_full_window():
    """return_variance: two-tier prediction AND variance must match the full
    radius-10 window solve, including escalated queries."""
    from auvtpu.ops.two_tier import TwoTierInterpolator

    elev = shelf_seamount(H, W)
    elev, _, _ = mask_grid(elev, 0.6, seed=31)
    grid = RegularGrid.from_nan_array(elev, EXT)
    tt = TwoTierInterpolator(grid, escalate_cap=64, backend="xla")
    r = np.random.RandomState(9)
    lons = r.uniform(1e-6, W - 1 - 1e-6, 500).astype(np.float32)
    lats = r.uniform(1e-6, H - 1 - 1e-6, 500).astype(np.float32)
    got_k, got_v = tt.kriging(lons, lats, return_variance=True)
    got_k, got_v = np.asarray(got_k), np.asarray(got_v)
    want_k, want_v = scattered_kriging(
        grid, lons, lats, max_radius=10, with_variance=True
    )
    want_k, want_v = np.asarray(want_k), np.asarray(want_v)
    assert (np.isnan(got_k) == np.isnan(want_k)).all()
    both = ~np.isnan(got_k)
    np.testing.assert_allclose(got_k[both], want_k[both], rtol=1e-4, atol=0.1)
    vb = ~np.isnan(got_v) & ~np.isnan(want_v)
    assert (got_v[vb] >= 0).all()
    np.testing.assert_allclose(got_v[vb], want_v[vb], rtol=1e-3, atol=0.05)
    # plain call unchanged by the variance plumbing
    plain = np.asarray(tt.kriging(lons, lats))
    np.testing.assert_allclose(plain[both], got_k[both], rtol=1e-6, atol=1e-5)
