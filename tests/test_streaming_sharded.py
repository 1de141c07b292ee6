"""Sharded streaming mosaic == single-device streaming mosaic, bit for bit.

The 8-device virtual CPU mesh (conftest) runs the row-band-sharded
StreamingInterpolator through identical ingest streams (with duplicate-cell
collisions, ragged flushes, and pad rows from H % n != 0) and pins every
surface against the single-device class — the SURVEY.md §5 'grid too big for
one chip while streaming' scenario (VERDICT r2 missing #2).
"""

import numpy as np
import pytest

import jax

from auvtpu.config import Extent
from auvtpu.parallel import ShardedStreamingInterpolator, make_mesh
from auvtpu.streaming import StreamingInterpolator

# H deliberately NOT divisible by 8: exercises the invalid pad rows
H, W = 108, 64
EXT = Extent(0.0, float(W - 1), 0.0, float(H - 1))
KW = dict(swath_cap=128, stage_slots=2, window=(32, 48), max_radius=5, k=4)


def _pair(method):
    mesh = make_mesh(8)
    a = StreamingInterpolator((H, W), EXT, method=method, **KW)
    b = ShardedStreamingInterpolator((H, W), EXT, mesh, method=method, **KW)
    return a, b


def _feed_both(a, b, seed=0, swaths=5, m=300):
    """Identical observation stream into both, duplicates included (small
    grid + many points force same-cell collisions so last-write-wins order
    is genuinely exercised)."""
    rng = np.random.default_rng(seed)
    for _ in range(swaths):
        rows = rng.integers(0, H, m)
        cols = rng.integers(0, W, m)
        vals = rng.normal(-2000.0, 100.0, m).astype(np.float32)
        a.ingest(rows, cols, vals)
        b.ingest(rows, cols, vals)


@pytest.mark.parametrize("method", ["kriging", "idw"])
def test_sharded_matches_single_device_bitwise(method):
    a, b = _pair(method)
    _feed_both(a, b)

    sa, sb = a.snapshot(), b.snapshot()
    assert sa.shape == sb.shape == (H, W)
    np.testing.assert_array_equal(sa, sb)  # NaN pattern + values, bit level

    # window fills at centers hitting: band interior, band boundary, mosaic
    # corner clips, and the padded last band
    for center in [(10, 10), (54, 32), (53, 0), (H - 1, W - 1), (0, 5)]:
        fa, (ra, ca) = a.window_fill(*center)
        fb, (rb, cb) = b.window_fill(*center)
        assert (ra, ca) == (rb, cb)
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_sharded_uncertainty_and_fit_match():
    a, b = _pair("kriging")
    _feed_both(a, b, seed=3)

    va = np.asarray([float(x) for x in a.fit_variogram(max_lag=5, n_bins=5)])
    vb = np.asarray([float(x) for x in b.fit_variogram(max_lag=5, n_bins=5)])
    # distributed pair sums reassociate float adds, and the Gauss-Newton fit
    # amplifies that on the ill-determined range of a noise field -> loose
    np.testing.assert_allclose(vb, va, rtol=2e-2, atol=1e-4)

    # align the fitted params so the fill comparison isolates the fill path
    b._vparams = a._vparams
    fa, _ = a.window_uncertainty(40, 30)
    fb, _ = b.window_uncertainty(40, 30)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(fa), rtol=1e-5, atol=1e-5)
    fa2, _ = a.window_fill(40, 30)
    fb2, _ = b.window_fill(40, 30)
    np.testing.assert_allclose(np.asarray(fb2), np.asarray(fa2), rtol=1e-6, atol=1e-4)


def test_sharded_checkpoint_roundtrip(tmp_path):
    a, b = _pair("idw")
    _feed_both(a, b, seed=7)
    p = str(tmp_path / "mosaic.npz")
    b.save(p)

    # sharded checkpoint resumes on a mesh...
    mesh = make_mesh(8)
    b2 = ShardedStreamingInterpolator.load(p, mesh)
    np.testing.assert_array_equal(b2.snapshot(), b.snapshot())
    # ...and is interchangeable with the single-device class's format
    a2 = StreamingInterpolator.load(p)
    np.testing.assert_array_equal(a2.snapshot(), a.snapshot())

    f1, _ = b2.window_fill(50, 20)
    f2, _ = a.window_fill(50, 20)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_sharded_planes_actually_sharded():
    _, b = _pair("idw")
    shard_rows = {s.index[0].start for s in b.elev.addressable_shards}
    assert len(shard_rows) == 8  # eight distinct row bands
    assert b.elev.shape[0] == 112  # 108 padded to a multiple of 8
    assert b.shape == (H, W)  # logical shape unchanged
