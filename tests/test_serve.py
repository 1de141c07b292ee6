"""AOT export/serving artifacts (auvtpu.serve): roundtrip parity with the
live jitted fill."""

import numpy as np

from auvtpu.config import Extent
from auvtpu.grid import RegularGrid
from auvtpu.masking import mask_grid
from auvtpu.ops import fill_kriging
from auvtpu.serve import export_fill, load_exported
from auvtpu.synthetic import shelf_seamount


def test_export_roundtrip_matches_live(tmp_path):
    H, W = 48, 64
    ext = (0.0, float(W - 1), 0.0, float(H - 1))
    elev, _, _ = mask_grid(shelf_seamount(H, W), 0.12, seed=6)
    g = RegularGrid.from_nan_array(elev, Extent(*ext))

    path = str(tmp_path / "fill.bin")
    n = export_fill(path, (H, W), extent=ext, method="kriging", max_radius=5)
    assert n > 0

    srv = load_exported(path)
    got = np.asarray(srv(g.elev, g.valid))
    want = np.asarray(fill_kriging(g, max_radius=5))
    assert np.array_equal(got, want, equal_nan=True)


def test_export_is_python_free(tmp_path):
    """The artifact must serve without the exporting closure: simulate by
    corrupting nothing and just calling through a fresh loader twice."""
    H, W = 32, 32
    ext = (0.0, 31.0, 0.0, 31.0)
    elev, _, _ = mask_grid(shelf_seamount(H, W), 0.1, seed=7)
    g = RegularGrid.from_nan_array(elev, Extent(*ext))
    path = str(tmp_path / "fill_idw.bin")
    export_fill(path, (H, W), extent=ext, method="idw", max_radius=5)
    a = np.asarray(load_exported(path)(g.elev, g.valid))
    b = np.asarray(load_exported(path)(g.elev, g.valid))
    assert np.array_equal(a, b, equal_nan=True)
    assert np.isfinite(a).any()


def test_export_scattered_roundtrip(tmp_path):
    from auvtpu.ops.packs import StencilPack, packed_kriging
    from auvtpu.serve import export_scattered, load_exported_scattered

    H, W = 40, 48
    ext = (0.0, float(W - 1), 0.0, float(H - 1))
    elev, _, _ = mask_grid(shelf_seamount(H, W), 0.1, seed=8)
    g = RegularGrid.from_nan_array(elev, Extent(*ext))
    sp = StencilPack(g, window_radius=2)
    rng = np.random.RandomState(3)
    lons = rng.uniform(0, W - 1, 200).astype(np.float32)
    lats = rng.uniform(0, H - 1, 200).astype(np.float32)

    path = str(tmp_path / "scattered.bin")
    export_scattered(path, (H, W), 200, extent=ext, method="kriging")
    got = np.asarray(load_exported_scattered(path)(sp.window, g.elev, g.valid, lons, lats))
    want = np.asarray(packed_kriging(sp.window, g, lons, lats, window_radius=2))
    assert np.array_equal(got, want, equal_nan=True)


def test_export_learned_roundtrip(tmp_path):
    import pytest

    learned = pytest.importorskip("auvtpu.learned")
    if not learned.learned_available():
        pytest.skip("flax unavailable")
    import jax

    from auvtpu.serve import export_learned

    H, W = 40, 48
    ext = (0.0, float(W - 1), 0.0, float(H - 1))
    elev, _, _ = mask_grid(shelf_seamount(H, W), 0.1, seed=8)
    g = RegularGrid.from_nan_array(elev, Extent(*ext))
    params = learned.init_params(jax.random.PRNGKey(2), width=8, depth=1, tile=32)
    path = str(tmp_path / "learned.bin")
    export_learned(path, (H, W), params, extent=ext, width=8, depth=1)
    got = np.asarray(load_exported(path)(g.elev, g.valid))
    want = np.asarray(learned.fill_learned(g, params, width=8, depth=1))
    assert np.array_equal(got, want, equal_nan=True)


def test_export_mission_roundtrip(tmp_path):
    """Exported fill+resample pair == the live BandRouter atlas path."""
    import jax.numpy as jnp

    from auvtpu.ops.band import BandRouter
    from auvtpu.serve import (
        export_mission_fill,
        export_mission_resample,
        load_exported_mission,
    )

    H, W = 192, 256
    ext = (0.0, float(W - 1), 0.0, float(H - 1))
    elev, _, _ = mask_grid(shelf_seamount(H, W), 0.1, seed=9)
    g = RegularGrid.from_nan_array(elev, Extent(*ext))
    # diagonal mission -> multi-page atlas
    t = np.linspace(0, 1, 1024)
    rng = np.random.default_rng(0)
    lons = np.clip(1.0 + t * (W - 3) + rng.normal(0, 0.05, t.size),
                   0.5, W - 1.5).astype(np.float32)
    lats = np.clip(1.0 + t * (H - 3) + 2 * np.sin(t * 20 * np.pi)
                   + rng.normal(0, 0.05, t.size),
                   0.5, H - 1.5).astype(np.float32)
    router = BandRouter(g, chunk=128, win_rows=32, win_cols=128,
                        fill_backend="xla", max_bands=3)
    atlas = router.prepare(lons, lats)
    assert atlas.shape[0] > 1
    _, pr, pc = atlas.shape

    fpath = str(tmp_path / "mission_fill.bin")
    rpath = str(tmp_path / "mission_resample.bin")
    assert export_mission_fill(fpath, (H, W), atlas.placed, pr, pc,
                               extent=ext) > 0
    assert export_mission_resample(rpath, (H, W), atlas.placed, pr, pc,
                                   len(lons), extent=ext, chunk=128,
                                   win_rows=32, win_cols=128,
                                   masked=atlas.masked) > 0

    fill, run = load_exported_mission(fpath, rpath)
    planes, vmasks = fill(g.elev, g.valid)
    assert np.array_equal(np.asarray(planes), np.asarray(atlas.planes))
    assert np.array_equal(np.asarray(vmasks), np.asarray(atlas.vmasks))
    z, ok = run(planes, vmasks, lons, lats)
    zl, okl = router._resampler.resample(jnp.asarray(lons), jnp.asarray(lats))
    assert np.array_equal(np.asarray(ok), np.asarray(okl))
    assert np.array_equal(np.asarray(z), np.asarray(zl), equal_nan=True)
