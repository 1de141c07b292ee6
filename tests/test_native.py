"""Native C++ engine tests (skipped when the library can't build)."""

import numpy as np
import pytest

from auvtpu.golden import GoldenGrid
from auvtpu.masking import mask_grid
from auvtpu.synthetic import shelf_seamount

native = pytest.importorskip("auvtpu.native")
if not native.available():
    pytest.skip("native library unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def setup():
    elev = shelf_seamount(60, 80)
    elev, _, _ = mask_grid(elev, 0.1, seed=7)
    bounds = (-180.0, -160.0, 20.0, 30.0)
    ng = native.NativeGolden(elev, *bounds)
    pg = GoldenGrid(elev, *bounds)
    r = np.random.RandomState(0)
    lons = r.uniform(-180 + 1e-6, -160 - 1e-6, 2000)
    lats = r.uniform(20 + 1e-6, 30 - 1e-6, 2000)
    return ng, pg, lons, lats


@pytest.mark.parametrize("method", ["bilinear", "cubic", "kriging"])
def test_native_matches_numpy_golden(setup, method):
    ng, pg, lons, lats = setup
    a = getattr(ng, method)(lons, lats)
    b = getattr(pg, method)(lons, lats)
    nan_ok = np.isnan(a) == np.isnan(b)
    assert nan_ok.all()
    both = ~np.isnan(a)
    # bilinear/cubic are bit-identical; kriging differs only by FMA
    # contraction in the C++ build (~1e-10 absolute)
    tol = 0.0 if method in ("bilinear", "cubic") else 1e-8
    assert np.max(np.abs(a[both] - b[both])) <= tol


def test_native_csv_roundtrip(tmp_path):
    g = shelf_seamount(20, 30)
    g[3, 4] = np.nan
    path = str(tmp_path / "g.csv")
    native.write_grid_csv(path, g)
    back = native.read_grid_csv(path)
    assert back.shape == g.shape
    assert np.array_equal(np.isnan(back), np.isnan(g))
    both = ~np.isnan(g)
    np.testing.assert_allclose(back[both], g[both], rtol=1e-12)


def test_native_csv_matches_python_reader(tmp_path):
    from auvtpu.io import write_grid_csv as py_write

    g = shelf_seamount(15, 17)
    g[0, 0] = np.nan
    p1 = str(tmp_path / "native.csv")
    p2 = str(tmp_path / "py.csv")
    native.write_grid_csv(p1, g)
    py_write(p2, g)
    a = native.read_grid_csv(p2)  # native reads python-written
    import pandas as pd

    b = pd.read_csv(p1, header=None).to_numpy()  # python reads native-written
    for arr in (a, b):
        assert np.array_equal(np.isnan(arr), np.isnan(g))
        m = ~np.isnan(g)
        np.testing.assert_allclose(arr[m], g[m], rtol=1e-10)
