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
