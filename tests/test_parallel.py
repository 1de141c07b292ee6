"""Sharding invariance: multi-device results must equal single-device results.

This is the multi-'node' analog of the reference's CPU<->GPU cross-validation
(test_interpolation.cpp:214-249), run on the 8-device virtual CPU mesh.
"""

import numpy as np
import pytest

import jax

from auvtpu.config import Extent
from auvtpu.grid import RegularGrid
from auvtpu.masking import mask_grid
from auvtpu.ops import fill_idw, fill_kriging, fill_window_mean, scattered_idw
from auvtpu.parallel import make_mesh, make_mesh2d, shard_queries, sharded_fill, sharded_fill2d, sharded_fit_fill
from auvtpu.synthetic import shelf_seamount

H, W = 96, 64
EXT = Extent(0.0, float(W - 1), 0.0, float(H - 1))


@pytest.fixture(scope="module")
def masked_grid():
    elev = shelf_seamount(H, W)
    elev, _, _ = mask_grid(elev, 0.15, seed=5)
    return RegularGrid.from_nan_array(elev, EXT)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("method,kwargs", [
    ("idw", dict(k=8)),
    ("window_mean", dict(k=4)),
    ("kriging", dict()),
])
def test_sharded_fill_matches_single_device(masked_grid, method, kwargs):
    mesh = make_mesh()
    got = np.asarray(sharded_fill(mesh, masked_grid, method, max_radius=10, **kwargs))
    single = {
        "idw": lambda g: fill_idw(g, k=8, max_radius=10),
        "window_mean": lambda g: fill_window_mean(g, k=4, max_radius=10),
        "kriging": lambda g: fill_kriging(g, max_radius=10),
    }[method](masked_grid)
    single = np.asarray(single)
    both = ~np.isnan(got) & ~np.isnan(single)
    assert (np.isnan(got) == np.isnan(single)).all()
    np.testing.assert_allclose(got[both], single[both], rtol=2e-5, atol=2e-3)


def test_sharded_fill_row_pad():
    # H=91 not divisible by 8: pad rows must not change results
    elev = shelf_seamount(91, W)
    elev, _, _ = mask_grid(elev, 0.1, seed=6)
    g = RegularGrid.from_nan_array(elev, Extent(0.0, float(W - 1), 0.0, 90.0))
    mesh = make_mesh()
    got = np.asarray(sharded_fill(mesh, g, "idw", k=8, max_radius=10))
    single = np.asarray(fill_idw(g, k=8, max_radius=10))
    both = ~np.isnan(got) & ~np.isnan(single)
    assert got.shape == single.shape
    np.testing.assert_allclose(got[both], single[both], rtol=2e-5, atol=2e-3)


def test_query_dp_matches_unsharded(masked_grid):
    r = np.random.RandomState(11)
    lons = r.uniform(0, W - 1, 1003)  # deliberately not divisible by 8
    lats = r.uniform(0, H - 1, 1003)
    mesh = make_mesh()
    (slon, slat), n_valid = shard_queries(mesh, lons, lats)
    got = np.asarray(scattered_idw(masked_grid, slon, slat))[:n_valid]
    want = np.asarray(scattered_idw(masked_grid, lons, lats))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_bands_shorter_than_radius_multihop():
    """8 devices x 2-row bands with a 10-deep halo: each halo spans 5
    neighbor bands — iterated one-hop ppermutes must assemble it exactly
    (round-1 raised ValueError here)."""
    elev = shelf_seamount(16, W)
    elev, _, _ = mask_grid(elev, 0.3, seed=12)
    g = RegularGrid.from_nan_array(elev, Extent(0, W - 1.0, 0, 15.0))
    mesh = make_mesh()
    for method, single in [
        ("idw", lambda: fill_idw(g, k=8, max_radius=10)),
        ("kriging", lambda: fill_kriging(g, max_radius=10)),
    ]:
        got = np.asarray(sharded_fill(mesh, g, method, max_radius=10))
        want = np.asarray(single())
        assert (np.isnan(got) == np.isnan(want)).all()
        both = ~np.isnan(got)
        np.testing.assert_allclose(got[both], want[both], rtol=2e-5, atol=2e-3)


@pytest.mark.parametrize("method,kwargs", [
    ("idw", dict(k=8)),
    ("window_mean", dict(k=4)),
    ("kriging", dict()),
])
def test_sharded_fill2d_matches_single_device(masked_grid, method, kwargs):
    mesh = make_mesh2d((4, 2))
    got = np.asarray(sharded_fill2d(mesh, masked_grid, method, max_radius=10, **kwargs))
    single = {
        "idw": lambda g: fill_idw(g, k=8, max_radius=10),
        "window_mean": lambda g: fill_window_mean(g, k=4, max_radius=10),
        "kriging": lambda g: fill_kriging(g, max_radius=10),
    }[method](masked_grid)
    single = np.asarray(single)
    assert got.shape == single.shape
    assert (np.isnan(got) == np.isnan(single)).all()
    both = ~np.isnan(got)
    np.testing.assert_allclose(got[both], single[both], rtol=2e-5, atol=2e-3)


def test_sharded_fill2d_small_blocks_and_pad():
    """(2,4) mesh over a 23x30 grid: 12x8-ish blocks narrower than the halo
    in both axes, plus row AND column padding."""
    elev = shelf_seamount(23, 30)
    elev, _, _ = mask_grid(elev, 0.2, seed=13)
    g = RegularGrid.from_nan_array(elev, Extent(0.0, 29.0, 0.0, 22.0))
    mesh = make_mesh2d((2, 4))
    got = np.asarray(sharded_fill2d(mesh, g, "kriging", max_radius=10))
    want = np.asarray(fill_kriging(g, max_radius=10))
    assert got.shape == want.shape
    assert (np.isnan(got) == np.isnan(want)).all()
    both = ~np.isnan(got)
    np.testing.assert_allclose(got[both], want[both], rtol=2e-5, atol=2e-3)


@pytest.mark.parametrize("method", [
    pytest.param("idw", marks=pytest.mark.slow),
    pytest.param("window_mean", marks=pytest.mark.slow),
    "kriging",  # the default serving method gates the fused-in-shard_map path fast
])
def test_sharded_fill_fused_backend_matches_xla(masked_grid, method):
    """backend='fused' (per-block Pallas kernels inside shard_map) must agree
    with the XLA backend (interpret mode on the virtual mesh)."""
    from jax.experimental.pallas import tpu as pltpu

    mesh = make_mesh()
    want = np.asarray(sharded_fill(mesh, masked_grid, method, max_radius=5,
                                   backend="xla"))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(sharded_fill(mesh, masked_grid, method, max_radius=5,
                                      backend="fused"))
    assert (np.isnan(got) == np.isnan(want)).all()
    m = ~np.isnan(want)
    np.testing.assert_allclose(got[m], want[m], rtol=1e-4, atol=0.05)


@pytest.mark.slow  # fused-in-shard_map parity already covered by test_sharded_fill_fused_backend
def test_sharded_fit_fill_fused_backend_matches_xla(masked_grid):
    from jax.experimental.pallas import tpu as pltpu

    mesh = make_mesh()
    want, vp_x = sharded_fit_fill(mesh, masked_grid, max_radius=5, backend="xla")
    with pltpu.force_tpu_interpret_mode():
        got, vp_f = sharded_fit_fill(mesh, masked_grid, max_radius=5,
                                     backend="fused")
    np.testing.assert_allclose(np.asarray(vp_f), np.asarray(vp_x), rtol=1e-6)
    got, want = np.asarray(got), np.asarray(want)
    assert (np.isnan(got) == np.isnan(want)).all()
    m = ~np.isnan(want)
    np.testing.assert_allclose(got[m], want[m], rtol=1e-4, atol=0.05)


def test_sharded_atlas_bit_equal():
    # K pages filled one-per-device over the 8-dev mesh == single-device
    # build_atlas, bit for bit (interior AND grid-edge pages), and the
    # sharded atlas serves through the same resampler
    import numpy as np

    from auvtpu.config import Extent
    from auvtpu.grid import RegularGrid
    from auvtpu.masking import mask_grid
    from auvtpu.ops.band import AtlasResampler, build_atlas, plan_segments
    from auvtpu.parallel import build_atlas_sharded, make_mesh
    from auvtpu.synthetic import shelf_seamount

    H, W = 192, 384
    ext = Extent(0.0, float(W - 1), 0.0, float(H - 1))
    reduced, _, _ = mask_grid(shelf_seamount(H, W), 0.12, seed=4)
    grid = RegularGrid.from_nan_array(reduced, ext)
    # diagonal mission touching both grid corners -> edge pages included
    n = 4096
    t = np.linspace(0, 1, n)
    rng = np.random.default_rng(0)
    x = np.clip(1.0 + t * (W - 3) + rng.normal(0, 0.05, n), 0.5, W - 1.5)
    y = np.clip(1.0 + t * (H - 3) + 2 * np.sin(t * 20 * np.pi), 0.5, H - 1.5)
    segs = plan_segments(x, y, chunk=256, max_bands=6, grid_shape=grid.shape)
    assert len(segs) > 1

    ref = build_atlas(grid, segs, fill_backend="xla")
    mesh = make_mesh(8, axis="pages")
    got = build_atlas_sharded(grid, segs, mesh, fill_backend="xla")
    assert got.masked == ref.masked and got.placed == ref.placed
    np.testing.assert_array_equal(np.asarray(got.planes), np.asarray(ref.planes))
    np.testing.assert_array_equal(np.asarray(got.vmasks), np.asarray(ref.vmasks))

    lon = ext.min_lon + x * grid.lon_step
    lat = ext.min_lat + y * grid.lat_step
    rs = AtlasResampler(grid, got, chunk=256)
    rs_ref = AtlasResampler(grid, ref, chunk=256)
    z, ok = rs.resample(lon, lat)
    zr, okr = rs_ref.resample(lon, lat)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(okr))
    np.testing.assert_array_equal(np.asarray(z), np.asarray(zr))


# ---------------------------------------------------------------------------
# mesh-size stress sweep (VERDICT r4 #7): results must be invariant to HOW
# MANY ways the grid is sharded, including blocks narrower than the radius-10
# window in BOTH axes, uneven remainders, and n=16 (subprocess: the test
# session itself is pinned to 8 virtual devices by conftest.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [2, 4, 8])
def test_sharded_fill_mesh_size_sweep(n):
    # H=93: remainder rows against every mesh size (93 % 2/4/8 != 0)
    elev = shelf_seamount(93, 47)
    elev, _, _ = mask_grid(elev, 0.12, seed=9)
    g = RegularGrid.from_nan_array(elev, Extent(0.0, 46.0, 0.0, 92.0))
    single = np.asarray(fill_kriging(g, max_radius=10))
    got = np.asarray(sharded_fill(make_mesh(n), g, "kriging", max_radius=10))
    assert (np.isnan(got) == np.isnan(single)).all()
    m = ~np.isnan(single)
    np.testing.assert_allclose(got[m], single[m], rtol=2e-5, atol=2e-3)


@pytest.mark.parametrize("shape", [(2, 2), (4, 2), (2, 4)])
def test_sharded_fill2d_sub_radius_both_axes(shape):
    """15x13 grid: every mesh shape yields blocks narrower than the radius-10
    window in BOTH axes (e.g. (4,2) -> 4x7 blocks), with remainder padding in
    both axes — the all-multi-hop-halo regime a real pod would hit on small
    per-device tiles."""
    elev = shelf_seamount(15, 13)
    elev, _, _ = mask_grid(elev, 0.15, seed=10)
    g = RegularGrid.from_nan_array(elev, Extent(0.0, 12.0, 0.0, 14.0))
    single = np.asarray(fill_kriging(g, max_radius=10))
    got = np.asarray(sharded_fill2d(make_mesh2d(shape), g, "kriging", max_radius=10))
    assert (np.isnan(got) == np.isnan(single)).all()
    m = ~np.isnan(single)
    np.testing.assert_allclose(got[m], single[m], rtol=2e-5, atol=2e-3)


_MESH16_CHILD = r"""
import jax

# this image pre-imports jax via a .pth hook, so the JAX_PLATFORMS env var
# is too late — select the platform through the config (backends are lazy)
jax.config.update("jax_platforms", "cpu")

import numpy as np

assert jax.device_count() == 16, jax.device_count()

from auvtpu.config import Extent
from auvtpu.grid import RegularGrid
from auvtpu.masking import mask_grid
from auvtpu.ops import fill_kriging
from auvtpu.ops.band import AtlasResampler, build_atlas, plan_segments
from auvtpu.parallel import (
    ShardedStreamingInterpolator2D, build_atlas_sharded, make_mesh,
    make_mesh2d, sharded_fill, sharded_fill2d,
)
from auvtpu.streaming import StreamingInterpolator
from auvtpu.synthetic import shelf_seamount

# 1-D fill, 16 row bands (83 % 16 != 0 -> remainder pad; bands of ~5 rows
# are HALF the radius-10 window -> multi-hop halos on every band)
elev = shelf_seamount(83, 41)
elev, _, _ = mask_grid(elev, 0.12, seed=12)
g = RegularGrid.from_nan_array(elev, Extent(0.0, 40.0, 0.0, 82.0))
single = np.asarray(fill_kriging(g, max_radius=10))
got = np.asarray(sharded_fill(make_mesh(16), g, "kriging", max_radius=10))
assert (np.isnan(got) == np.isnan(single)).all()
np.testing.assert_allclose(got[~np.isnan(single)], single[~np.isnan(single)],
                           rtol=2e-5, atol=2e-3)
print("1d n=16 ok")

# 2-D fill, (4,4) blocks sub-radius in both axes + remainder in both axes
elev = shelf_seamount(27, 23)
elev, _, _ = mask_grid(elev, 0.15, seed=13)
g2 = RegularGrid.from_nan_array(elev, Extent(0.0, 22.0, 0.0, 26.0))
single = np.asarray(fill_kriging(g2, max_radius=10))
got = np.asarray(sharded_fill2d(make_mesh2d((4, 4)), g2, "kriging", max_radius=10))
assert (np.isnan(got) == np.isnan(single)).all()
np.testing.assert_allclose(got[~np.isnan(single)], single[~np.isnan(single)],
                           rtol=2e-5, atol=2e-3)
print("2d (4,4) ok")

# 2-D streaming mosaic on (4,4): bit-equal planes + window fills
H, W = 37, 53
ext = Extent(0.0, float(W - 1), 0.0, float(H - 1))
kw = dict(swath_cap=64, stage_slots=2, window=(16, 16), method="kriging",
          k=4, max_radius=5)
single_s = StreamingInterpolator((H, W), ext, **kw)
sharded_s = ShardedStreamingInterpolator2D((H, W), ext, make_mesh2d((4, 4)), **kw)
rng = np.random.RandomState(11)
for _ in range(3):
    rows = rng.randint(0, H, 120)
    cols = rng.randint(0, W, 120)
    vals = rng.normal(-3000.0, 80.0, 120).astype(np.float32)
    for si in (single_s, sharded_s):
        si.ingest(rows, cols, vals)
assert np.array_equal(single_s.snapshot(), sharded_s.snapshot(), equal_nan=True)
for center in [(H // 2, W // 2), (0, 0), (H - 1, W - 1)]:
    ta, oa = single_s.window_fill(*center)
    tb, ob = sharded_s.window_fill(*center)
    assert oa == ob
    assert np.array_equal(np.asarray(ta), np.asarray(tb), equal_nan=True)
print("streaming 2d (4,4) bit-equal ok")

# sharded atlas over a 16-device pages mesh (6 pages -> padded to 16)
H, W = 96, 192
ext = Extent(0.0, float(W - 1), 0.0, float(H - 1))
reduced, _, _ = mask_grid(shelf_seamount(H, W), 0.12, seed=4)
ga = RegularGrid.from_nan_array(reduced, ext)
n = 2048
t = np.linspace(0, 1, n)
rng = np.random.default_rng(0)
x = np.clip(1.0 + t * (W - 3) + rng.normal(0, 0.05, n), 0.5, W - 1.5)
y = np.clip(1.0 + t * (H - 3) + 2 * np.sin(t * 16 * np.pi), 0.5, H - 1.5)
segs = plan_segments(x, y, chunk=256, max_bands=6, grid_shape=ga.shape)
ref = build_atlas(ga, segs, fill_backend="xla")
got = build_atlas_sharded(ga, segs, make_mesh(16, axis="pages"), fill_backend="xla")
assert got.masked == ref.masked and got.placed == ref.placed
np.testing.assert_array_equal(np.asarray(got.planes), np.asarray(ref.planes))
np.testing.assert_array_equal(np.asarray(got.vmasks), np.asarray(ref.vmasks))
print("atlas n=16 bit-equal ok")
print("MESH16 PASS")
"""


@pytest.mark.slow  # fresh interpreter: needs 16 virtual devices, conftest pins 8
def test_mesh16_stress(tmp_path):
    """n=16 sweep point (VERDICT r4 #7): 1-D fill with 16 sub-radius row
    bands, (4,4) 2-D fill, bit-equal (4,4) 2-D streaming, and the sharded
    atlas on a 16-way pages mesh — all vs single-device, in a subprocess
    whose XLA host platform exposes 16 virtual devices."""
    import os
    import subprocess
    import sys

    script = tmp_path / "mesh16_child.py"
    script.write_text(_MESH16_CHILD)
    env = dict(os.environ)
    # the child must import auvtpu even when the editable install is absent
    # (fresh session containers lose it; test_multihost does the same)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, str(script)], env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    assert "MESH16 PASS" in out.stdout
