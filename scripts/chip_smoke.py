"""Real-chip parity smoke: every device op vs its float64 oracle, ON the TPU.

The CPU test suite (tests/, JAX_PLATFORMS=cpu) proves semantics; this script
proves the CHIP agrees — it exists because a silent bf16 matmul default
scrambled scattered kNN neighbors on hardware for a full round while every
CPU test stayed green (docs/RESULTS.md round-2 bf16 note; NEXTSTEPS #9).

Run it after any compute-path change, serialized with other chip work:

    python scripts/chip_smoke.py            # ~1 min warm, ~5 min cold cache

Prints one PASS/FAIL line per surface and exits nonzero on any FAIL.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAILED = []


def check(name, ok, detail=""):
    status = "PASS" if ok else "FAIL"
    print(f"[{status}] {name} {detail}", flush=True)
    if not ok:
        FAILED.append(name)


def main():
    import jax

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)
    if dev.platform == "cpu":
        print("WARNING: no accelerator — this smoke is meant for the chip", flush=True)

    import jax.numpy as jnp

    from auvtpu.config import Extent
    from auvtpu.golden import GoldenGrid
    from auvtpu.golden.v2 import GoldenV2
    from auvtpu.grid import RegularGrid
    from auvtpu.masking import mask_grid
    from auvtpu.synthetic import shelf_seamount

    H, W = 256, 320
    ext = Extent(-74.0, -70.0, 35.0, 38.0)
    elev_full = shelf_seamount(H, W)
    reduced, rc, held = mask_grid(elev_full, 0.15, seed=11)
    grid = RegularGrid.from_nan_array(reduced, ext)
    gv2 = GoldenV2(reduced, ext.min_lon, ext.max_lon, ext.min_lat, ext.max_lat)
    gref = GoldenGrid(reduced, ext.min_lon, ext.max_lon, ext.min_lat, ext.max_lat)

    rng = np.random.default_rng(0)
    n = 20_000
    lons = rng.uniform(ext.min_lon, ext.max_lon, n)
    lats = rng.uniform(ext.min_lat, ext.max_lat, n)
    lo32 = jnp.asarray(lons, jnp.float32)
    la32 = jnp.asarray(lats, jnp.float32)

    def close(got, want, atol, frac=1.0, hard_max=None):
        """frac<1 allows that fraction of points to exceed atol (f32 near-tie
        neighbor flips vs the f64 oracle are expected — test_ops.py uses the
        same criterion); hard_max still bounds every point so catastrophic
        scrambling (the bf16 incident: errors of tens of meters at many
        points) can never hide in the tolerated tail."""
        got = np.asarray(got, np.float64)
        nan_ok = (np.isnan(got) == np.isnan(want)).all()
        m = ~np.isnan(want) & ~np.isnan(got)
        err = np.abs(got[m] - want[m])
        mx = float(err.max()) if m.any() else 0.0
        within = float((err <= atol).mean()) if m.any() else 1.0
        ok = nan_ok and within >= frac and mx < (hard_max if hard_max else atol)
        return ok, f"maxabs={mx:.2e} within_tol={within:.4f}"

    span = float(np.nanmax(reduced) - np.nanmin(reduced))
    tol = 5e-5 * max(1.0, float(np.nanmax(np.abs(reduced))))

    # ---- scattered packed ops vs v2 oracle -------------------------------
    from auvtpu.ops.packs import (
        StencilPack, packed_bilinear, packed_bicubic, packed_idw, packed_kriging,
    )

    sp = StencilPack(grid, window_radius=2)
    got = packed_bilinear(sp.bilinear, grid, lo32[:2000], la32[:2000])
    check("packed_bilinear", *close(got, gref.bilinear(lons[:2000], lats[:2000]), tol))

    want_kr = gv2.kriging(lons[:2000], lats[:2000])
    got_kr = packed_kriging(sp.window, grid, lo32[:2000], la32[:2000])
    check("packed_kriging", *close(got_kr, want_kr, 0.15, frac=0.99, hard_max=100.0))

    want_id = gv2.idw(lons[:2000], lats[:2000], k=8)
    got_id = packed_idw(sp.window, grid, lo32[:2000], la32[:2000])
    check("packed_idw", *close(got_id, want_id, 0.15, frac=0.99, hard_max=100.0))

    # ---- chip vs CPU backend, SAME op, SAME dtype ------------------------
    # The sharp bf16-incident detector: identical f32 programs on both
    # backends must agree to float-rounding noise; any silent precision
    # downgrade or selection scramble on the chip shows up here even though
    # the f64-oracle comparison above tolerates a near-tie tail.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        grid_c = RegularGrid.from_nan_array(reduced, ext)
        sp_c = StencilPack(grid_c, window_radius=2)
        lo_c = jnp.asarray(lons[:2000], jnp.float32)
        la_c = jnp.asarray(lats[:2000], jnp.float32)
        cpu_kr = np.asarray(packed_kriging(sp_c.window, grid_c, lo_c, la_c))
        cpu_id = np.asarray(packed_idw(sp_c.window, grid_c, lo_c, la_c))
    check("packed_kriging chip==cpu(f32)",
          *close(got_kr, cpu_kr, 2e-3, frac=0.999, hard_max=1.0))
    check("packed_idw chip==cpu(f32)",
          *close(got_id, cpu_id, 2e-3, frac=0.999, hard_max=1.0))

    # ---- fused Pallas scattered kernels vs the packed XLA path -----------
    from auvtpu.pallas import pallas_packed_idw, pallas_packed_kriging

    a = np.asarray(packed_kriging(sp.window, grid, lo32, la32))
    b = np.asarray(pallas_packed_kriging(sp.window, grid, lo32, la32))
    check("pallas_packed_kriging vs packs", *close(b, a, 1e-3))
    a = np.asarray(packed_idw(sp.window, grid, lo32, la32))
    b = np.asarray(pallas_packed_idw(sp.window, grid, lo32, la32))
    check("pallas_packed_idw vs packs", *close(b, a, 1e-3))

    # ---- dense fills: fused Pallas kernel vs the XLA plane pipeline ------
    from auvtpu.ops import fill_kriging
    from auvtpu.pallas import pallas_fill_kriging

    a = np.asarray(fill_kriging(grid, backend="xla"))
    b = np.asarray(pallas_fill_kriging(grid))
    check("pallas_fill_kriging vs xla", *close(b, a, 0.05))

    # the other peeled dense kernels (static chunk-0 lax.slice windows —
    # interpret mode cannot prove Mosaic legality, only the chip can)
    from auvtpu.ops import fill_idw, fill_window_mean
    from auvtpu.ops.dense import window_topk_planes
    from auvtpu.pallas import pallas_fill_idw, pallas_fill_mean, pallas_topk_full

    a = np.asarray(fill_idw(grid))
    b = np.asarray(pallas_fill_idw(grid))
    check("pallas_fill_idw vs xla", *close(b, a, 1e-5))
    a = np.asarray(fill_window_mean(grid))
    b = np.asarray(pallas_fill_mean(grid))
    check("pallas_fill_mean vs xla", *close(b, a, 1e-5))
    cnt_x, _, _, _ = window_topk_planes(grid)
    cnt_p, _, _, _ = pallas_topk_full(grid)
    eq = bool((np.asarray(cnt_p) == np.asarray(cnt_x)).all())
    check("pallas_topk_full cnt vs xla", eq)

    # ---- exact mode: published-style digit parity from the chip ----------
    from auvtpu.ops.exact import exact_kriging_at_cells

    jax.config.update("jax_enable_x64", True)
    try:
        grid64 = RegularGrid.from_nan_array(reduced, ext, dtype=np.float64)
        got = exact_kriging_at_cells(grid64, rc[:3000, 0], rc[:3000, 1])
        qlon = ext.min_lon + rc[:3000, 1] * gref.lon_step
        qlat = ext.min_lat + rc[:3000, 0] * gref.lat_step
        want = gref.kriging(qlon, qlat)
        check("exact_kriging_at_cells vs golden", *close(got, want, 1e-8 * span))

        from auvtpu.ops.exact import exact_kriging_scattered

        got = exact_kriging_scattered(grid64, lons[:2000], lats[:2000])
        want = gref.kriging(lons[:2000], lats[:2000])
        check("exact_kriging_scattered vs golden", *close(got, want, 1e-8 * span))
    finally:
        jax.config.update("jax_enable_x64", False)

    # ---- trajectory-band resample (the r4 bf16-einsum regression surface) -
    # the row-weight matmul + column one-hot reduce must run precision=HIGHEST
    # on chip: with the TPU default (single-pass bf16) the resample was off by
    # up to 24 m (results/band_probe_r4.txt)
    from auvtpu.ops.band import BandResampler, fill_band

    band = fill_band(grid, 64, 64, 0, W, method="kriging")
    rs = BandResampler(grid, band, chunk=256, win_rows=32, win_cols=128)
    tn = 4000
    t = np.linspace(0.0, 1.0, tn)
    bx = np.clip(1.0 + t * (W - 3) + rng.normal(0, 0.05, tn), 0.5, W - 1.5)
    by = np.clip(64 + 32 * (0.5 + 0.4 * np.sin(t * 30 * np.pi)) + rng.normal(0, 0.05, tn), 0.5, H - 1.5)
    blon = ext.min_lon + bx * gref.lon_step
    blat = ext.min_lat + by * gref.lat_step
    bz, bok = rs.resample(blon, blat)
    bz, bok = np.asarray(bz), np.asarray(bok)
    p64 = np.asarray(band.plane, np.float64)
    x = bx - band.col0
    y = by - band.row0
    x0, y0 = np.floor(x).astype(int), np.floor(y).astype(int)
    wx, wy = x - x0, y - y0
    want_b = ((1 - wy) * ((1 - wx) * p64[y0, x0] + wx * p64[y0, x0 + 1])
              + wy * ((1 - wx) * p64[y0 + 1, x0] + wx * p64[y0 + 1, x0 + 1]))
    ok_frac = float(bok.mean())
    e = np.abs(bz[bok] - want_b[bok])
    band_ok = ok_frac > 0.9 and (e.max() < 5e-3 if bok.any() else False)
    check("band_resample f32 on-chip", band_ok,
          f"resolved={ok_frac:.3f} maxabs={e.max():.2e}")

    # ---- scattered prototype kNN (the bf16 regression surface) -----------
    from auvtpu.scattered import knn_search

    pts = rng.uniform(0, 1, (4000, 2)).astype(np.float32) + np.array(
        [-73.0, 35.0], np.float32
    )
    tgt = pts[:500] + 0.001
    d2, idx = knn_search(jnp.asarray(tgt), jnp.asarray(pts), k=8)
    full = ((tgt.astype(np.float64)[:, None] - pts.astype(np.float64)[None]) ** 2).sum(-1)
    want = np.sort(full, axis=1)[:, :8]
    err = float(np.abs(np.sort(np.asarray(d2), axis=1) - want).max())
    check("knn_search f32 on-chip", err < 1e-5, f"maxabs={err:.2e}")

    print(f"\n{len(FAILED)} failures" + (f": {FAILED}" if FAILED else ""), flush=True)
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
