"""Chip perf sweep: fused-scattered kernels + dense-kernel tile sweep.

Measures (steady-state, scalar-sync) on the real chip:
1. packed vs pallas-fused scattered kriging/IDW at 5M queries, tile_n sweep
   (NEXTSTEPS perf lead #1 — target: approach the ~170 M rows/s fetch floor);
2. pallas_fill_kriging dense tile sweep (perf lead #2);
3. packed bilinear/bicubic reference points.

Serialize with other chip work (CLAUDE.md).  Results go to stderr as a
table; append the numbers to docs/RESULTS.md by hand once stable.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import auvtpu  # noqa: F401  (compile cache)
    import jax
    import jax.numpy as jnp

    from auvtpu.config import Extent
    from auvtpu.grid import RegularGrid

    def grid_extent(w, h):
        return Extent(0.0, float(w - 1), 0.0, float(h - 1))
    from auvtpu.masking import mask_grid
    from auvtpu.ops.packs import (
        StencilPack, packed_bicubic, packed_bilinear, packed_idw, packed_kriging,
    )
    from auvtpu.pallas import (
        pallas_fill_kriging, pallas_packed_idw, pallas_packed_kriging,
    )
    from auvtpu.synthetic import shelf_seamount
    from auvtpu.utils.timing import steady_state_ms

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)

    H, W = 2000, 1600
    elev = shelf_seamount(H, W)
    elev, _, _ = mask_grid(elev, 0.2, seed=3)
    grid = RegularGrid.from_nan_array(elev, Extent(0.0, float(W - 1), 0.0, float(H - 1)))
    sp = StencilPack(grid, window_radius=2)
    rng = np.random.default_rng(0)
    N = 5_000_000
    lons = jax.device_put(jnp.asarray(rng.uniform(0, W - 1, N).astype(np.float32)))
    lats = jax.device_put(jnp.asarray(rng.uniform(0, H - 1, N).astype(np.float32)))

    # parity spot-check before timing anything
    ls, lt = lons[:50_000], lats[:50_000]
    wk = np.asarray(packed_kriging(sp.window, grid, ls, lt))
    gk = np.asarray(pallas_packed_kriging(sp.window, grid, ls, lt))
    both = ~np.isnan(wk) & ~np.isnan(gk)
    err = float(np.abs(gk[both] - wk[both]).max())
    nan_ok = (np.isnan(wk) == np.isnan(gk)).all()
    print(f"parity pallas_packed_kriging: nan_match={nan_ok} maxabs={err:.2e}", flush=True)
    assert nan_ok and err < 1e-2, "PARITY FAILURE — do not trust the timings"

    rows = []

    def bench(name, fn, n=N, iters=10):
        try:
            ms = steady_state_ms(fn, iters=iters, warmup=2)
        except Exception as e:  # one infeasible config must not kill the sweep
            print(f"{name:28s} FAILED {type(e).__name__}", flush=True)
            return
        rows.append((name, ms, n / ms / 1e3))
        print(f"{name:28s} {ms:8.2f} ms   {n/ms/1e3:8.1f} M pts/s", flush=True)

    bench("packed_kriging", lambda: packed_kriging(sp.window, grid, lons, lats))
    # fully-valid fast path (Grid A regime): top-4 fits a 16-lane pack
    from auvtpu.ops.packs import build_valid16_pack, packed_kriging_valid

    grid_valid = RegularGrid.dense(shelf_seamount(H, W), grid_extent(W, H))
    sp_v = StencilPack(grid_valid, window_radius=2)
    p16 = build_valid16_pack(grid_valid)
    wv = np.asarray(packed_kriging(sp_v.window, grid_valid, ls, lt))
    gv = np.asarray(packed_kriging_valid(p16, grid_valid, ls, lt))
    err_v = float(np.abs(gv - wv).max())
    print(f"parity packed_kriging_valid: maxabs={err_v:.2e}", flush=True)
    assert err_v < 1e-2
    bench("packed_kriging_valid16", lambda: packed_kriging_valid(p16, grid_valid, lons, lats))
    # tn >= 2048 exceeds the 16M scoped-vmem stack (measured r3: 18.23M ask)
    for tn in (512, 1024):
        bench(f"pallas_kriging tn={tn}",
              lambda tn=tn: pallas_packed_kriging(sp.window, grid, lons, lats, tile_n=tn))
    bench("packed_idw", lambda: packed_idw(sp.window, grid, lons, lats))
    for tn in (512, 1024):
        bench(f"pallas_idw tn={tn}",
              lambda tn=tn: pallas_packed_idw(sp.window, grid, lons, lats, tile_n=tn))
    bench("packed_bilinear",
          lambda: packed_bilinear(sp.bilinear, grid, lons, lats, assume_valid=False))
    bench("packed_bicubic",
          lambda: packed_bicubic(sp.bicubic, grid, lons, lats, assume_valid=False))

    # dense fused kernel tile sweep on a Kerguelen-sized masked fill
    n_cells = H * W
    for tile in ((32, 128), (16, 128), (64, 128), (32, 256), (64, 256)):
        try:
            bench(f"fill_kriging tile={tile}",
                  lambda tile=tile: pallas_fill_kriging(grid, tile=tile), n=n_cells)
        except Exception as e:  # Mosaic tiling limits vary by shape
            print(f"fill_kriging tile={tile}: FAILED {type(e).__name__}", flush=True)

    print("\nname, ms, Mpts/s", flush=True)
    for r in rows:
        print(f"{r[0]}, {r[1]:.2f}, {r[2]:.1f}", flush=True)


if __name__ == "__main__":
    main()
