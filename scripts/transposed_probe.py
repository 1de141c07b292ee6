"""Chip probe: general transposed-select variants vs their XLA packed
baselines — kriging + IDW over the full radius-2 window pack (works on
masked grids / edges), alongside the valid-grid fast paths.

Serialize with other chip work (CLAUDE.md)."""

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
    from auvtpu.ops.packs import (
        StencilPack, build_valid16_pack, packed_idw, packed_kriging,
        packed_kriging_valid,
    )
    from auvtpu.pallas import (
        pallas_kriging_valid, pallas_packed_idw_t, pallas_packed_kriging_t,
    )
    from auvtpu.synthetic import shelf_seamount
    from auvtpu.utils.timing import steady_state_ms

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)

    H, W = 2000, 1600
    rng = np.random.default_rng(0)
    N = 5_000_000
    lons = jax.device_put(jnp.asarray(rng.uniform(0, W - 1, N).astype(np.float32)))
    lats = jax.device_put(jnp.asarray(rng.uniform(0, H - 1, N).astype(np.float32)))

    for masked in (False, True):
        elev = shelf_seamount(H, W).astype(np.float32)
        if masked:
            m = np.random.default_rng(1).random((H, W)) < 0.10
            elev = np.where(m, np.nan, elev)
            grid = RegularGrid.from_nan_array(elev, Extent(0.0, W - 1.0, 0.0, H - 1.0))
        else:
            grid = RegularGrid.dense(elev, Extent(0.0, W - 1.0, 0.0, H - 1.0))
        sp = StencilPack(grid, window_radius=2)
        tag = "masked" if masked else "valid "

        ls, lt = lons[:50_000], lats[:50_000]
        ref_k = np.asarray(packed_kriging(sp.window, grid, ls, lt))
        got_k = np.asarray(pallas_packed_kriging_t(sp.window, grid, ls, lt))
        ref_i = np.asarray(packed_idw(sp.window, grid, ls, lt, k=8))
        got_i = np.asarray(pallas_packed_idw_t(sp.window, grid, ls, lt, k=8))
        for nm, a, b in (("krig_t", ref_k, got_k), ("idw_t", ref_i, got_i)):
            assert (np.isnan(a) == np.isnan(b)).all(), f"{nm} NaN mismatch"
            both = ~np.isnan(a)
            err = float(np.abs(a[both] - b[both]).max())
            print(f"[{tag}] parity {nm}: maxabs={err:.2e}", flush=True)
            assert err < 1e-2, "PARITY FAILURE — do not trust timings"

        def bench(name, fn, iters=10):
            try:
                ms = steady_state_ms(fn, iters=iters, warmup=2)
            except Exception as e:
                print(f"[{tag}] {name:30s} FAILED {type(e).__name__}: {e}", flush=True)
                return
            print(f"[{tag}] {name:30s} {ms:8.2f} ms  {N/ms/1e3:8.1f} M pts/s", flush=True)

        bench("packed_kriging (xla)", lambda: packed_kriging(sp.window, grid, lons, lats))
        bench("pallas_packed_kriging_t", lambda: pallas_packed_kriging_t(sp.window, grid, lons, lats))
        bench("packed_idw k=8 (xla)", lambda: packed_idw(sp.window, grid, lons, lats, k=8))
        bench("pallas_packed_idw_t k=8", lambda: pallas_packed_idw_t(sp.window, grid, lons, lats, k=8))
        if not masked:
            p16 = build_valid16_pack(grid)
            bench("packed_kriging_valid16", lambda: packed_kriging_valid(p16, grid, lons, lats))
            bench("pallas_kriging_valid", lambda: pallas_kriging_valid(p16, grid, lons, lats))


if __name__ == "__main__":
    main()
