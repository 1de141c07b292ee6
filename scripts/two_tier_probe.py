"""Chip probe: TwoTierInterpolator backends — XLA (separate resolved-mask
pass) vs transposed (fused in-kernel resolution, ONE fetch+select total).

5M queries against the 10%-masked Kerguelen-size grid, full radius-10
escalation semantics (the docs/RESULTS.md 'scattered queries on masked
grids' workload).  Serialize with other chip work (CLAUDE.md)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import auvtpu  # noqa: F401  (compile cache)
    import jax
    import jax.numpy as jnp

    from auvtpu.config import KERGUELEN_EXTENT
    from auvtpu.grid import RegularGrid
    from auvtpu.masking import mask_grid
    from auvtpu.ops import TwoTierInterpolator
    from auvtpu.synthetic import kerguelen_standin

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)

    elev = kerguelen_standin()
    reduced, rc, truth = mask_grid(elev, 0.10)
    H, W = reduced.shape
    grid = RegularGrid.from_nan_array(np.asarray(reduced, np.float32), KERGUELEN_EXTENT)
    rng = np.random.default_rng(0)
    N = 5_000_000
    e = KERGUELEN_EXTENT
    lons = jax.device_put(jnp.asarray(
        rng.uniform(e.min_lon, e.max_lon, N).astype(np.float32)))
    lats = jax.device_put(jnp.asarray(
        rng.uniform(e.min_lat, e.max_lat, N).astype(np.float32)))

    tts = {
        "xla": TwoTierInterpolator(grid, backend="xla"),
        "transposed": TwoTierInterpolator(grid, backend="transposed"),
    }

    # parity first (50k)
    ls, lt = lons[:50_000], lats[:50_000]
    outs = {}
    for name, tt in tts.items():
        outs[name] = {"krig": np.asarray(tt.kriging(ls, lt)),
                      "idw": np.asarray(tt.idw(ls, lt))}
    for m in ("krig", "idw"):
        a, b = outs["xla"][m], outs["transposed"][m]
        assert (np.isnan(a) == np.isnan(b)).all(), f"{m} NaN mismatch"
        ok = ~np.isnan(a)
        err = float(np.abs(a[ok] - b[ok]).max())
        print(f"parity {m}: maxabs={err:.2e}", flush=True)
        assert err < 1e-2, "PARITY FAILURE — do not trust timings"

    def bench(name, fn, iters=8):
        # two-tier includes a host sync (bad_count) per call; time wall
        fn()  # warm
        fn()
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        np.asarray(r[:8])  # final drain
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:32s} {ms:8.2f} ms  {N/ms/1e3:8.1f} M pts/s", flush=True)

    for name, tt in tts.items():
        bench(f"two_tier kriging [{name}]", lambda tt=tt: tt.kriging(lons, lats))
    for name, tt in tts.items():
        bench(f"two_tier idw k=8 [{name}]", lambda tt=tt: tt.idw(lons, lats))


if __name__ == "__main__":
    main()
