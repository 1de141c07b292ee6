"""Chip probe: spatially COHERENT query batches (AUV-trajectory-like) vs
random batches on the transposed kriging/IDW paths.

The gather unit is row-count-bound on random batches (26.5 ms floor at
5M).  AUV missions query along survey lines: consecutive queries hit the
same or adjacent cells, so the fetch's HBM access pattern is (nearly)
sequential.  This measures how much of the random-gather cost coherence
recovers, with no code change — the kernels are layout-agnostic.

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
    from auvtpu.ops.packs import StencilPack, build_valid16_pack
    from auvtpu.pallas import (
        pallas_kriging_valid, pallas_packed_idw_t, pallas_packed_kriging_t,
    )
    from auvtpu.synthetic import shelf_seamount
    from auvtpu.utils.timing import steady_state_ms

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)

    H, W = 2000, 1600
    grid = RegularGrid.dense(shelf_seamount(H, W), Extent(0.0, W - 1.0, 0.0, H - 1.0))
    sp = StencilPack(grid, window_radius=2)
    p16 = build_valid16_pack(grid)
    rng = np.random.default_rng(0)
    N = 5_000_000

    # random batch
    rnd_lo = rng.uniform(0, W - 1, N).astype(np.float32)
    rnd_la = rng.uniform(0, H - 1, N).astype(np.float32)
    # trajectory batch: a boustrophedon survey at ~1/3-cell step (strongly
    # coherent: consecutive queries share or neighbor a cell row)
    t = np.arange(N, dtype=np.float64)
    line_len = 4500.0  # queries per survey line (1500 cells at 1/3 step)
    row_idx = np.floor(t / line_len)
    along = (t % line_len) / 3.0
    fwd = (row_idx % 2) == 0
    coh_lo = np.where(fwd, along, (W - 1) - along).astype(np.float32)
    coh_la = ((row_idx * 1.25 + 0.3 * np.sin(t / 37.0)) % (H - 1)).astype(np.float32)
    # sorted batch: the random batch ordered by cell id (what ops/tiled.py's
    # partition produces)
    ci = np.clip(np.floor(rnd_lo + 0.5).astype(np.int64), 0, W - 1)
    cj = np.clip(np.floor(rnd_la + 0.5).astype(np.int64), 0, H - 1)
    order = np.argsort(cj * W + ci, kind="stable")
    srt_lo, srt_la = rnd_lo[order], rnd_la[order]

    batches = {
        "random": (rnd_lo, rnd_la),
        "sorted": (srt_lo, srt_la),
        "trajectory": (coh_lo, coh_la),
    }

    for name, (lo, la) in batches.items():
        lo_d = jax.device_put(jnp.asarray(lo))
        la_d = jax.device_put(jnp.asarray(la))

        def bench(tag, fn):
            try:
                ms = steady_state_ms(fn, iters=10, warmup=2)
            except Exception as e:
                print(f"[{name:10s}] {tag:28s} FAILED {type(e).__name__}: {e}", flush=True)
                return
            print(f"[{name:10s}] {tag:28s} {ms:8.2f} ms  {N/ms/1e3:8.1f} M pts/s", flush=True)

        bench("pallas_kriging_valid", lambda: pallas_kriging_valid(p16, grid, lo_d, la_d))
        bench("pallas_packed_kriging_t", lambda: pallas_packed_kriging_t(sp.window, grid, lo_d, la_d))
        bench("pallas_packed_idw_t k=8", lambda: pallas_packed_idw_t(sp.window, grid, lo_d, la_d, k=8))


if __name__ == "__main__":
    main()
