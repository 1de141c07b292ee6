"""Chip probe: where do the ~13 ms over the fetch floor go in
pallas/valid_select.py?  Times each prologue stage in isolation.
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
    from auvtpu.ops.packs import _LANES, build_valid16_pack, fetch_pack, _normalize
    from auvtpu.synthetic import shelf_seamount
    from auvtpu.utils.timing import steady_state_ms

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)

    H, W = 2000, 1600
    grid = RegularGrid.dense(shelf_seamount(H, W), Extent(0.0, W - 1.0, 0.0, H - 1.0))
    p16 = build_valid16_pack(grid)
    rng = np.random.default_rng(0)
    N = 5_000_000
    lons = jax.device_put(jnp.asarray(rng.uniform(0, W - 1, N).astype(np.float32)))
    lats = jax.device_put(jnp.asarray(rng.uniform(0, H - 1, N).astype(np.float32)))

    @jax.jit
    def cell_idx(lons, lats):
        x, y, oob = _normalize(grid, lons, lats)
        ci = jnp.clip(jnp.floor(x + 0.5).astype(jnp.int32), 0, W - 1)
        cj = jnp.clip(jnp.floor(y + 0.5).astype(jnp.int32), 0, H - 1)
        return cj * W + ci

    idx = jax.block_until_ready(cell_idx(lons, lats))

    n_pad = (-p16.shape[0]) % _LANES
    flat = jnp.pad(p16, (0, n_pad)) if n_pad else p16
    pr = jax.block_until_ready(flat.reshape(-1, _LANES))

    @jax.jit
    def gather_only(idx):
        rows = (idx * 16) // _LANES
        return jnp.take(pr, rows, axis=0)  # (N, 128)

    @jax.jit
    def gather_sum(idx):
        return gather_only(idx).sum(axis=1)  # forces read, (N,) out

    @jax.jit
    def fetch_np(idx):
        return fetch_pack(p16, 16, idx, nan_invalid=False)

    @jax.jit
    def fetch_pn(idx):
        return fetch_pack(p16, 16, idx, nan_invalid=False, transposed=True)

    @jax.jit
    def fetch_np_T(idx):
        return fetch_pack(p16, 16, idx, nan_invalid=False).T

    def bench(name, fn, *args):
        try:
            ms = steady_state_ms(lambda: fn(*args), iters=10, warmup=2)
        except Exception as e:
            print(f"{name:28s} FAILED {type(e).__name__}: {e}", flush=True)
            return
        print(f"{name:28s} {ms:8.2f} ms   {N/ms/1e3:8.1f} M pts/s", flush=True)

    bench("cell_idx only", cell_idx, lons, lats)
    bench("gather (N,128) materialize", gather_only, idx)
    bench("gather + lane-sum (N,)", gather_sum, idx)
    bench("fetch_pack -> (N,16)", fetch_np, idx)
    bench("fetch_pack -> (16,N) direct", fetch_pn, idx)
    bench("fetch_pack (N,16) then .T", fetch_np_T, idx)


if __name__ == "__main__":
    main()
