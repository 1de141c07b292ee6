"""Chip probe: transposed fused valid-grid select (pallas/valid_select.py)
vs the XLA valid16 fast path (ops.packs.packed_kriging_valid).

The valid16 path measures ~46.8 ms at 5M vs a 26.5 ms fetch floor
(results/select_probe_r3.txt); the transposed kernel absorbs the top_k +
one-hot-pick residue on (16, tn) blocks.  Serialize with other chip work
(CLAUDE.md).
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
    from auvtpu.ops.packs import (
        StencilPack, build_valid16_pack, packed_kriging, packed_kriging_valid,
    )
    from auvtpu.pallas import pallas_kriging_valid, valid_select_t
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
    lons = jax.device_put(jnp.asarray(rng.uniform(0, W - 1, N).astype(np.float32)))
    lats = jax.device_put(jnp.asarray(rng.uniform(0, H - 1, N).astype(np.float32)))

    # parity: full kriging values AND the raw select dict (ties included)
    ls, lt = lons[:50_000], lats[:50_000]
    ref = np.asarray(packed_kriging_valid(p16, grid, ls, lt))
    ref_full = np.asarray(packed_kriging(sp.window, grid, ls, lt))
    got = np.asarray(pallas_kriging_valid(p16, grid, ls, lt))
    err = float(np.abs(got - ref).max())
    err_full = float(np.abs(got - ref_full).max())
    print(f"parity kriging: vs valid16 maxabs={err:.2e}  vs general maxabs={err_full:.2e}",
          flush=True)
    from auvtpu.ops.packs import VALID16_OFFSETS, fetch_pack, select_from_stencil, _normalize
    x, y, oob = _normalize(grid, ls, lt)
    ci = jnp.clip(jnp.floor(x + 0.5).astype(jnp.int32), 0, W - 1)
    cj = jnp.clip(jnp.floor(y + 0.5).astype(jnp.int32), 0, H - 1)
    st = fetch_pack(p16, 16, cj * W + ci)
    sel_ref = select_from_stencil(st, VALID16_OFFSETS, x, y, oob, ci, cj, k=4)
    sel_t = valid_select_t(p16, grid, ls, lt)
    for key in ("val", "d2", "dy", "dx"):
        a, b = np.asarray(sel_ref[key]), np.asarray(sel_t[key])
        ok = np.asarray(sel_ref["slot_ok"])
        m = float(np.abs(np.where(ok, a - b, 0.0)).max())
        print(f"  select[{key}] maxabs={m:.2e}", flush=True)
        assert m < 1e-5, f"select mismatch on {key}"
    assert err < 1e-2 and err_full < 1e-2, "PARITY FAILURE — do not trust timings"

    def bench(name, fn, iters=10):
        try:
            ms = steady_state_ms(fn, iters=iters, warmup=2)
        except Exception as e:
            print(f"{name:32s} FAILED {type(e).__name__}: {e}", flush=True)
            return
        print(f"{name:32s} {ms:8.2f} ms   {N/ms/1e3:8.1f} M pts/s", flush=True)

    bench("packed_kriging_valid16", lambda: packed_kriging_valid(p16, grid, lons, lats))
    for tn in (2048, 4096, 8192):
        bench(f"pallas_kriging_valid tn={tn}",
              lambda tn=tn: pallas_kriging_valid(p16, grid, lons, lats, tile_n=tn))
    for tn in (2048, 4096, 8192):
        bench(f"valid_select_t only tn={tn}",
              lambda tn=tn: valid_select_t(p16, grid, lons, lats, tile_n=tn)["val"])


if __name__ == "__main__":
    main()
