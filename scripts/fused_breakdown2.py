"""Chip probe #2: where do the fused dense-kriging kernel's 6.2 ms go?

fused_breakdown.py showed build+solve is only ~10-15% of the runtime (LU vs
GJ moved 6.41 -> 6.22 ms), so this probe dissects the selection stage:

  scan9       one fixed chunk (9 offsets), roll + fma only  -> roll/loop floor
  scan_ex     early-exit loop, roll + fma only              -> + exit control
  sel_vals    early-exit loop, first-4 values (no codes)    -> + value slots
  sel_full    early-exit loop, values + codes               -> + code slots
  chunks      early-exit loop, outputs executed chunk count -> workload stats
  full(lu)    the production kernel                          -> + build + solve

All variants are jitted once (fused_breakdown.py's ablation re-jitted per
call — its 667 ms row is garbage; superseded here).

Serialize with other chip work (CLAUDE.md).
"""

import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TILE = (32, 128)
R = 10


def build_variant(grid, variant):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from auvtpu.ops.dense import _padded_tables, _CHUNK
    from auvtpu.pallas.window_fill import _slab_shape, _window_reader

    th, tw = TILE
    H, W = grid.shape
    sh, sw = _slab_shape(R, th, tw)
    Hp = -(-H // th) * th
    Wp = -(-W // tw) * tw
    pad_b = (Hp - th + sh) - H - R
    pad_r = (Wp - tw + sw) - W - R
    nanp = jnp.pad(
        jnp.where(grid.valid > 0.5, grid.elev, jnp.nan),
        ((R, pad_b), (R, pad_r)), constant_values=jnp.nan,
    )
    dxs, dys, d2s, live, n_chunks = _padded_tables(R)
    dy_tab = jnp.asarray(dys + R, jnp.int32)
    dx_tab = jnp.asarray(dxs + R, jnp.int32)
    live_tab = jnp.asarray(live, jnp.float32)
    K = 4
    code_base = 2 * R + 12

    def kernel(dy_ref, dx_ref, live_ref, nanp_hbm, out_ref, slab, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        copy = pltpu.make_async_copy(
            nanp_hbm.at[pl.ds(i * th, sh), pl.ds(j * tw, sw)], slab, sem
        )
        copy.start()
        copy.wait()
        zero = jnp.zeros((th, tw), jnp.float32)
        win = _window_reader(slab, R, th, tw)

        if variant == "scan9":
            acc = zero
            for t in range(9):
                v = win(dy_ref[t], dx_ref[t])
                acc = acc + jnp.where(jnp.isnan(v), 0.0, v)
            out_ref[:] = acc
            return

        if variant in ("scan_ex", "chunks"):
            # early-exit loop, minimal per-offset work: cnt += valid
            def cond(carry):
                c, (cnt, acc) = carry
                return (c == 0) | ((c < n_chunks) & (jnp.min(cnt) < K))

            def body(carry):
                c, (cnt, acc) = carry
                base = c * _CHUNK
                for t in range(_CHUNK):
                    oi = base + t
                    v = win(dy_ref[oi], dx_ref[oi])
                    okv = jnp.logical_not(jnp.isnan(v))
                    take = jnp.where((live_ref[oi] > 0.0) & okv,
                                     (cnt < K).astype(jnp.float32), 0.0)
                    cnt = cnt + take
                    acc = acc + take * jnp.where(okv, v, 0.0)
                return (c + 1, (cnt, acc))

            c, (cnt, acc) = jax.lax.while_loop(
                cond, body, (jnp.asarray(0, jnp.int32), (zero, zero))
            )
            if variant == "chunks":
                out_ref[:] = zero + c.astype(jnp.float32)
            else:
                out_ref[:] = acc + cnt
            return

        # sel_vals / sel_full: the production selection loop
        track_codes = variant == "sel_full"
        init = (zero, tuple(zero for _ in range(K)),
                tuple(zero - 1.0 for _ in range(K)) if track_codes else ())

        def cond(carry):
            c, (cnt, _v, _o) = carry
            return (c == 0) | ((c < n_chunks) & (jnp.min(cnt) < K))

        def body(carry):
            c, (cnt, vals, codes) = carry
            base = c * _CHUNK
            for t in range(_CHUNK):
                oi = base + t
                dy = dy_ref[oi]
                dx = dx_ref[oi]
                lv = live_ref[oi] > 0.0
                v = win(dy, dx)
                okv = jnp.logical_not(jnp.isnan(v))
                take = jnp.where(lv & okv, (cnt < K).astype(jnp.float32), 0.0)
                code = dx.astype(jnp.float32) * code_base + dy.astype(jnp.float32)
                nv, nc = [], []
                for s in range(K):
                    hit = (take > 0) & (cnt == s)
                    nv.append(jnp.where(hit, v, vals[s]))
                    if track_codes:
                        nc.append(jnp.where(hit, code, codes[s]))
                cnt = cnt + take
                vals = tuple(nv)
                if track_codes:
                    codes = tuple(nc)
            return (c + 1, (cnt, vals, codes))

        _, (cnt, vals, codes) = jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), init)
        )
        s = vals[0] + vals[1] + vals[2] + vals[3]
        if track_codes:
            s = s + 1e-30 * (codes[0] + codes[3])
        out_ref[:] = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), jnp.nan)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Hp // th, Wp // tw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((th, tw), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(_slab_shape(R, th, tw), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        grid_spec=grid_spec,
    )
    run = jax.jit(lambda a, b, c, d: fn(a, b, c, d)[:H, :W])
    return lambda: run(dy_tab, dx_tab, live_tab, nanp)


def main():
    import auvtpu  # noqa: F401
    import jax

    from auvtpu.config import KERGUELEN_EXTENT
    from auvtpu.grid import RegularGrid
    from auvtpu.masking import mask_grid
    from auvtpu.pallas import pallas_fill_kriging
    from auvtpu.synthetic import kerguelen_standin
    from auvtpu.utils.timing import steady_state_ms

    from auvtpu.utils.device import wait_for_device
    wait_for_device()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)
    elev = kerguelen_standin()
    reduced, rc, truth = mask_grid(elev, 0.10)
    grid = RegularGrid.from_nan_array(np.asarray(reduced, np.float32), KERGUELEN_EXTENT)
    n = len(truth)
    print(f"grid {reduced.shape}, {n} masked", flush=True)

    for variant in ("scan9", "scan_ex", "sel_vals", "sel_full", "chunks"):
        f = build_variant(grid, variant)
        out = np.asarray(f())
        ms = steady_state_ms(f, iters=10, warmup=2)
        extra = ""
        if variant == "chunks":
            th, tw = TILE
            per_tile = out[::th, ::tw]
            hist = np.bincount(per_tile.astype(int).ravel())
            extra = f"   chunk-count hist={list(hist)} mean={per_tile.mean():.2f}"
        print(f"{variant:10s} {ms:8.2f} ms   {n/ms/1e3:8.1f} M masked pts/s{extra}", flush=True)

    ms = steady_state_ms(lambda: pallas_fill_kriging(grid, solver="lu"), iters=10, warmup=2)
    print(f"{'full(lu)':10s} {ms:8.2f} ms   {n/ms/1e3:8.1f} M masked pts/s", flush=True)


if __name__ == "__main__":
    main()
