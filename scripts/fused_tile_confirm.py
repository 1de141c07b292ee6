"""Chip probe: interleaved confirmation sweep of the fused kriging kernel's
tile/solver default.

fused_tile_sweep2 measured each config once, sequentially; its own footnote
says in-process noise is ~7% and cross-process ~20%, while the spread between
the current default ((32,128) lu) and the best candidate ((64,128) lu) was
~8% — inside the noise band.  This probe times the four live candidates in
round-robin order for R rounds and reports per-config medians, so slow drift
(tunnel weather, clock ramps) cancels instead of biasing whichever config ran
first.  Flip the pallas_fill_kriging default only on a consistent winner.

Serialize with other chip work (CLAUDE.md).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANDIDATES = (
    # (tile, solver, prefetch-depth).  Round-4 extension: fused_breakdown2
    # showed the kernel is per-tile-DMA-latency-bound, so sweep LARGER tiles
    # (fewer tiles amortize the latency); (128,512) is excluded — ~40 VMEM
    # value planes at 256Ki cells would blow the 16M scoped-vmem budget.
    ((64, 256), "gj", 2),   # current default (r4 winner at 4.90 ms)
    ((64, 256), "gj", 3),
    ((64, 512), "gj", 2),
    ((128, 256), "gj", 2),
    ((128, 256), "gj", 3),
    ((64, 512), "lu", 2),
    ((128, 256), "lu", 2),
    ((128, 512), "gj", 2),  # expected VMEM-reject; keep to confirm the bound
)
ROUNDS = 5


def main():
    import auvtpu  # noqa: F401
    import jax

    from auvtpu.config import KERGUELEN_EXTENT
    from auvtpu.grid import RegularGrid
    from auvtpu.masking import mask_grid
    from auvtpu.pallas import pallas_fill_kriging
    from auvtpu.synthetic import kerguelen_standin
    from auvtpu.utils.device import wait_for_device
    from auvtpu.utils.timing import steady_state_ms

    wait_for_device()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)
    elev = kerguelen_standin()
    reduced, rc, truth = mask_grid(elev, 0.10)
    grid = RegularGrid.from_nan_array(np.asarray(reduced, np.float32), KERGUELEN_EXTENT)
    n = len(truth)
    print(f"grid {reduced.shape}, {n} masked, {ROUNDS} interleaved rounds", flush=True)

    # compile + parity check everything up front so timing rounds are pure;
    # oversized tiles may be VMEM-rejected by Mosaic — drop them, don't die
    ref = None
    live = []
    for tile, solver, pf in CANDIDATES:
        try:
            out = np.asarray(
                pallas_fill_kriging(grid, tile=tile, solver=solver, prefetch=pf)
            )
        except Exception as e:  # noqa: BLE001
            print(
                f"tile={tile} solver={solver} pf={pf} REJECTED: "
                f"{str(e).splitlines()[0][:140]}",
                flush=True,
            )
            continue
        live.append((tile, solver, pf))
        if ref is None:
            ref = out
        else:
            assert (np.isnan(ref) == np.isnan(out)).all(), "NaN mask mismatch"
            both = ~np.isnan(ref)
            par = float(np.abs(ref[both] - out[both]).max())
            print(
                f"tile={tile} solver={solver} pf={pf} parity vs first: {par:.2e}",
                flush=True,
            )

    times = {c: [] for c in live}
    for r in range(ROUNDS):
        for tile, solver, pf in live:
            ms = steady_state_ms(
                lambda tile=tile, solver=solver, pf=pf: pallas_fill_kriging(
                    grid, tile=tile, solver=solver, prefetch=pf
                ),
                iters=15, warmup=1,
            )
            times[(tile, solver, pf)].append(ms)
        print(f"round {r} done", flush=True)

    print(f"{'config':34s} {'median':>8s} {'min':>8s} {'max':>8s}   M pts/s", flush=True)
    for c, ts in sorted(times.items(), key=lambda kv: float(np.median(kv[1]))):
        med = float(np.median(ts))
        print(
            f"tile={c[0]} solver={c[1]:4s} pf={c[2]} {med:8.2f} {min(ts):8.2f} {max(ts):8.2f}"
            f"   {n/med/1e3:8.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
