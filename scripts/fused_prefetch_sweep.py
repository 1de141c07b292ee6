"""Chip probe: prefetch-ring depth x tile shape for the fused kriging fill.

fused_tile_sweep2.py (after double buffering + pad saturation) left the top
configs within noise of each other at ~4.0-4.3 ms, with per-tile cost (~6 us)
still above the compute estimate (~2-3 us) — residual DMA latency that a
2-deep ring can only hide behind ONE tile of compute.  This sweeps ring depth
{2,3,4} over the three best tiles from that sweep, both solvers on the
winner.

Serialize with other chip work (CLAUDE.md).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    ref = None
    cases = []
    for tile in ((32, 128), (64, 128), (32, 256), (64, 256)):
        for pf in (2, 3, 4):
            for solver in (("gj", "lu") if pf == 3 else ("gj",)):
                cases.append((tile, pf, solver))
    for tile, pf, solver in cases:
        name = f"tile={tile} pf={pf} {solver}"
        try:
            out = np.asarray(
                pallas_fill_kriging(grid, tile=tile, solver=solver, prefetch=pf)
            )
            if ref is None:
                ref = out
                par = 0.0
            else:
                assert (np.isnan(ref) == np.isnan(out)).all(), "NaN mask mismatch"
                both = ~np.isnan(ref)
                par = float(np.abs(ref[both] - out[both]).max())
            ms = steady_state_ms(
                lambda tile=tile, pf=pf, solver=solver: pallas_fill_kriging(
                    grid, tile=tile, solver=solver, prefetch=pf
                ),
                iters=20, warmup=3,
            )
        except Exception as e:
            print(f"{name:30s} FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
            continue
        print(
            f"{name:30s} {ms:8.2f} ms   {n/ms/1e3:8.1f} M masked pts/s"
            f"   parity={par:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
