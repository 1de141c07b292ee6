"""Chip probe: tile-shape re-sweep of the fused kriging kernel AFTER the r3
double-buffered DMA + pad-saturation fixes.

dense_tile_probe.py's conclusion ((32,128) sweet spot) predates both fixes
and was dominated by two artifacts those fixes removed: (a) serialized
per-tile DMA latency, which big tiles amortize, and (b) the 84 edge tiles
running all 49 offset chunks against all-invalid padding — a cost that GREW
with tile size.  With pad cells now born saturated and slabs prefetched a
tile ahead, the tradeoff is fresh: bigger tiles = fewer DMA round trips and
better VPU occupancy vs later early exit and more VMEM-resident solve planes.

Sweeps tile x solver; checks parity against the (32,128) gj output.

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
    tiles = ((32, 128), (32, 256), (64, 128), (64, 256), (64, 512), (128, 256), (96, 256))
    for tile in tiles:
        for solver in ("gj", "lu"):
            name = f"tile={tile} solver={solver}"
            try:
                out = np.asarray(pallas_fill_kriging(grid, tile=tile, solver=solver))
                if ref is None:
                    ref = out
                    par = 0.0
                else:
                    assert (np.isnan(ref) == np.isnan(out)).all(), "NaN mask mismatch"
                    both = ~np.isnan(ref)
                    par = float(np.abs(ref[both] - out[both]).max())
                ms = steady_state_ms(
                    lambda tile=tile, solver=solver: pallas_fill_kriging(
                        grid, tile=tile, solver=solver
                    ),
                    iters=10, warmup=2,
                )
            except Exception as e:
                print(f"{name:28s} FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
                continue
            print(
                f"{name:28s} {ms:8.2f} ms   {n/ms/1e3:8.1f} M masked pts/s"
                f"   parity={par:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
