"""Chip probe: pallas_fill_kriging tile-shape sweep (VERDICT r2 ask #4).

The fused dense kriging kernel runs (32,128) tiles at ~105 M masked pts/s
(bench.py headline).  Candidate shaves: bigger tiles amortize the
per-offset whole-slab dynamic rotates over more output cells; the cost is
a bigger DMA slab and more VMEM-resident Gauss-Jordan planes.  This probe
sweeps tile shapes at the bench.py workload (Kerguelen-size grid, 10%
masked) and checks bit-parity against the default tile.

Serialize with other chip work (CLAUDE.md).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import auvtpu  # noqa: F401  (compile cache)
    import jax
    import jax.numpy as jnp

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

    # same workload as bench.py (Kerguelen-size stand-in, 10% masked)
    elev = kerguelen_standin()
    reduced, rc, truth = mask_grid(elev, 0.10)
    H, W = reduced.shape
    grid = RegularGrid.from_nan_array(np.asarray(reduced, np.float32), KERGUELEN_EXTENT)
    n_masked = len(truth)
    print(f"grid {H}x{W}, {n_masked} masked", flush=True)

    ref = None
    for tile in ((32, 128), (32, 256), (64, 128), (64, 256), (16, 128), (128, 256)):
        name = f"fill_kriging tile={tile}"
        try:
            out = np.asarray(pallas_fill_kriging(grid, tile=tile))
            if ref is None:
                ref = out
                par = 0.0
            else:
                both = ~(np.isnan(ref) | np.isnan(out))
                assert (np.isnan(ref) == np.isnan(out)).all(), "NaN mask mismatch"
                par = float(np.abs(ref[both] - out[both]).max())
            ms = steady_state_ms(
                lambda tile=tile: pallas_fill_kriging(grid, tile=tile),
                iters=10, warmup=2,
            )
        except Exception as e:
            print(f"{name:28s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
            continue
        print(
            f"{name:28s} {ms:8.2f} ms   {n_masked/ms/1e3:8.1f} M masked pts/s"
            f"   parity={par:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
