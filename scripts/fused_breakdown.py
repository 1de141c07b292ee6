"""Chip probe: fused dense-kriging kernel cost breakdown + LU-solve shave.

Round-3 follow-up to scripts/dense_tile_probe.py (which settled tile shape):
the kernel is VPU-bound, so this probe splits the per-tile cost into its
three stages and measures the r3 op-reduction work:

  1. solver='gj'  — full kernel, Gauss-Jordan solve (the r2 committed solve,
     now with the bit-exact roll-reorder + diagonal-nugget shaves);
  2. solver='lu'  — forward elimination + back-substitution (~70 plane-FMAs
     + 5 reciprocals vs GJ's ~100 FMAs + 21 divides).

(An earlier revision carried a selection-only ablation here, but it re-jitted
per call and timed compilation; the per-stage ablations live in
fused_breakdown2.py, which jits each variant once.)

Parity: lu vs gj maxabs on the bench workload, plus both vs the XLA
fill_kriging oracle path.

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

    elev = kerguelen_standin()
    reduced, rc, truth = mask_grid(elev, 0.10)
    H, W = reduced.shape
    grid = RegularGrid.from_nan_array(np.asarray(reduced, np.float32), KERGUELEN_EXTENT)
    n_masked = len(truth)
    print(f"grid {H}x{W}, {n_masked} masked", flush=True)

    outs = {}
    for solver in ("gj", "lu"):
        outs[solver] = np.asarray(pallas_fill_kriging(grid, solver=solver))
        ms = steady_state_ms(
            lambda solver=solver: pallas_fill_kriging(grid, solver=solver),
            iters=10, warmup=2,
        )
        print(f"fill_kriging solver={solver:3s}      {ms:8.2f} ms   {n_masked/ms/1e3:8.1f} M masked pts/s", flush=True)

    a, b = outs["lu"], outs["gj"]
    assert (np.isnan(a) == np.isnan(b)).all(), "NaN mask mismatch lu vs gj"
    both = ~np.isnan(a)
    print(f"parity lu vs gj: maxabs={np.abs(a[both]-b[both]).max():.3e}", flush=True)

    from auvtpu.ops import fill_kriging
    x = np.asarray(fill_kriging(grid, backend="xla"))
    assert (np.isnan(a) == np.isnan(x)).all(), "NaN mask mismatch vs xla"
    print(f"parity lu vs xla: maxabs={np.abs(a[both]-x[both]).max():.3e}", flush=True)
    print(f"parity gj vs xla: maxabs={np.abs(b[both]-x[both]).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
