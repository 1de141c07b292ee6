"""Chip probe: fused band-fill cost vs page SHAPE (interleaved medians).

band_probe/atlas_probe r4 measured, in the same one-dispatch jitted path
(_fill_pages): whole-grid 2053x2441 at ~5-6 ns/cell, 8x 424x384 atlas pages
at ~5.5-7.3 ns/cell, but the narrow 120x2441 survey band at ~59 ns/cell —
a ~7x per-cell anomaly after subtracting the ~7 ms dispatch floor.  This
probe times the shapes round-robin (drift cancels) to confirm the effect and
test one cheap remedy: re-paging the narrow band as 8 column segments.

Serialize with other chip work (CLAUDE.md).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = 5

# (label, placed origins, page rows, page cols)
CONFIGS = (
    ("narrow 120x2441 x1", ((868, 0),), 120, 2441),
    ("page 424x384 x1", ((868, 0),), 424, 384),
    ("atlas 424x384 x8", tuple((i * 224, i * 288) for i in range(8)), 424, 384),
    ("narrow-repaged 120x320 x8", tuple((868, i * 303) for i in range(8)), 120, 320),
    ("whole 2053x2441 x1", ((0, 0),), 2053, 2441),
    ("tall 2053x320 x1", ((0, 1024),), 2053, 320),
)


def main():
    import auvtpu  # noqa: F401
    import jax

    from auvtpu.config import KERGUELEN_EXTENT
    from auvtpu.grid import RegularGrid
    from auvtpu.masking import mask_grid
    from auvtpu.ops.band import _fill_pages
    from auvtpu.synthetic import kerguelen_standin
    from auvtpu.utils.device import wait_for_device
    from auvtpu.utils.timing import steady_state_ms

    wait_for_device()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    elev = kerguelen_standin()
    reduced, _, _ = mask_grid(elev, 0.10)
    grid = RegularGrid.from_nan_array(np.asarray(reduced, np.float32),
                                      KERGUELEN_EXTENT)
    print(f"grid {reduced.shape}, {ROUNDS} interleaved rounds", flush=True)

    def make_fn(placed, pr, pc):
        return lambda: _fill_pages(
            grid, None, placed=placed, pr=pr, pc=pc, method="kriging",
            margin=10, fill_backend="fused", convention="reference",
            model="exponential")[0]

    fns = {}
    for label, placed, pr, pc in CONFIGS:
        fn = make_fn(placed, pr, pc)
        jax.block_until_ready(fn())  # compile outside the timed rounds
        fns[label] = fn
        print(f"compiled: {label}", flush=True)

    times = {label: [] for label, *_ in CONFIGS}
    for r in range(ROUNDS):
        for label, placed, pr, pc in CONFIGS:
            times[label].append(
                steady_state_ms(fns[label], iters=4, warmup=1))
        print(f"round {r}: " + "  ".join(
            f"{t[-1]:.2f}" for t in times.values()), flush=True)

    print("\nmedians:", flush=True)
    for label, placed, pr, pc in CONFIGS:
        med = float(np.median(times[label]))
        cells = len(placed) * pr * pc
        print(f"  {label:28s} {med:8.2f} ms  {med*1e6/cells:7.2f} ns/cell "
              f"({cells/1e6:.2f}M cells)", flush=True)


if __name__ == "__main__":
    main()
