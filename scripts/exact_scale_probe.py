"""Chip probe: `--selection exact` cost curve at scale (VERDICT r3 item 4).

Exact mode is the bit-parity path (published-table reproduction); its cost was
only ever measured at <=46k masked points (the three real-region tiles at
their published removals).  The Kerguelen published rows are permanently
blocked (the tile is a missing upstream blob, .MISSING_LARGE_BLOBS), so this
probe characterizes exact-mode scaling on the same-shape stand-in instead:
removal 0.01 / 0.05 / 0.10 -> ~50k / 250k / 500k masked cells, all three
exact methods, steady-state + the chunked pipeline's wall time.

Output feeds the scaling table in docs/RESULTS.md.  Serialize with other
chip work (CLAUDE.md).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REMOVALS = (0.01, 0.05, 0.10)


def main():
    import auvtpu  # noqa: F401
    import jax

    from auvtpu.config import KERGUELEN_EXTENT as EXT
    from auvtpu.grid import RegularGrid
    from auvtpu.masking import mask_grid
    from auvtpu.synthetic import kerguelen_standin
    from auvtpu.utils.device import wait_for_device

    wait_for_device()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)

    jax.config.update("jax_enable_x64", True)
    try:
        from auvtpu.ops.exact import (
            exact_bilinear_at_cells,
            exact_cubic_at_cells,
            exact_kriging_at_cells,
        )

        elev = kerguelen_standin()
        print(f"grid {elev.shape}", flush=True)
        print(f"{'removal':>8} {'masked':>8} {'method':>9} {'wall_s':>8} {'ns/pt':>8} "
              f"{'Mpts/s':>8}", flush=True)
        for removal in REMOVALS:
            reduced, rc, truth = mask_grid(elev, removal)
            grid = RegularGrid.from_nan_array(
                np.asarray(reduced), EXT, dtype=np.float64)
            n = len(truth)
            rows = rc[:, 0].copy()
            cols = rc[:, 1].copy()
            from auvtpu.ops.exact_fast import exact_kriging_at_cells_fast

            for name, fn in (
                ("Bilinear", exact_bilinear_at_cells),
                ("Cubic", exact_cubic_at_cells),
                ("Kriging", exact_kriging_at_cells),
                ("Krig2tier", exact_kriging_at_cells_fast),
                ("Krig2tC", lambda g, r, c: exact_kriging_at_cells_fast(
                    g, r, c, solve="coords")),
            ):
                # warm (compile chunks), then one timed pass: exact mode is a
                # chunked host-loop pipeline, so wall time IS its cost metric
                out = np.asarray(fn(grid, rows, cols))
                assert np.isfinite(out).mean() > 0.95, (name, removal)
                t0 = time.perf_counter()
                out = np.asarray(fn(grid, rows, cols))
                dt = time.perf_counter() - t0
                print(f"{removal:8.2f} {n:8d} {name:>9} {dt:8.2f} "
                      f"{dt*1e9/n:8.0f} {n/dt/1e6:8.2f}", flush=True)
                if name == "Kriging":
                    strict = out
                elif name.startswith("Krig2t"):
                    m = np.isfinite(strict) & np.isfinite(out)
                    dv = float(np.abs(out[m] - strict[m]).max())
                    same_nan = (np.isnan(out) == np.isnan(strict)).all()
                    print(f"{'':26s} parity vs strict: maxabs={dv:.2e} "
                          f"nan-match={same_nan}", flush=True)
                    assert dv < 1e-6 and same_nan, (name, removal, dv)
    finally:
        jax.config.update("jax_enable_x64", False)


if __name__ == "__main__":
    main()
