"""Chip micro-probe: where does the per-page atlas fill overhead come from?

atlas_probe_r4 measured 73.95 ns/cell for 8-page refresh vs 5.02 ns/cell for
one whole-grid fill — ~12 ms of fixed cost per page.  Candidates:
  (a) host dispatch overhead over the axon tunnel (8 fill calls, each a
      chain of un-jitted slice/where ops -> dozens of tunnel dispatches);
  (b) device-side fixed cost of the fused Pallas fill kernel per launch.

Measures steady-state: one page fill (fused vs xla), 8 sequential page fills
as Python loop (the current build_atlas), and 8 page fills wrapped in ONE jit
(static origins).  Serialize with other chip work.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGES = [(i * 224, 424, i * 288, 384) for i in range(8)]  # row0, nrows, col0, ncols


def main():
    import auvtpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from auvtpu.config import KERGUELEN_EXTENT as EXT
    from auvtpu.grid import RegularGrid
    from auvtpu.masking import mask_grid
    from auvtpu.ops.band import fill_band
    from auvtpu.synthetic import kerguelen_standin
    from auvtpu.utils.device import wait_for_device
    from auvtpu.utils.timing import steady_state_ms

    wait_for_device()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    elev = kerguelen_standin()
    reduced, _, _ = mask_grid(elev, 0.10)
    grid = RegularGrid.from_nan_array(np.asarray(reduced, np.float32), EXT)
    cells = PAGES[0][1] * PAGES[0][3]

    for backend in ("fused", "xla"):
        ms1 = steady_state_ms(
            lambda: fill_band(grid, *PAGES[0], fill_backend=backend,
                              assume_masked=True).plane,
            iters=8, warmup=2)
        print(f"[{backend}] 1 page  loop : {ms1:7.2f} ms "
              f"({ms1*1e6/cells:.2f} ns/cell)", flush=True)

        def loop8():
            return [fill_band(grid, *p, fill_backend=backend,
                              assume_masked=True).plane for p in PAGES][-1]

        ms8 = steady_state_ms(loop8, iters=4, warmup=1)
        print(f"[{backend}] 8 pages loop : {ms8:7.2f} ms "
              f"({ms8*1e6/(8*cells):.2f} ns/cell)", flush=True)

        @jax.jit
        def jit8(elevp, validp):
            g = RegularGrid(elev=elevp, valid=validp, min_lon=grid.min_lon,
                            max_lon=grid.max_lon, min_lat=grid.min_lat,
                            max_lat=grid.max_lat)
            return jnp.stack([
                fill_band(g, *p, fill_backend=backend,
                          assume_masked=True).plane
                for p in PAGES])

        msj = steady_state_ms(lambda: jit8(grid.elev, grid.valid),
                              iters=4, warmup=1)
        print(f"[{backend}] 8 pages 1 jit: {msj:7.2f} ms "
              f"({msj*1e6/(8*cells):.2f} ns/cell)", flush=True)


if __name__ == "__main__":
    main()
