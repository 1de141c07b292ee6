"""Chip micro-probe: which unit slowed? (MXU matmul / HBM copy / VPU loop /
the fused kriging fill), interleaved medians.

Context: identical bench.py code measured 4.18 ms/step on 08-18 and
6.08-6.68 ms/step on 08-19 (docs/RESULTS.md chip-drift note).  If the drift
is a core-clock drop, everything scales together; if it is HBM- or
DMA-specific, compute-heavy configs may rank differently than the committed
(64,256)/gj default.  Serialize with other chip work.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = 5


def main():
    import auvtpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from auvtpu.config import KERGUELEN_EXTENT as EXT
    from auvtpu.grid import RegularGrid
    from auvtpu.masking import mask_grid
    from auvtpu.pallas import pallas_fill_kriging
    from auvtpu.synthetic import kerguelen_standin
    from auvtpu.utils.device import wait_for_device
    from auvtpu.utils.timing import steady_state_ms

    wait_for_device()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    elev = kerguelen_standin()
    reduced, _, _ = mask_grid(elev, 0.10)
    grid = RegularGrid.from_nan_array(np.asarray(reduced, np.float32), EXT)

    # NB: arrays must be ARGUMENTS, not closures — closed-over concrete
    # arrays are baked into the HLO as literals and the 256 MB constant
    # blows the axon remote_compile body limit (HTTP 413).
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (4096, 4096), jnp.bfloat16)
    b = jax.random.normal(k, (4096, 4096), jnp.bfloat16)
    big = jax.random.normal(k, (8192, 8192), jnp.float32)  # 256 MB

    @jax.jit
    def _mxu(a, b):  # 8 chained bf16 4k matmuls = 1.1 TFLOP
        x = a
        for _ in range(8):
            x = jnp.dot(x, b)
        return x

    @jax.jit
    def _hbm(big):  # 16 full passes over 256 MB = 8 GB of traffic
        x = big
        for _ in range(16):
            x = x * 1.000001 + 0.5
        return x

    @jax.jit
    def _vpu(blk):  # elementwise-heavy on a VMEM-sized block, many iterations
        x = blk
        for _ in range(600):
            x = jnp.abs(x) * 0.999 + jnp.minimum(x, 0.25)
        return x

    blk = big[:512, :1024]
    mxu = lambda: _mxu(a, b)
    hbm = lambda: _hbm(big)
    vpu = lambda: _vpu(blk)
    fill = lambda: pallas_fill_kriging(grid)

    cases = {"mxu_bf16_4k^3x8": mxu, "hbm_8GB": hbm, "vpu_600it": vpu,
             "fused_fill": fill}
    for name, fn in cases.items():
        jax.block_until_ready(fn())
        print(f"compiled {name}", flush=True)
    # Two iteration counts per case: t(iters) = fixed/iters + compute.
    # Solving the pair separates the tunnel-sync/dispatch overhead (fixed)
    # from the on-chip time (compute) — the drift diagnosis needs compute.
    I_LO, I_HI = 4, 24
    times = {name: {I_LO: [], I_HI: []} for name in cases}
    for r in range(ROUNDS):
        for name, fn in cases.items():
            times[name][I_LO].append(steady_state_ms(fn, iters=I_LO, warmup=1))
            times[name][I_HI].append(steady_state_ms(fn, iters=I_HI, warmup=1))
        print(f"round {r}: " + "  ".join(
            f"{n}={v[I_LO][-1]:.2f}/{v[I_HI][-1]:.2f}"
            for n, v in times.items()), flush=True)
    print("\nmedians (lo/hi iters -> fixed overhead, on-chip compute):",
          flush=True)
    med = {}
    for name, v in times.items():
        lo = float(np.median(v[I_LO]))
        hi = float(np.median(v[I_HI]))
        # lo = F/I_LO + C ; hi = F/I_HI + C
        fixed = (lo - hi) / (1.0 / I_LO - 1.0 / I_HI)
        compute = hi - fixed / I_HI
        med[name] = compute
        print(f"  {name:18s} {lo:7.2f} / {hi:7.2f} ms -> fixed {fixed:6.1f}"
              f"  compute {compute:6.2f} ms", flush=True)
    print(f"\nMXU: {8 * 2 * 4096**3 / med['mxu_bf16_4k^3x8'] / 1e9:.1f} Tflop/s"
          f" (v5e peak ~197) | HBM(fused x16->1 pass, 512MB):"
          f" {2 * 256e6 / med['hbm_8GB'] / 1e6:.0f} GB/s (peak ~819)"
          f" | fill: {5.01e6 / med['fused_fill'] / 1e3:.2f} B cells/s",
          flush=True)


if __name__ == "__main__":
    main()
