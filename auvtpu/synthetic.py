"""Synthetic bathymetry generators.

Closed-form re-implementations of the reference's fake data backends:
- shelf + Gaussian seamount (generate_csv_grids.cpp:32-70) — the Grid A surface;
- sinusoid (main.cpp:21-33) — the demo/benchmark surface.

Both are provided as float64 numpy (golden/I-O) and as jittable jnp builders.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def shelf_seamount(
    num_lat: int,
    num_lon: int,
    *,
    domain: float = 100.0,
    d0: float = 10.0,
    k: float = 2.0,
    amplitude: float = 100.0,
    center_x: float = 75.0,
    center_y: float = 50.0,
    sigma_x: float = 15.0,
    sigma_y: float = 15.0,
    xp=np,
):
    """depth(x,y) = -(d0 + k x) + A exp(-[(x-xm)^2/2sx^2 + (y-ym)^2/2sy^2]).

    i -> x in [0, domain], j -> y in [0, domain]; reference maps both axes onto
    [0, 100] regardless of grid shape (generate_csv_grids.cpp:38-56).
    """
    j = xp.arange(num_lat, dtype=xp.float64 if xp is np else jnp.float32)
    i = xp.arange(num_lon, dtype=xp.float64 if xp is np else jnp.float32)
    y = domain * j / (num_lat - 1)
    x = domain * i / (num_lon - 1)
    xx = x[None, :]
    yy = y[:, None]
    baseline = -(d0 + k * xx)
    mountain = amplitude * xp.exp(
        -((xx - center_x) ** 2 / (2 * sigma_x**2) + (yy - center_y) ** 2 / (2 * sigma_y**2))
    )
    return baseline + mountain


def sinusoid(num_lat: int, num_lon: int, *, xp=np):
    """elev[j][i] = -1000 - 10 sin(0.01 i) - 15 cos(0.01 j) (main.cpp:21-33)."""
    j = xp.arange(num_lat, dtype=xp.float64 if xp is np else jnp.float32)
    i = xp.arange(num_lon, dtype=xp.float64 if xp is np else jnp.float32)
    return -1000.0 - 10.0 * xp.sin(i * 0.01)[None, :] - 15.0 * xp.cos(j * 0.01)[:, None]


def kerguelen_standin(shape=(2053, 2441), seed: int = 7) -> np.ndarray:
    """Synthetic stand-in for the Kerguelen GEBCO tile (a missing large blob in
    the reference checkout; shape/bounds per SURVEY.md §2 row 19).

    Plateau-like surface: broad shelf around -500 m falling to -4000 m abyssal
    plain, plus band-limited roughness so interpolation errors are non-trivial.
    """
    h, w = shape
    rng = np.random.RandomState(seed)
    y = np.linspace(-1.0, 1.0, h)[:, None]
    x = np.linspace(-1.0, 1.0, w)[None, :]
    r2 = (x * 1.1) ** 2 + (y * 0.9) ** 2
    plateau = -500.0 - 3500.0 / (1.0 + np.exp(-(r2 - 0.55) * 10.0))
    # band-limited roughness: upsampled coarse noise at two octaves
    def octave(cells, amp):
        coarse = rng.randn(cells, cells)
        yy = np.linspace(0, cells - 1, h)
        xx = np.linspace(0, cells - 1, w)
        yi = np.clip(yy.astype(int), 0, cells - 2)
        xi = np.clip(xx.astype(int), 0, cells - 2)
        ty = (yy - yi)[:, None]
        tx = (xx - xi)[None, :]
        c00 = coarse[yi][:, xi]
        c01 = coarse[yi][:, xi + 1]
        c10 = coarse[yi + 1][:, xi]
        c11 = coarse[yi + 1][:, xi + 1]
        return amp * ((1 - ty) * ((1 - tx) * c00 + tx * c01) + ty * ((1 - tx) * c10 + tx * c11))

    rough = octave(64, 120.0) + octave(256, 35.0)
    return np.round(plateau + rough)  # GEBCO elevations are integer meters
