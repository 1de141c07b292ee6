"""Learned interpolation: a masked-convolution inpainting baseline.

A deliberately small flax CNN that fills masked bathymetry grids, extending
the framework beyond the reference's classical methods (the reference has no
learned path; motivation: "Application of Deep Learning-based Interpolation
Methods to Nearshore Bathymetry", arXiv:2011.09707 — retrieved in PAPERS.md).

TPU-first choices:
- convolutions are the MXU path: NHWC layout, channel counts in multiples of
  8, bf16 compute with f32 parameters/optimizer state (the standard mixed-
  precision recipe), everything under one jitted train step;
- masked/partial convolutions: each conv sees ``concat(elev * valid, valid)``
  so the network learns validity-aware kernels (a lightweight stand-in for
  true partial convs, which need per-window renormalization — measurably
  unnecessary at these densities);
- per-tile normalization by observed-cell mean/std so one set of weights
  serves tiles of any depth scale (the same reasoning behind the scattered
  path's variogram scale factor, scattered.py).

The model is a residual corrector on top of the window-mean fill: the CNN
predicts a *residual* against ``fill_window_mean``, so an untrained network
already matches the classical baseline and training only has to learn the
structure the mean misses.  This keeps the capability honest on tiny
training budgets (CPU tests train in seconds) while scaling on the chip.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

try:  # flax/optax are baked into the image; gate anyway (CLAUDE.md)
    import flax.linen as nn
    import optax

    _LEARNED_AVAILABLE = True
except Exception:  # pragma: no cover
    _LEARNED_AVAILABLE = False

from .grid import RegularGrid
from .ops import fill_window_mean


def learned_available() -> bool:
    return _LEARNED_AVAILABLE


if _LEARNED_AVAILABLE:

    class MaskedConvInpainter(nn.Module):
        """Small residual CNN: (elev*valid, valid, mean_fill) -> residual.

        width/depth are tiny by default so the CPU suite can train it; on the
        chip the same module scales by config.  Compute dtype bf16 (MXU),
        params f32.
        """

        width: int = 32
        depth: int = 4
        compute_dtype: Any = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            dt = self.compute_dtype
            h = x.astype(dt)
            h = nn.Conv(self.width, (3, 3), dtype=dt, name="stem")(h)
            h = nn.gelu(h)
            for i in range(self.depth):
                r = nn.Conv(self.width, (3, 3), dtype=dt, name=f"conv{i}a")(h)
                r = nn.gelu(r)
                r = nn.Conv(self.width, (3, 3), dtype=dt, name=f"conv{i}b")(r)
                h = h + r
            out = nn.Conv(
                1, (3, 3), dtype=dt, name="head",
                kernel_init=nn.initializers.zeros,
            )(h)
            # zero-initialized head: the untrained model IS the window-mean
            # baseline (residual = 0); training can only move away from it
            # where the data says so
            return out[..., 0].astype(jnp.float32)


def _normalize(elev, valid):
    """Observed-cell mean/std per tile; returns (normed*valid, mean, std)."""
    cnt = jnp.maximum(valid.sum(axis=(-2, -1), keepdims=True), 1.0)
    mean = (elev * valid).sum(axis=(-2, -1), keepdims=True) / cnt
    var = (((elev - mean) * valid) ** 2).sum(axis=(-2, -1), keepdims=True) / cnt
    std = jnp.sqrt(jnp.maximum(var, 1e-6))
    return (elev - mean) / std * valid, mean, std


def _features(elev, valid, mean_fill):
    """(B, H, W, 3) network input from batched planes (mean_fill normalized
    with the same per-tile statistics)."""
    normed, mean, std = _normalize(elev, valid)
    mf = jnp.where(jnp.isnan(mean_fill), 0.0, (mean_fill - mean) / std)
    return jnp.stack([normed, valid, mf], axis=-1), mean, std


def init_params(rng, *, width: int = 32, depth: int = 4, tile: int = 64):
    model = MaskedConvInpainter(width=width, depth=depth)
    x = jnp.zeros((1, tile, tile, 3), jnp.float32)
    return model.init(rng, x)["params"]


@partial(jax.jit, static_argnames=("width", "depth"))
def predict_planes(params, elev, valid, mean_fill, *, width: int = 32, depth: int = 4):
    """Batched fill planes from batched (elev, valid, mean_fill) inputs.

    Returns the denormalized prediction: mean_fill + std * residual, with
    observed cells passed through and cells where even the mean fill failed
    (no neighbors) left NaN.
    """
    model = MaskedConvInpainter(width=width, depth=depth)
    x, mean, std = _features(elev, valid, mean_fill)
    res = model.apply({"params": params}, x)
    pred = mean_fill + std * res  # std (B,1,1) broadcasts over (B,H,W)
    pred = jnp.where(jnp.isnan(mean_fill), jnp.nan, pred)
    return jnp.where(valid > 0.5, elev, pred)


def fill_learned(grid: RegularGrid, params, *, width: int = 32, depth: int = 4, convention: str = "reference"):
    """Single-grid learned fill (API twin of ops.fill_*): observed cells keep
    their values, gaps get the CNN prediction, unreachable cells stay NaN.

    convention picks the window-mean baseline the residual corrects
    (training and serving must use the same one)."""
    mf = fill_window_mean(grid, convention=convention)
    out = predict_planes(
        params, grid.elev[None], grid.valid[None], mf[None],
        width=width, depth=depth,
    )
    return out[0]


def _loss_fn(params, elev, valid, mean_fill, target, tmask, *, width, depth):
    model = MaskedConvInpainter(width=width, depth=depth)
    x, mean, std = _features(elev, valid, mean_fill)
    res = model.apply({"params": params}, x)
    pred = mean_fill + std * res
    ok = tmask * (~jnp.isnan(mean_fill)).astype(jnp.float32)
    d = jnp.where(ok > 0, pred - target, 0.0)
    return jnp.sum(d * d) / jnp.maximum(jnp.sum(ok), 1.0)


@partial(jax.jit, static_argnames=("width", "depth", "tx"))
def train_step(params, opt_state, batch, *, width: int = 32, depth: int = 4, tx=None):
    """One adam step on held-out-cell MSE.  batch = (elev, valid, mean_fill,
    target, tmask): target/tmask are the artificially-masked cells whose true
    values are known (the same self-supervision the Grid B harness uses to
    score the classical methods)."""
    loss, grads = jax.value_and_grad(_loss_fn)(
        params, *batch, width=width, depth=depth
    )
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_training_batch(rng: np.random.RandomState, *, n: int = 8, tile: int = 64, removal=(0.05, 0.3)):
    """Self-supervised batch from synthetic tiles: mask a fraction of the
    observed cells, train to recover them.  Returns numpy planes."""
    from .synthetic import shelf_seamount

    elevs, valids, targets, tmasks = [], [], [], []
    for _ in range(n):
        base = shelf_seamount(
            tile, tile,
            k=float(rng.uniform(0.5, 4.0)),
            amplitude=float(rng.uniform(30.0, 200.0)),
            center_x=float(rng.uniform(15.0, 85.0)),
            center_y=float(rng.uniform(15.0, 85.0)),
            sigma_x=float(rng.uniform(8.0, 25.0)),
            sigma_y=float(rng.uniform(8.0, 25.0)),
        )
        frac = float(rng.uniform(*removal))
        m = rng.rand(tile, tile) < frac
        elev = np.where(m, 0.0, base).astype(np.float32)
        valid = (~m).astype(np.float32)
        elevs.append(elev)
        valids.append(valid)
        targets.append(base.astype(np.float32))
        tmasks.append(m.astype(np.float32))
    return (
        np.stack(elevs), np.stack(valids), np.stack(targets), np.stack(tmasks),
    )


def make_crop_batch(rng: np.random.RandomState, elev_plane, valid_plane, *, n: int = 8, tile: int = 64, hide=(0.05, 0.3)):
    """Self-supervised batch from a REAL reduced tile: random crops with a
    further fraction of the observed cells hidden as training targets — the
    same train-on-what-you-have protocol the Grid B harness scores with."""
    H, W = elev_plane.shape
    elevs, valids, targets, tmasks = [], [], [], []
    for _ in range(n):
        r = rng.randint(0, H - tile + 1)
        c = rng.randint(0, W - tile + 1)
        e = elev_plane[r : r + tile, c : c + tile]
        v = valid_plane[r : r + tile, c : c + tile]
        frac = float(rng.uniform(*hide))
        hidem = (rng.rand(tile, tile) < frac) & (v > 0.5)
        valids.append((v > 0.5) & ~hidem)
        elevs.append(np.where(hidem, 0.0, e))
        targets.append(e)
        tmasks.append(hidem)
    return (
        np.stack(elevs).astype(np.float32),
        np.stack(valids).astype(np.float32),
        np.stack(targets).astype(np.float32),
        np.stack(tmasks).astype(np.float32),
    )


def train(steps: int = 200, *, width: int = 32, depth: int = 4, tile: int = 64, batch: int = 8, lr: float = 3e-3, seed: int = 0, log_every: int = 0, log=print, batch_fn=None, convention: str = "reference"):
    """Train the inpainter; returns (params, loss_history).

    Default batches are synthetic tiles (make_training_batch); pass
    batch_fn(rng) -> (elev, valid, target, tmask) to train on real data
    (see make_crop_batch).  Tiny by default (CPU-testable); pass bigger
    width/depth/tile/steps on the chip.  Normalization makes the weights
    transfer across depth scales."""
    if not _LEARNED_AVAILABLE:  # pragma: no cover
        raise RuntimeError("flax/optax unavailable")
    from .config import Extent

    rng = np.random.RandomState(seed)
    params = init_params(jax.random.PRNGKey(seed), width=width, depth=depth, tile=tile)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    hist = []
    ext = Extent(0.0, float(tile - 1), 0.0, float(tile - 1))
    for s in range(steps):
        if batch_fn is not None:
            elev, valid, target, tmask = batch_fn(rng)
        else:
            elev, valid, target, tmask = make_training_batch(rng, n=batch, tile=tile)
        mf = jax.vmap(
            lambda e, v: fill_window_mean(
                RegularGrid(elev=e, valid=v, min_lon=ext.min_lon, max_lon=ext.max_lon,
                            min_lat=ext.min_lat, max_lat=ext.max_lat),
                convention=convention,
            )
        )(jnp.asarray(elev), jnp.asarray(valid))
        params, opt_state, loss = train_step(
            params, opt_state,
            (jnp.asarray(elev), jnp.asarray(valid), mf,
             jnp.asarray(target), jnp.asarray(tmask)),
            width=width, depth=depth, tx=tx,
        )
        hist.append(float(loss))
        if log_every and (s % log_every == 0):
            log(f"step {s}: masked-cell MSE {hist[-1]:.4f}")
    return params, hist


# --------------------------------------------------------------------------
# parameter checkpointing (npz — same no-deps policy as streaming.save)
# --------------------------------------------------------------------------

def save_params(path: str, params, *, width: int, depth: int) -> None:
    """Flat-key npz checkpoint of the inpainter parameters + architecture
    (so load_params can rebuild without out-of-band config)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrs = {"/".join(str(getattr(k, "key", k)) for k in kp): np.asarray(v)
            for kp, v in flat}
    arrs["__width__"] = np.asarray(width)
    arrs["__depth__"] = np.asarray(depth)
    np.savez_compressed(path, **arrs)


def load_params(path: str):
    """Returns (params, width, depth) from a save_params checkpoint."""
    d = np.load(path)
    width = int(d["__width__"])
    depth = int(d["__depth__"])
    tree = init_params(jax.random.PRNGKey(0), width=width, depth=depth, tile=8)
    flat = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    for kp, v in flat[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in kp)
        got = d[key]
        assert got.shape == v.shape, (key, got.shape, v.shape)
        leaves.append(jnp.asarray(got))
    params = jax.tree_util.tree_unflatten(flat[1], leaves)
    return params, width, depth
