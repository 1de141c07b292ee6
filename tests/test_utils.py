"""Utility-layer tests: debug/sanitizer mode and timing helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auvtpu.utils import debug_mode, steady_state_ms, time_once_ms


def test_debug_mode_catches_nan_and_restores():
    @jax.jit
    def f(x):
        return jnp.log(x)

    with debug_mode():
        with pytest.raises(FloatingPointError):
            jax.block_until_ready(f(jnp.asarray(-1.0, jnp.float32)))
    assert not jax.config.jax_debug_nans


def test_debug_mode_eager_disables_jit():
    seen = []

    @jax.jit
    def f(x):
        seen.append(1)  # traced once under jit; every call when disabled
        return x + 1

    f(jnp.asarray(0.0))
    n0 = len(seen)
    with debug_mode(nans=False, disable_jit=True):
        f(jnp.asarray(0.0))
        f(jnp.asarray(0.0))
    assert len(seen) >= n0 + 2
    assert not jax.config.jax_disable_jit


def test_timing_helpers_run():
    f = jax.jit(lambda x: (x * 2).sum())
    x = jnp.ones((64, 64))
    ms, out = time_once_ms(f, x)
    assert ms > 0 and float(out) == 2 * 64 * 64
    ss = steady_state_ms(f, x, iters=3, warmup=1)
    assert ss > 0
