"""Device-availability helper for chip-facing entry points.

The dev-tunnel TPU backend flaps occasionally (observed r2/r3: outages of
minutes to ~an hour).  A transient outage must not junk a benchmark or
campaign run, so chip entry points (bench.py, scripts/*) wait for a backend
to answer before touching jax.devices().

Probe with SUBPROCESSES: a failed in-process backend init is cached by
jax.xla_bridge, so the caller's process must not touch jax.devices() until a
fresh interpreter confirms a backend answers.  The tunnel has two
personalities — the 'axon' plugin (default env) and the raw 'tpu' platform
via libtpu — and outages have been observed where one recovers before the
other, so probe both.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def _probe(platforms, timeout_s: float = 540.0) -> bool:
    env = dict(os.environ)
    if platforms is not None:
        env["JAX_PLATFORMS"] = platforms
    try:
        # 540 s: a healthy-but-cold backend pays ~100-400 s of warmup before
        # answering (CLAUDE.md); a short probe would call a cold tunnel
        # 'down' forever
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices()[0].platform != 'cpu'"],
            capture_output=True, timeout=timeout_s, env=env,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def require_device(probe_timeout_s: float = 420.0, log=None):
    """Single-shot device check with a fast, loud failure path.

    A DEAD tunnel answers probes quickly with a non-zero returncode (observed
    r3: 'backend setup/compile Unavailable' within seconds), while a
    healthy-but-cold backend simply takes long to answer (~100-400 s warmup).
    So: probe each personality ONCE.  Quick failures on both -> SystemExit
    within seconds (no retry loop that could eat a driver budget, VERDICT r3
    weak #2).  A probe that times out is treated as down too — the caller
    cannot afford an unbounded wait.  Returns the initialized device list.
    """
    if log is None:
        log = lambda *a: print(*a, file=sys.stderr, flush=True)

    t0 = time.time()
    platform = None
    if _probe(None, timeout_s=probe_timeout_s):
        platform = None
    elif _probe("tpu", timeout_s=max(30.0, probe_timeout_s - (time.time() - t0))):
        platform = "tpu"
    else:
        log(f"FATAL: no non-CPU backend answered within {time.time()-t0:.0f}s; "
            "tunnel is down — exiting non-zero (no fallback number will be produced)")
        raise SystemExit(3)

    import jax

    if platform is not None:
        jax.config.update("jax_platforms", platform)
    devs = jax.devices()
    log(f"device: {devs[0].platform} {getattr(devs[0], 'device_kind', '')} "
        f"(probe {time.time()-t0:.0f}s)")
    return devs


def wait_for_device(max_wait_s: float = 900.0, log=None):
    """Block until a non-CPU jax backend answers, then initialize it in this
    process (forcing JAX_PLATFORMS=tpu if only the raw plugin recovered).
    Returns the device list; after the budget, proceeds and fails loudly."""
    if log is None:
        log = lambda *a: print(*a, file=sys.stderr, flush=True)

    t0 = time.time()
    delay = 10.0
    platform = None
    while True:
        if _probe(None):
            platform = None
            break
        if _probe("tpu"):
            platform = "tpu"
            break
        if time.time() - t0 > max_wait_s:
            log("device backend still down after budget; proceeding (will fail loudly)")
            break
        log(f"device backend not ready; retrying in {delay:.0f}s")
        time.sleep(delay)
        delay = min(delay * 1.5, 60.0)

    import jax

    if platform is not None:
        jax.config.update("jax_platforms", platform)
    devs = jax.devices()
    log(f"device: {devs[0].platform} {getattr(devs[0], 'device_kind', '')}")
    return devs
