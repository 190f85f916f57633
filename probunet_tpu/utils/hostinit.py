"""Host-CPU parameter initialization.

Model init is a one-shot, bandwidth-trivial computation; compiling it for the
TPU wastes minutes of XLA time (and is painfully slow behind a remote-compile
tunnel). Run init **eagerly** (unjitted — no XLA compile at all) on the host
CPU backend and ``device_put`` the params; the accelerator then only ever
compiles the training step.

Entry points should call :func:`ensure_cpu_backend` before any other jax use:
changing ``jax_platforms`` after the first backend touch can wedge a remote
platform plugin, so it must happen first.
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax

_checked = False


def apply_platform_override() -> None:
    """Honor ``PROBUNET_PLATFORM`` (e.g. ``cpu``) by updating ``jax_platforms``
    BEFORE the first backend touch. Needed because this environment's
    sitecustomize pre-selects the TPU platform in a way that overrides an
    externally-set ``JAX_PLATFORMS`` env var (NOTES.md #2) — entry scripts
    call this first so ``PROBUNET_PLATFORM=cpu python scripts/...`` reliably
    runs on the host CPU."""
    import os

    plat = os.environ.get("PROBUNET_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)


def ensure_cpu_backend() -> bool:
    """Add 'cpu' to jax_platforms if the config still allows it. Call this
    before any computation / jax.devices() in a process that wants host init.
    Safe no-op if a CPU backend is already reachable."""
    global _checked
    _checked = True
    try:
        jax.devices("cpu")
        return True
    except RuntimeError:
        pass
    try:
        cur = jax.config.jax_platforms
        if cur and "cpu" not in cur:
            jax.config.update("jax_platforms", cur + ",cpu")
        jax.devices("cpu")
        return True
    except Exception:
        return False


def _cpu_device():
    # local_devices, NOT devices: in a multi-process run jax.devices("cpu")[0]
    # is process 0's device — eager dispatch onto a non-addressable device
    # from another process crashes (segfault observed on the 2-process CPU
    # cluster). Every process inits on ITS OWN first CPU device.
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


def init_on_cpu(init_fn: Callable):
    """Run ``init_fn()`` (e.g. a flax ``model.init`` closure, UNJITTED) on the
    host CPU backend when one is available; fall back to the default backend."""
    cpu = _cpu_device()
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        return init_fn()
