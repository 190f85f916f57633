"""Host-CPU parameter initialization.

Model init is a one-shot, bandwidth-trivial computation; compiling it for the
TPU wastes minutes of XLA time (and is painfully slow behind a remote-compile
tunnel). Run init on the host CPU backend and ``device_put`` the params — the
accelerator only ever compiles the training step.
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax


def _cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        pass
    try:
        cur = jax.config.jax_platforms
        if cur and "cpu" not in cur:
            jax.config.update("jax_platforms", cur + ",cpu")
        return jax.devices("cpu")[0]
    except Exception:
        return None


def init_on_cpu(init_fn: Callable):
    """Run ``init_fn()`` (e.g. a flax ``model.init`` closure) on the host CPU
    backend when one is available; fall back to the default backend."""
    cpu = _cpu_device()
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        return init_fn()
