"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the multi-chip stand-in mechanism (SURVEY.md §4): sharding tests get 8
XLA host-platform devices without real TPU hardware. Note: the environment's
``sitecustomize`` may pre-import jax with a TPU backend selected via
``JAX_PLATFORMS``; ``jax.config.update`` after import still re-selects the
backend as long as no computation has run, so we force CPU here.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: repeat test runs skip CPU XLA compiles.
_cache = os.path.expanduser("~/.cache/jax_probunet_tests")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


import pytest  # noqa: E402


@pytest.fixture(scope="session")
def datadir_small(tmp_path_factory):
    """Shared tiny synthetic ClimEx dataset (16x16 grid, 16 days/year,
    3 years) for fast driver-lifecycle tests."""
    from probunet_tpu.data.synthetic import generate_climex_like

    d = tmp_path_factory.mktemp("climex_small")
    generate_climex_like(str(d), years=(2000, 2001, 2002), grid=16,
                         days_per_year=16)
    return str(d)
