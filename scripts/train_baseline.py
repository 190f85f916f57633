#!/usr/bin/env python
"""Deterministic U-Net / LinearCNN / BCSD training (reference baseline/main.py).

    python scripts/train_baseline.py --ds_model deterministic_unet [flags...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probunet_tpu.utils.hostinit import apply_platform_override

# PROBUNET_PLATFORM=cpu forces the host backend (JAX_PLATFORMS is overridden
# by this environment's sitecustomize); must run before any backend touch.
apply_platform_override()

from probunet_tpu.parallel.multihost import maybe_initialize_distributed

# Must run before any backend touch: wires multi-host processes into one
# global mesh when a coordinator is configured; no-op on a single host.
maybe_initialize_distributed()

from probunet_tpu.config import Config, get_config
from probunet_tpu.train.loop import train_baseline


def main():
    synthetic = "--synthetic" in sys.argv
    cfg = get_config()
    if "--ds_model" not in " ".join(sys.argv):
        cfg = cfg.replace(ds_model="deterministic_unet")
    if cfg.ds_model == "probabilistic_unet":
        raise SystemExit("use scripts/train_probunet.py for the probabilistic model")
    if synthetic:
        from probunet_tpu.data.netcdf import discover_files
        from probunet_tpu.data.synthetic import generate_climex_like
        datadir = cfg.datadir if cfg.datadir != Config().datadir else "./data/synthetic_climex"
        try:
            discover_files(datadir, range(cfg.years_train[0], cfg.years_test[1]), cfg.variables)
            have_all = True
        except (FileNotFoundError, OSError):
            have_all = False
        if not have_all:
            print(f"Generating synthetic ClimEx-like data in {datadir}")
            years = range(cfg.years_train[0], cfg.years_test[1])
            generate_climex_like(datadir, years=years,
                                 grid=max(cfg.coords[1], cfg.coords[3]))
        cfg = cfg.replace(datadir=datadir)
    train_baseline(cfg)


if __name__ == "__main__":
    main()
