#!/usr/bin/env python
"""Probabilistic U-Net end-to-end training (reference main.py equivalent).

    python scripts/train_probunet.py --datadir /path/to/climex [flags...]
    python scripts/train_probunet.py --synthetic          # demo on generated data

All Config fields are flags (see probunet_tpu/config.py).
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
from probunet_tpu.train.loop import train_probunet


def main():
    synthetic = "--synthetic" in sys.argv
    cfg = get_config()
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
    results = train_probunet(cfg)
    print(f"final train loss: {results['tr_losses'][-1]:.4f}  "
          f"val loss: {results['val_losses'][-1]:.4f}  "
          f"throughput: {results['samples_per_sec']:.1f} samples/s")


if __name__ == "__main__":
    main()
