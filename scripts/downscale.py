#!/usr/bin/env python
"""Serving CLI: checkpoint -> downscaled ensemble netCDF.

    python scripts/downscale.py --checkpoint ./results/checkpoints/probunet \
        --out ./results/downscaled.nc --num_samples 16 [config flags...]

    # diffusion (EDM Heun) ensembles from a ds_model=edm checkpoint:
    python scripts/downscale.py --checkpoint ./results/checkpoints/edm \
        --ds_model edm --edm_steps 18 --out ./results/downscaled.nc
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probunet_tpu.utils.hostinit import apply_platform_override

# PROBUNET_PLATFORM=cpu forces the host backend (JAX_PLATFORMS is overridden
# by this environment's sitecustomize); must run before any backend touch.
apply_platform_override()

from probunet_tpu.parallel.multihost import maybe_initialize_distributed

# Must run before any backend touch: multi-process serving shards the batch
# ranges over processes (each writes its time slice; primary merges); no-op
# on a single host.
maybe_initialize_distributed()

from probunet_tpu.config import get_config
from probunet_tpu.serve import downscale


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", default="./results/downscaled.nc")
    p.add_argument("--nc_compression", default="gzip",
                   choices=("gzip", "lzf", "none"),
                   help="gzip = netCDF-standard (but write-bound on one host "
                        "core); none/lzf = compute-bound serving")
    p.add_argument("--pack", action="append", default=None,
                   metavar="VAR=LO:HI",
                   help="CF int16 packing range per variable (repeatable; "
                        "must cover every output variable), e.g. "
                        "--pack pr=0:0.02 --pack tasmin=180:330 "
                        "--pack tasmax=180:330. Halves the device->host "
                        "transfer and the archive size; values outside clip")
    args, rest = p.parse_known_args()
    cfg = get_config(rest)
    pack_ranges = None
    if args.pack:
        pack_ranges = {}
        for spec in args.pack:
            var, rng = spec.split("=", 1)
            lo, hi = rng.split(":", 1)
            pack_ranges[var] = (float(lo), float(hi))
    path = downscale(cfg, args.checkpoint, args.out,
                     compression=args.nc_compression,
                     pack_ranges=pack_ranges)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
