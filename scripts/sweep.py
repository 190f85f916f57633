#!/usr/bin/env python
"""Run a wandb-style grid sweep locally (reference sweeps.yaml).

    python scripts/sweep.py --sweep sweeps.yaml [config flags...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probunet_tpu.config import get_config
from probunet_tpu.train.sweep import run_sweep


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sweep", type=str, default="sweeps.yaml")
    parser.add_argument("--out", type=str, default="./results/sweep_results.json")
    args, rest = parser.parse_known_args()
    cfg = get_config(rest)
    result = run_sweep(args.sweep, cfg, out_path=args.out)
    print("best:", result["best"])


if __name__ == "__main__":
    main()
