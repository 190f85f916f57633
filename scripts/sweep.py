#!/usr/bin/env python
"""Run a wandb-style sweep (reference sweeps.yaml).

    python scripts/sweep.py --sweep sweeps.yaml [config flags...]

With wandb installed (and --agent, the default, not disabled) this registers
the sweep and runs a real ``wandb.agent``; otherwise it falls back to the
local sequential grid runner.
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

# Must run before any backend touch (multi-host no-op on a single host).
maybe_initialize_distributed()

from probunet_tpu.config import get_config
from probunet_tpu.train.sweep import run_sweep


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sweep", type=str, default="sweeps.yaml")
    parser.add_argument("--out", type=str, default="./results/sweep_results.json")
    parser.add_argument("--agent", type=lambda s: s.lower() in ("1", "true", "yes"),
                        default=True, help="use a wandb agent when wandb is importable")
    parser.add_argument("--count", type=int, default=None,
                        help="max runs for the wandb agent")
    args, rest = parser.parse_known_args()
    cfg = get_config(rest)

    if args.agent:
        try:
            import wandb  # noqa: F401
        except ImportError:
            wandb = None
        if wandb is not None:
            from probunet_tpu.train.sweep import run_wandb_agent
            sweep_id = run_wandb_agent(args.sweep, cfg, count=args.count)
            print("wandb sweep:", sweep_id)
            return

    result = run_sweep(args.sweep, cfg, out_path=args.out)
    print("best:", result["best"])


if __name__ == "__main__":
    main()
