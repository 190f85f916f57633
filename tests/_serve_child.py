"""Child driver for the multi-process serving parity test.

Runs the REAL production serving path: force the CPU backend, bring the
cluster up through ``maybe_initialize_distributed`` (env-driven, exactly as
scripts/downscale.py does), then run ``serve.downscale`` from CLI flags.
Argv: <checkpoint_dir> <out_path> [config flags...].
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from probunet_tpu.parallel.multihost import maybe_initialize_distributed

maybe_initialize_distributed()

from probunet_tpu.config import get_config
from probunet_tpu.serve import downscale


def main():
    ckpt, out = sys.argv[1], sys.argv[2]
    cfg = get_config(sys.argv[3:])
    path = downscale(cfg, ckpt, out, num_samples=3, seed=0)
    print(f"[p{jax.process_index()}] WROTE {path}", flush=True)


if __name__ == "__main__":
    main()
