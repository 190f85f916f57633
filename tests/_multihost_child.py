"""Child driver for the 2-process multi-host parity test.

Runs the REAL production entry path: force the CPU backend, bring the
cluster up through ``maybe_initialize_distributed`` (env-driven, exactly as
scripts/train_probunet.py does), then run ``train_probunet`` from CLI flags.
Each process writes its metrics JSONL via the loop's own primary gating.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from probunet_tpu.parallel.multihost import maybe_initialize_distributed

maybe_initialize_distributed()

from probunet_tpu.config import get_config
from probunet_tpu.train.loop import train_edm, train_probunet


def main():
    cfg = get_config()
    fn = train_edm if cfg.ds_model == "edm" else train_probunet
    res = fn(cfg, make_plots=False)
    print(f"[p{jax.process_index()}] FINAL tr={res['tr_losses']} "
          f"val={res['val_losses']}", flush=True)


if __name__ == "__main__":
    main()
