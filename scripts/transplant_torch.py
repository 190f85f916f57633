#!/usr/bin/env python
"""Import PyTorch reference weights into this framework.

    python scripts/transplant_torch.py --model probabilistic_unet \
        --state_dict /path/to/model.pt --out ./results/checkpoints/transplanted

Loads a torch ``state_dict`` saved by the reference (baseline/main.py:108 or a
ProbabilisticUNet checkpoint), maps it onto the flax param tree
(OIHW->HWIO etc., see probunet_tpu/utils/transplant.py) and writes an orbax
checkpoint usable with ``--resume`` (optimizer state freshly initialized).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["probabilistic_unet", "deterministic_unet", "unet"],
                   default="probabilistic_unet")
    p.add_argument("--state_dict", required=True)
    p.add_argument("--out", required=True)
    args, rest = p.parse_known_args()

    import torch  # host-side only, to deserialize the checkpoint

    state = torch.load(args.state_dict, map_location="cpu", weights_only=True)
    state = {k: v.numpy() for k, v in state.items()}

    import jax
    from probunet_tpu.utils.transplant import torch_probunet_to_flax, torch_unet_to_flax
    from probunet_tpu.train.checkpoint import save_checkpoint
    from probunet_tpu.train.state import TrainState, make_optimizer

    if args.model == "probabilistic_unet":
        params = torch_probunet_to_flax(state)
    else:
        params = torch_unet_to_flax(state)
    tx = make_optimizer()
    import jax.numpy as jnp
    ts = TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
    path = save_checkpoint(args.out, ts)
    n = sum(int(np.size(x)) for x in jax.tree.leaves(params))
    print(f"transplanted {n:,} params -> {path}")


if __name__ == "__main__":
    main()
