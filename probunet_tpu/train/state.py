"""Training state and optimizer construction.

The optimizer is optax AdamW configured to match ``torch.optim.AdamW``
defaults used by the reference (train_prob_unet_model.py:39: lr=1e-3,
betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-2, decoupled decay applied to
every parameter). Gradient accumulation wraps the optimizer in
``optax.MultiSteps`` — the reference's ``accum`` knob exists but is inert
(train_prob_unet_model.py:89-92); here it works.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar


def make_optimizer(
    lr: float = 1e-3,
    weight_decay: float = 0.01,
    accum: int = 1,
    optimizer: str = "adamw",
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    if optimizer == "adamw":
        tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)
    elif optimizer == "adam":
        tx = optax.adam(lr)
    elif optimizer == "sgd":
        tx = optax.sgd(lr)
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if accum and accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    import jax.numpy as jnp

    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
