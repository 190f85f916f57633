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
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar


def _scale_by_adam_bf16_state(b1=0.9, b2=0.999, eps=1e-8) -> optax.GradientTransformation:
    """Adam with the first moment stored in bfloat16 (math in fp32).

    Production bandwidth mode: the optimizer update is HBM-bandwidth-bound
    (measured: fp32 AdamW over 104M params = 8.2 ms = exactly the 7-pass
    traffic at this chip's 363 GB/s streaming rate, BASELINE_MEASURED.md).
    mu's per-step increment is ~10% of its magnitude — safe to round to bf16;
    nu's is ~0.1%, BELOW bf16's 2^-8 resolution, so nu stays fp32 (bf16 nu
    measurably stalls convergence — see tests). Incoming gradients are also
    taken in bf16 (XLA fuses the cast into the producing matmuls, halving the
    gradient write+read). Deviates from torch AdamW numerics — keep the
    default fp32 path for reference-parity training.
    """

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.bfloat16), params),
            nu=jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params))

    def update(grads, state, params=None):
        del params
        f32 = jnp.float32
        mu = jax.tree.map(
            lambda m, g: (b1 * m.astype(f32) + (1 - b1) * g.astype(f32)).astype(jnp.bfloat16),
            state.mu, grads)
        nu = jax.tree.map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g.astype(f32)),
            state.nu, grads)
        count = state.count + 1
        bc1 = 1 - b1 ** count.astype(f32)
        bc2 = 1 - b2 ** count.astype(f32)
        updates = jax.tree.map(
            lambda m, v: (m.astype(f32) / bc1) / (jnp.sqrt(v / bc2) + eps),
            mu, nu)
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def _cast_grads(dtype) -> optax.GradientTransformation:
    return optax.GradientTransformation(
        lambda params: optax.EmptyState(),
        lambda g, state, params=None: (jax.tree.map(lambda x: x.astype(dtype), g), state))


def make_optimizer(
    lr: float = 1e-3,
    weight_decay: float = 0.01,
    accum: int = 1,
    optimizer: str = "adamw",
    grad_clip: Optional[float] = None,
    state_dtype: str = "float32",
) -> optax.GradientTransformation:
    """torch-parity AdamW by default; ``state_dtype='bfloat16'`` selects the
    bandwidth-optimized production variant (bf16 m/v/grads, fp32 math)."""
    if optimizer == "adamw" and state_dtype == "bfloat16":
        tx = optax.chain(
            _cast_grads(jnp.bfloat16),
            _scale_by_adam_bf16_state(),
            optax.add_decayed_weights(weight_decay),
            optax.scale(-lr),
        )
    elif optimizer == "adamw":
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
