"""LR/HR pair synthesis and standardization as pure, jittable NHWC functions.

This is the model contract of the reference (climex_utils.py:122-211):

    input  = standardized bilinear-upsampled LR          (lrinterp_stand)
    target = standardized residual hr_stand - lrinterp_stand
    hr_pred = lrinterp + invstand(residual_pred)

with four standardization modes computed from the *same split's* LR data:

    none | perpixel | pertimestep | minmax    (climex_utils.py:139-194)

TPU-first delta: the reference does this per-item on the CPU inside
``__getitem__`` every epoch (its data-path hot spot); here it's batched device
math that fuses into the training step. Statistics are computed once, eagerly,
as explicit arrays (no lazy first-``__getitem__`` mutation), with torch's
conventions kept: unbiased std (ddof=1), eps=1e-10 added to std (or to
max-min) at use time.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from probunet_tpu.ops.resample import avg_pool, bilinear_upsample

EPSILON = 1e-10  # reference climex_utils.py:70

Stats = Tuple[jax.Array, jax.Array]


def compute_lr_stats(hr: jax.Array, lowres_scale: int, standardization: str) -> Optional[Stats]:
    """Standardization statistics from the LR (avg-pooled HR) data
    (reference climex_utils.py:167-194).

    hr: (T, H, W, C). Returns a pair of arrays whose shapes depend on mode:
      perpixel     -> ((H, W, C) mean, (H, W, C) std), LR stats repeated to HR grid
      pertimestep  -> ((T, 1, 1, C) mean, (T, 1, 1, C) std)
      minmax       -> ((T, 1, 1, C) min, (T, 1, 1, C) max)
      none         -> None
    """
    if standardization == "none":
        return None
    lr = avg_pool(hr, lowres_scale)
    if standardization == "perpixel":
        mean = lr.mean(axis=0)
        std = lr.std(axis=0, ddof=1)  # torch std is unbiased (climex_utils.py:174)
        s = lowres_scale
        mean_hr = jnp.repeat(jnp.repeat(mean, s, axis=0), s, axis=1)
        std_hr = jnp.repeat(jnp.repeat(std, s, axis=0), s, axis=1)
        return mean_hr, std_hr
    if standardization == "pertimestep":
        mean = lr.mean(axis=(1, 2), keepdims=True)
        std = lr.std(axis=(1, 2), ddof=1, keepdims=True)
        return mean, std
    if standardization == "minmax":
        lo = lr.min(axis=(1, 2), keepdims=True)
        hi = lr.max(axis=(1, 2), keepdims=True)
        return lo, hi
    raise ValueError(f"unknown standardization {standardization!r}")


def _scale_of(stats: Stats, standardization: str) -> jax.Array:
    """The denominator of the standardization (std+eps or max-min+eps)."""
    if standardization == "minmax":
        return stats[1] - stats[0] + EPSILON
    return stats[1] + EPSILON


def make_pair(
    hr: jax.Array,
    lowres_scale: int,
    standardization: str,
    stats: Optional[Stats],
) -> Dict[str, jax.Array]:
    """Synthesize one batch of training pairs from HR tiles (NHWC batch).

    Mirrors reference ``__getitem__`` (climex_utils.py:122-164). ``stats`` must
    already be sliced per-sample for pertimestep/minmax modes (leading axis B).
    Returns dict with inputs/targets/hr/lr/lrinterp (+ stand_stats passthrough).
    """
    lr = avg_pool(hr, lowres_scale)
    lrinterp = bilinear_upsample(lr, lowres_scale)
    if standardization == "none":
        inputs, targets = lrinterp, hr - lrinterp
        stand_stats = None
    else:
        offset = stats[0]
        scale = _scale_of(stats, standardization)
        inputs = (lrinterp - offset) / scale
        targets = (hr - lrinterp) / scale  # hr_stand - lrinterp_stand, same denominator
        stand_stats = stats
    return {
        "inputs": inputs,
        "targets": targets,
        "hr": hr,
        "lr": lr,
        "lrinterp": lrinterp,
        "stand_stats": stand_stats,
    }


def invstand_residual(residual: jax.Array, standardization: str, stats: Optional[Stats]) -> jax.Array:
    """Inverse standardization for the residual (climex_utils.py:198-204)."""
    if standardization == "none":
        return residual
    return residual * _scale_of(stats, standardization)


def residual_to_hr(
    residual: jax.Array,
    lrinterp: jax.Array,
    standardization: str,
    stats: Optional[Stats],
) -> jax.Array:
    """Predicted residual -> physical HR field (climex_utils.py:207-211)."""
    return lrinterp + invstand_residual(residual, standardization, stats)


def slice_stats(stats: Optional[Stats], standardization: str, idx: jax.Array) -> Optional[Stats]:
    """Per-sample stats for a batch index vector (no-op for global modes)."""
    if stats is None or standardization == "perpixel":
        return stats
    return (stats[0][idx], stats[1][idx])


def time_features(timestamps_ns: jax.Array, timetransform: str = "id") -> jax.Array:
    """Time features for the deterministic baselines' class_labels path
    (train.steps.make_deterministic_train_step/eval_step). The reference
    stores a ``time_transform`` knob but never applies it and passes raw
    timestamps as class_labels (climex_utils.py:68, trainmodel.py:157); here
    'id' passes float days — inert at label_dim=0, matching the reference —
    and 'cyclic' returns (sin, cos) of the annual phase, which is LIVE when
    the loop builds the baseline U-Net with label_dim=2 (--timetransform
    cyclic)."""
    days = timestamps_ns / (1e9 * 86400.0)
    if timetransform == "id":
        return days[:, None]
    if timetransform == "cyclic":
        phase = 2 * jnp.pi * (days % 365.0) / 365.0
        return jnp.stack([jnp.sin(phase), jnp.cos(phase)], axis=-1)
    raise ValueError(f"unknown timetransform {timetransform!r}")
