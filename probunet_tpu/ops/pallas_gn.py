"""Pallas TPU kernel: fused GroupNorm + SiLU.

The epilogue named by the project north star (BASELINE.json: "conv+norm+
activation blocks fused via Pallas"). One kernel program per batch element
computes the per-group statistics and applies normalize+affine+SiLU in a
single VMEM round trip — HBM traffic is exactly one read + one write of the
activation, where the unfused XLA path can materialize the normalized
intermediate.

Design notes (see /opt/skills/guides/pallas_guide.md):
- channels-last layout: C rides the 128-wide lane dimension; the (H*W, C)
  row-sum reduction vectorizes on the VPU;
- group statistics are computed on the (C,) column-sum vector (G = min(32,
  C//4) groups are sub-lane — reducing the small vector is cheap; reducing
  (H*W, G, C/G) directly would fight the tiling);
- all statistics in fp32 regardless of activation dtype;
- backward uses the standard GN gradient identity in plain XLA with saved
  (mean, rstd) — stats are not recomputed.

Falls back to the XLA implementation (ops.norm.group_norm_silu) when the
per-item activation doesn't fit VMEM or when not running on TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except ImportError:  # pragma: no cover
    HAS_PALLAS = False

from probunet_tpu.ops.norm import group_norm_silu as _xla_gn_silu

# per-invocation VMEM budget (bytes). The estimate below (see _vmem_estimate)
# models in/out double buffering + the fp32 working copies; the hardware
# scoped limit is 16 MB, measured real usage ≈ 0.85x the estimate, so 12 MB
# keeps real allocations comfortably under the limit.
_VMEM_BUDGET = 12 * 1024 * 1024


def _vmem_estimate(hw: int, c_blk: int, itemsize: int) -> int:
    # in + out double-buffered (2x2 each) + fp32 x/y temps (4+4+4)
    return hw * c_blk * (4 * itemsize + 12)


def _split_factor(h: int, w: int, c: int, groups: int, itemsize: int) -> int:
    """Channel-block split for large activations: GroupNorm statistics are
    independent per group, so blocks covering whole groups can normalize
    independently — grid (B, k) with c/k channels (and groups/k groups) per
    invocation. Returns the smallest power-of-2 k whose blocks fit the VMEM
    budget, requiring c/k to stay lane-aligned (multiple of 128) and k to
    divide groups. k=1 when no split is needed; the caller falls back to XLA
    when even the best split doesn't fit (e.g. c too small to halve)."""
    hw = h * w
    k = 1
    while _vmem_estimate(hw, c // k, itemsize) > _VMEM_BUDGET:
        nk = k * 2
        if groups % nk or (c // nk) % 128:
            break
        k = nk
    return k


def _kernel(x_ref, w_ref, b_ref, o_ref, mean_ref, rstd_ref, *, groups: int, eps: float):
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    hw = h * w
    cg = c // groups
    x = x_ref[0].reshape(hw, c).astype(jnp.float32)

    # Group reduce/broadcast as matmuls with a 0/1 channel->group indicator
    # (Mosaic has no sub-lane (C,)->(G,C/G) reshape; the MXU does it for free).
    cidx = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m_cg = (cidx // cg == gidx).astype(jnp.float32)          # (C, G)
    gidx2 = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 0)
    cidx2 = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 1)
    m_gc = (cidx2 // cg == gidx2).astype(jnp.float32)        # (G, C)

    colsum = jnp.sum(x, axis=0, keepdims=True)               # (1, C)
    colsumsq = jnp.sum(x * x, axis=0, keepdims=True)         # (1, C)
    hi = jax.lax.Precision.HIGHEST
    gsum = jnp.dot(colsum, m_cg, precision=hi, preferred_element_type=jnp.float32)  # (1, G)
    gsumsq = jnp.dot(colsumsq, m_cg, precision=hi, preferred_element_type=jnp.float32)
    n = float(hw * cg)
    mean_g = gsum / n
    var_g = gsumsq / n - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)

    mean_c = jnp.dot(mean_g, m_gc, precision=hi, preferred_element_type=jnp.float32)  # (1, C)
    rstd_c = jnp.dot(rstd_g, m_gc, precision=hi, preferred_element_type=jnp.float32)
    gamma = w_ref[...].astype(jnp.float32)                   # (1, C)
    beta = b_ref[...].astype(jnp.float32)

    y = (x - mean_c) * rstd_c * gamma + beta
    out = y * jax.nn.sigmoid(y)
    o_ref[0] = out.reshape(h, w, c).astype(o_ref.dtype)
    mean_ref[0, 0] = mean_g
    rstd_ref[0, 0] = rstd_g


def _forward_pallas(x, weight, bias, groups: int, eps: float, interpret: bool = False):
    b, h, w, c = x.shape
    k = _split_factor(h, w, c, groups, np.dtype(x.dtype).itemsize)
    c_blk, g_blk = c // k, groups // k
    kernel = functools.partial(_kernel, groups=g_blk, eps=eps)
    out, mean, rstd = pl.pallas_call(
        kernel,
        grid=(b, k),
        in_specs=[
            pl.BlockSpec((1, h, w, c_blk), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_blk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_blk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w, c_blk), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            # stats laid out (B, k, 1, g_blk) so every block equals the array
            # dims in the last two axes (Mosaic tiling rule; NOTES.md)
            pl.BlockSpec((1, 1, 1, g_blk), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, g_blk), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((b, k, 1, g_blk), jnp.float32),
            jax.ShapeDtypeStruct((b, k, 1, g_blk), jnp.float32),
        ],
        interpret=interpret,
    )(x, weight.reshape(1, c), bias.reshape(1, c))
    return out, mean.reshape(b, groups), rstd.reshape(b, groups)


def _fits_vmem(shape, dtype, groups: int) -> bool:
    _, h, w, c = shape
    k = _split_factor(h, w, c, groups, np.dtype(dtype).itemsize)
    return _vmem_estimate(h * w, c // k, np.dtype(dtype).itemsize) <= _VMEM_BUDGET


def _on_tpu(x=None) -> bool:
    """True only when this computation will actually run on a TPU: honors a
    jax.default_device(cpu) context (host-side eager init) and concrete
    array placement, not just the process-default backend."""
    try:
        dd = jax.config.jax_default_device
        if dd is not None:
            return getattr(dd, "platform", "") == "tpu"
        if x is not None and isinstance(x, jax.Array) and not isinstance(x, jax.core.Tracer):
            return next(iter(x.devices())).platform == "tpu"
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gn_silu(x, weight, bias, groups: int, eps: float = 1e-5, force: str = "auto"):
    """Fused GroupNorm+SiLU. force: 'auto' | 'pallas' | 'xla' | 'interpret'."""
    out, _, _ = _gn_silu_fwd_impl(x, weight, bias, groups, eps, force)
    return out


def _gn_silu_fwd_impl(x, weight, bias, groups, eps, force):
    import os

    if force == "auto" and (os.environ.get("PROBUNET_DISABLE_PALLAS")
                            or os.environ.get("PROBUNET_DISABLE_PALLAS_GN")):
        force = "xla"
    use_pallas = (
        force in ("pallas", "interpret")
        or (force == "auto" and HAS_PALLAS and _on_tpu(x)
            and _fits_vmem(x.shape, x.dtype, groups))
    )
    if use_pallas and HAS_PALLAS:
        return _forward_pallas(x, weight, bias, groups, eps,
                               interpret=(force == "interpret"))
    # XLA fallback (also computes saved stats for the shared backward)
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3))
    var = jnp.mean(jnp.square(xf), axis=(1, 3)) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    rstd_c = jnp.repeat(rstd, c // groups, axis=1)
    y = ((x.astype(jnp.float32).reshape(b, h * w, c) - mean_c[:, None, :])
         * rstd_c[:, None, :] * weight.astype(jnp.float32)[None, None, :]
         + bias.astype(jnp.float32)[None, None, :])
    out = (y * jax.nn.sigmoid(y)).reshape(b, h, w, c).astype(x.dtype)
    return out, mean, rstd


def _gn_silu_fwd(x, weight, bias, groups, eps, force):
    out, mean, rstd = _gn_silu_fwd_impl(x, weight, bias, groups, eps, force)
    return out, (x, weight, bias, mean, rstd)


def _gn_silu_bwd(groups, eps, force, res, g):
    x, weight, bias, mean, rstd = res
    b, h, w, c = x.shape
    cg = c // groups
    n = h * w * cg

    xf = x.astype(jnp.float32).reshape(b, h * w, c)
    gf = g.astype(jnp.float32).reshape(b, h * w, c)
    mean_c = jnp.repeat(mean, cg, axis=1)[:, None, :]
    rstd_c = jnp.repeat(rstd, cg, axis=1)[:, None, :]
    xhat = (xf - mean_c) * rstd_c
    wf = weight.astype(jnp.float32)[None, None, :]
    bf = bias.astype(jnp.float32)[None, None, :]
    y = xhat * wf + bf

    sig = jax.nn.sigmoid(y)
    dsilu = sig * (1 + y * (1 - sig))          # d silu(y)/dy
    dy = gf * dsilu

    dweight = jnp.sum(dy * xhat, axis=(0, 1)).astype(weight.dtype)
    dbias = jnp.sum(dy, axis=(0, 1)).astype(bias.dtype)

    dxhat = dy * wf
    # group means of dxhat and dxhat*xhat
    dxhat_g = dxhat.reshape(b, h * w, groups, cg)
    m1 = dxhat_g.mean(axis=(1, 3))             # (B, G)
    m2 = (dxhat_g * xhat.reshape(b, h * w, groups, cg)).mean(axis=(1, 3))
    m1_c = jnp.repeat(m1, cg, axis=1)[:, None, :]
    m2_c = jnp.repeat(m2, cg, axis=1)[:, None, :]
    dx = rstd_c * (dxhat - m1_c - xhat * m2_c)
    del n
    return dx.reshape(b, h, w, c).astype(x.dtype), dweight, dbias


gn_silu.defvjp(_gn_silu_fwd, _gn_silu_bwd)
