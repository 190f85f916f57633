"""Pallas TPU kernel: fused self-attention for the ADM U-Net blocks.

The reference's AttentionOp (networks.py:112-125) materializes the attention
weights ``softmax(Q^T K / sqrt(c))`` as a full (B, heads, L, L) tensor; at the
bench config (128x128 tiles) the 32x32-resolution blocks carry L=1024 and the
weights tensor alone is ~100 MB per direction per block — the single largest
HBM-traffic item the ablation found (scripts/ablate_perf.py: level attention
= 17% of the step). This kernel computes QK^T -> fp32 softmax -> PV per
(batch, head) program entirely in VMEM, so the weights never touch HBM; the
custom VJP recomputes them in row chunks (flash-attention style) instead of
saving them.

Numerics:
- ``fast=False`` (reference parity): Q, K promoted to fp32, HIGHEST-precision
  QK^T, fp32 softmax — the reference's fp32 AttentionOp contract
  (networks.py:112-125). The PV product runs at the model compute dtype with
  HIGHEST precision (a no-op for bf16, honest fp32 for f32 compute), exactly
  like the reference's model-dtype PV einsum (networks.py:183) and the
  unfused fallback.
- ``fast=True`` (production): bf16 QK^T/PV inputs with fp32 MXU accumulation,
  fp32 softmax — the bf16 fast path of ``layers.attention_weights`` but
  *more* accurate (the unfused path rounds the logits to bf16 in HBM).

Layout: channels-last (B, L, heads, ch) with ch=64 — heads ride the grid, ch
rides the lanes, L rides the sublanes. Falls back to the unfused XLA path off
TPU or for shapes the kernel doesn't cover (L not a multiple of the row chunk).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except ImportError:  # pragma: no cover
    HAS_PALLAS = False


_ROW_CHUNK = 256  # backward-pass q-row tile (VMEM: chunk x L fp32 intermediates)


def _prep(q, k, scale, fast):
    """Apply the reference's scaling/cast policy to the logits operands.

    NOTE for anyone microbenchmarking this kernel: the FIRST pallas timing
    window in a process reads ~10x slow (a per-process warmup artifact of
    this runtime, ~9 ms/call during the first ~50-call window; the identical
    executable timed later in the same process runs at full speed). Always
    interleave/repeat measurements — see NOTES.md."""
    if fast:
        return q, (k * scale).astype(q.dtype)
    return q.astype(jnp.float32), k.astype(jnp.float32) * scale


def _logits(q2, k2, fast):
    """(Lq, c) x (Lk, c) -> (Lq, Lk) fp32 logits."""
    prec = None if fast else jax.lax.Precision.HIGHEST
    return jax.lax.dot_general(
        q2, k2, (((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, fast):
    """One q-row chunk against the full K/V (K/V are small — L x 64 — so no
    online-softmax bookkeeping is needed even at L=4096; only the (rows, L)
    logits are chunked)."""
    q2, k2 = _prep(q_ref[0], k_ref[0], scale, fast)
    s = _logits(q2, k2, fast)
    p = jax.nn.softmax(s, axis=-1)
    v = v_ref[0]
    # PV runs at the model compute dtype in BOTH modes — the reference's fp32
    # contract covers only QK^T + softmax (AttentionOp, networks.py:112-125);
    # its PV einsum runs at model dtype (networks.py:183). This matches the
    # _xla_attention fallback exactly (w.astype(q.dtype) then PV) and is ~6x
    # cheaper on bf16 runs than the fp32 6-pass PV the kernel used before.
    # HIGHEST is a no-op on bf16 operands and keeps f32 compute honest.
    p = p.astype(v.dtype)
    # Mosaic rejects an fp32 contract_precision on bf16 operands, so HIGHEST
    # is applied only when PV really runs in f32 (f32 compute dtype)
    pv_prec = jax.lax.Precision.HIGHEST if (not fast and v.dtype == jnp.float32) else None
    out = jnp.dot(p, v, precision=pv_prec, preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale, fast):
    ci = pl.program_id(1)
    prec = None if fast else jax.lax.Precision.HIGHEST

    @pl.when(ci == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q2, k2 = _prep(q_ref[0], k_ref[0], scale, fast)   # q2: (CHUNK, c), k2: (L, c)
    s = _logits(q2, k2, fast)                          # (CHUNK, L) fp32
    p = jax.nn.softmax(s, axis=-1)                     # fp32

    v = v_ref[0]
    do = do_ref[0]
    # gradients THROUGH the model-dtype PV stay in that dtype (see the fwd
    # kernel note); only the dq/dk legs below, which differentiate the fp32
    # HIGHEST logits, stay fp32 in strict mode
    vf = v
    dof = do
    pc = p.astype(vf.dtype)

    # dV += P^T dO ; dP = dO V^T ; dS = P * (dP - rowsum(dP*P)) ;
    # dQ = dS K * scale ; dK += dS^T Q * scale
    # dv/dp differentiate the model-dtype PV: HIGHEST only when that's f32
    # (Mosaic rejects fp32 contract_precision on bf16 operands)
    pv_prec = (jax.lax.Precision.HIGHEST
               if (not fast and vf.dtype == jnp.float32) else None)
    dv = jax.lax.dot_general(pc, dof, (((0,), (0,)), ((), ())),
                             precision=pv_prec, preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(dof, vf, (((1,), (1,)), ((), ())),
                             precision=pv_prec, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # fp32 (CHUNK, L)
    dsc = ds.astype(q_ref.dtype) if fast else ds
    kq = k_ref[0] if fast else k_ref[0].astype(jnp.float32)
    qq = q_ref[0] if fast else q_ref[0].astype(jnp.float32)
    dq = jnp.dot(dsc, kq, precision=prec,
                 preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(dsc, qq, (((0,), (0,)), ((), ())),
                             precision=prec, preferred_element_type=jnp.float32) * scale

    dq_ref[0] = dq
    dk_ref[0] = dk_ref[0] + dk
    dv_ref[0] = dv_ref[0] + dv


def _to_bh(a):
    """(B, L, NH, ch) -> (B*NH, L, ch). Mosaic requires the block's trailing
    dims to equal the array dims (ch=64 can't ride a 128-lane block of a
    packed NH*ch axis), so heads move to the leading/grid axis."""
    b, L, nh, ch = a.shape
    return jnp.transpose(a, (0, 2, 1, 3)).reshape(b * nh, L, ch)


def _from_bh(a, b, nh):
    bh, L, ch = a.shape
    return jnp.transpose(a.reshape(b, nh, L, ch), (0, 2, 1, 3))


def _fwd_pallas(q, k, v, fast, interpret=False):
    b, L, nh, ch = q.shape
    scale = 1.0 / np.sqrt(ch)
    chunk = min(_ROW_CHUNK, L)
    nc = L // chunk
    q3, k3, v3 = (_to_bh(a) for a in (q, k, v))
    kern = functools.partial(_fwd_kernel, scale=scale, fast=fast)
    full = pl.BlockSpec((1, L, ch), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM)
    rows = pl.BlockSpec((1, chunk, ch), lambda i, c: (i, c, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b * nh, nc),
        in_specs=[rows, full, full],
        out_specs=rows,
        out_shape=jax.ShapeDtypeStruct((b * nh, L, ch), q.dtype),
        interpret=interpret,
    )(q3, k3, v3)
    return _from_bh(out, b, nh)


def _bwd_pallas(q, k, v, do, fast, interpret=False):
    b, L, nh, ch = q.shape
    scale = 1.0 / np.sqrt(ch)
    chunk = min(_ROW_CHUNK, L)
    nc = L // chunk
    q3, k3, v3, do3 = (_to_bh(a) for a in (q, k, v, do))
    kern = functools.partial(_bwd_kernel, scale=scale, fast=fast)
    full = pl.BlockSpec((1, L, ch), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM)
    rows = pl.BlockSpec((1, chunk, ch), lambda i, c: (i, c, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(b * nh, nc),
        in_specs=[rows, full, full, rows],
        out_specs=[rows, full, full],
        out_shape=[jax.ShapeDtypeStruct((b * nh, L, ch), jnp.float32)] * 3,
        interpret=interpret,
    )(q3, k3, v3, do3)
    return (_from_bh(dq, b, nh).astype(q.dtype),
            _from_bh(dk, b, nh).astype(k.dtype),
            _from_bh(dv, b, nh).astype(v.dtype))


def _xla_attention(q, k, v, fast):
    """Unfused fallback — identical math to layers.attention_weights + PV.

    The strict QK^T einsum needs HIGHEST precision explicitly: a default-
    precision f32 einsum is a single bf16 MXU pass on TPU, which would
    silently break the fp32 AttentionOp contract (networks.py:112-125)."""
    c = k.shape[-1]
    if fast:
        w = jnp.einsum("bqhc,bkhc->bhqk", q, (k / np.sqrt(c)).astype(q.dtype))
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(q.dtype)
    else:
        w = jnp.einsum("bqhc,bkhc->bhqk", q.astype(jnp.float32),
                       (k / np.sqrt(c)).astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
        w = jax.nn.softmax(w, axis=-1).astype(q.dtype)
    # HIGHEST: no-op for bf16 operands, honest fp32 for f32 compute
    return jnp.einsum("bhqk,bkhc->bqhc", w, v,
                      precision=jax.lax.Precision.HIGHEST)


def _kernel_ok(q) -> bool:
    b, L, nh, ch = q.shape
    if ch % 8 or L % 8:
        return False
    if L > _ROW_CHUNK and L % _ROW_CHUNK:
        return False
    # per-program VMEM: full K/V (+O chunk etc.) + (chunk, L) fp32 logits+probs
    chunk = min(_ROW_CHUNK, L)
    need = 4 * L * ch * q.dtype.itemsize + 2 * chunk * L * 4
    return need <= 6 * 1024 * 1024  # leave room for double buffering


def _on_tpu(x=None) -> bool:
    from probunet_tpu.ops.pallas_gn import _on_tpu as impl
    return impl(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q, k, v, fast: bool = False, force: str = "auto"):
    """softmax(Q K^T / sqrt(ch)) V without materializing the weights in HBM.

    q, k, v: (B, L, heads, ch) — the UNetBlock layout. Returns (B, L, heads, ch).
    force: 'auto' | 'pallas' | 'xla' | 'interpret'.
    """
    return _fused_fwd_impl(q, k, v, fast, force)[0]


def _use_pallas(q, force) -> bool:
    import os

    if force == "auto" and (os.environ.get("PROBUNET_DISABLE_PALLAS")
                            or os.environ.get("PROBUNET_DISABLE_PALLAS_ATTN")):
        force = "xla"
    return (force in ("pallas", "interpret")
            or (force == "auto" and HAS_PALLAS and _on_tpu(q) and _kernel_ok(q)))


def _fused_fwd_impl(q, k, v, fast, force):
    if _use_pallas(q, force):
        return _fwd_pallas(q, k, v, fast, interpret=(force == "interpret")), True
    return _xla_attention(q, k, v, fast), False


def _fused_fwd(q, k, v, fast, force):
    out, _ = _fused_fwd_impl(q, k, v, fast, force)
    return out, (q, k, v)


def _fused_bwd(fast, force, res, g):
    q, k, v = res
    if _use_pallas(q, force):
        return _bwd_pallas(q, k, v, g, fast, interpret=(force == "interpret"))
    # XLA fallback backward: differentiate the unfused math
    _, vjp = jax.vjp(lambda a, b, c: _xla_attention(a, b, c, fast), q, k, v)
    return vjp(g)


fused_attention.defvjp(_fused_fwd, _fused_bwd)
