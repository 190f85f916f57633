"""Jitted train/eval/sample steps — one XLA program per step.

Each training step fuses the ENTIRE per-step pipeline into a single compiled
program: gather the HR batch from the device-resident dataset tensor, LR/HR
pair synthesis + standardization, ELBO forward, backward, and the AdamW
update. The reference performs the data transform per-item on the host CPU
(climex_utils.py:122-164) and the optimizer step in eager torch
(train_prob_unet_model.py:85-92); fusing it all is the main throughput lever
on TPU (BASELINE.md north star).

Factory functions close over static configuration and return jit-compiled
callables. Donation of the train state avoids a params-sized copy per step.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from probunet_tpu.data import transforms
from probunet_tpu.data.units import k_to_c, kgm2s_to_mmday
from probunet_tpu.train.state import TrainState


def beta_schedule(schedule: str, beta: float, warmup_steps: int = 0) -> Callable[[jax.Array], jax.Array]:
    """KL-weight schedule (BASELINE config #4 'beta-annealed KL').

    const  : beta
    linear : 0 -> beta over warmup_steps, then beta
    cyclic : sawtooth 0 -> beta every warmup_steps (cyclical annealing)
    """
    def fn(step: jax.Array) -> jax.Array:
        s = step.astype(jnp.float32)
        if schedule == "const" or warmup_steps <= 0:
            return jnp.float32(beta)
        if schedule == "linear":
            return beta * jnp.minimum(s / warmup_steps, 1.0)
        if schedule == "cyclic":
            return beta * jnp.minimum((s % warmup_steps) / (0.5 * warmup_steps), 1.0)
        raise ValueError(f"unknown beta schedule {schedule!r}")
    return fn


def _split_rngs(rng: jax.Array, step: jax.Array):
    r = jax.random.fold_in(rng, step)
    r_latent, r_dropout = jax.random.split(r)
    return {"latent": r_latent, "dropout": r_dropout}


def _leaf_name(key_path) -> str:
    out = []
    for k in key_path:
        out.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return ".".join(out)


def _grad_leaf_norms(grads) -> dict:
    """Per-layer L2 gradient norms under 'gradnorm/<path>' keys — the
    gradient half of the reference's ``wandb.watch(model)`` observability
    (baseline/main.py:57-58). Computed in-program (one extra pass over the
    gradient tree); the loops log them at --watch_every cadence."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    return {f"gradnorm/{_leaf_name(kp)}":
            jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
            for kp, g in flat}


def _probunet_step_body(model, tx, lowres_scale: int, standardization: str,
                        beta_fn: Optional[Callable], compute_dtype, accum: int = 1,
                        watch: bool = False):
    """Unjitted single-step body shared by the per-step and scanned variants.

    Accumulation semantics: ``state.step`` counts MICRO-steps (it increments on
    every call even when optax.MultiSteps is only accumulating), so the β
    schedule is driven by the *optimizer* step ``state.step // accum`` — all
    micro-steps of one accumulation window see the same β, and
    ``beta_warmup_steps`` means optimizer updates regardless of ``accum``. The
    RNG fold stays on the micro-step so each micro-batch draws distinct
    latent/dropout noise."""
    beta_fn = beta_fn or (lambda step: jnp.float32(model.beta))
    accum = max(1, int(accum))

    def step(state: TrainState, hr_all, stats, idx, rng):
        hr = hr_all[idx]
        sl = transforms.slice_stats(stats, standardization, idx)
        pair = transforms.make_pair(hr, lowres_scale, standardization, sl)
        x = pair["inputs"].astype(compute_dtype)
        y = pair["targets"].astype(compute_dtype)
        beta = beta_fn(state.step // accum)
        rngs = _split_rngs(rng, state.step)

        def loss_fn(params):
            total, recon, kl = model.apply(
                {"params": params}, x, y, beta, train=True, rngs=rngs, method=model.elbo)
            return total, (recon, kl)

        (total, (recon, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u.astype(p.dtype), state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        metrics = {"train_loss": total, "recon_loss": recon, "kl_div": kl, "beta": beta,
                   "grad_norm": optax.global_norm(grads)}
        if watch:
            metrics.update(_grad_leaf_norms(grads))
        return new_state, metrics

    return step


def make_probunet_train_step(
    model,
    tx,
    lowres_scale: int,
    standardization: str,
    beta_fn: Optional[Callable] = None,
    compute_dtype=jnp.float32,
    donate: bool = True,
    accum: int = 1,
    watch: bool = False,
):
    """Returns step(state, hr_all, stats, idx, rng) -> (state, metrics).

    hr_all: (T, H, W, C) device-resident dataset tensor; idx: (B,) int batch
    indices; stats: split statistics from ClimexDataset.stats. ``accum`` must
    match the optimizer's MultiSteps window (β-schedule semantics, see
    :func:`_probunet_step_body`). ``watch`` adds per-layer gradient norms to
    the metrics (wandb.watch parity; --watch_every).
    """
    step = _probunet_step_body(model, tx, lowres_scale, standardization, beta_fn,
                               compute_dtype, accum, watch=watch)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_probunet_train_multistep(
    model,
    tx,
    lowres_scale: int,
    standardization: str,
    beta_fn: Optional[Callable] = None,
    compute_dtype=jnp.float32,
    donate: bool = True,
    accum: int = 1,
):
    """K training steps in ONE XLA program via lax.scan.

    multi(state, hr_all, stats, idxs, rng) with idxs of shape (K, B) runs K
    optimizer steps and returns per-step stacked metrics. Amortizes host
    dispatch (decisive when the chip sits behind a network tunnel) and lets
    XLA overlap the batch gather of step k+1 with the math of step k."""
    step = _probunet_step_body(model, tx, lowres_scale, standardization, beta_fn,
                               compute_dtype, accum)

    def multi(state, hr_all, stats, idxs, rng):
        def body(carry, idx):
            new_state, metrics = step(carry, hr_all, stats, idx, rng)
            return new_state, metrics

        state, metrics = jax.lax.scan(body, state, idxs)
        return state, metrics

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def make_probunet_eval_step(model, lowres_scale: int, standardization: str,
                            compute_dtype=jnp.float32):
    """Stochastic, seeded ELBO evaluation — the reference's eval still samples
    the posterior (prob_unet.py:221 under eval_probunet_model), kept but made
    reproducible; dropout off (model.eval())."""

    def step(params, hr_all, stats, idx, rng, beta):
        hr = hr_all[idx]
        sl = transforms.slice_stats(stats, standardization, idx)
        pair = transforms.make_pair(hr, lowres_scale, standardization, sl)
        x = pair["inputs"].astype(compute_dtype)
        y = pair["targets"].astype(compute_dtype)
        total, recon, kl = model.apply(
            {"params": params}, x, y, beta, train=False,
            rngs={"latent": rng}, method=model.elbo)
        return {"val_loss": total, "val_recon_loss": recon, "val_kl_div": kl}

    return jax.jit(step)


def make_sample_fn(model, lowres_scale: int, standardization: str, num_samples: int,
                   compute_dtype=jnp.float32):
    """Ensemble inference: K vmapped prior draws -> physical HR fields.

    Returns fn(params, hr_all, stats, idx, rng) -> (B, K, H, W, C) hr_preds
    plus the batch dict pieces needed for plotting. The residual->HR inverse
    runs on device inside the same program (the reference does it on CPU,
    train_prob_unet_model.py:181)."""

    def fn(params, hr_all, stats, idx, rng):
        hr = hr_all[idx]
        sl = transforms.slice_stats(stats, standardization, idx)
        pair = transforms.make_pair(hr, lowres_scale, standardization, sl)
        x = pair["inputs"].astype(compute_dtype)
        preds = model.apply({"params": params}, x, num_samples,
                            rngs={"latent": rng}, method=model.sample)
        preds = preds.astype(jnp.float32)
        # stats broadcast over the K axis for the inverse transform
        if sl is not None and standardization != "perpixel":
            sl_k = (sl[0][:, None], sl[1][:, None])
        else:
            sl_k = sl
        hr_preds = transforms.residual_to_hr(
            preds, pair["lrinterp"][:, None], standardization, sl_k)
        return hr_preds, pair

    return jax.jit(fn, static_argnames=())


def _ensemble_crps_metrics(hr_preds, hr, variables):
    """Shared CRPS tail: (B, K, H, W, C) physical ensemble + (B, H, W, C)
    truth -> per-variable mean CRPS (mm/day / deg C) + ensemble-mean MAE."""
    from probunet_tpu.ops.crps import crps_empirical

    def to_physical(field, var):
        return kgm2s_to_mmday(field) if var == "pr" else k_to_c(field)

    ens = jnp.swapaxes(hr_preds, 0, 1)                            # (K, B, H, W, C)
    out = {}
    for i, var in enumerate(variables):
        p = to_physical(ens[..., i], var)
        t = to_physical(hr[..., i], var)
        out[f"crps_{var}"] = crps_empirical(p, t).mean()
        out[f"ensmean_mae_{var}"] = jnp.abs(p.mean(axis=0) - t).mean()
    return out


def make_crps_eval_fn(model, lowres_scale: int, standardization: str,
                      variables: Tuple[str, ...], num_samples: int = 16,
                      compute_dtype=jnp.float32):
    """Ensemble CRPS evaluation in physical units (the capability the
    reference defines but never wires in, trainmodel.py:66-117): K vmapped
    prior draws -> residual->HR inverse -> per-variable mean CRPS (mm/day /
    deg C) plus the ensemble-mean MAE."""

    def fn(params, hr_all, stats, idx, rng):
        hr = hr_all[idx]
        sl = transforms.slice_stats(stats, standardization, idx)
        pair = transforms.make_pair(hr, lowres_scale, standardization, sl)
        x = pair["inputs"].astype(compute_dtype)
        preds = model.apply({"params": params}, x, num_samples,
                            rngs={"latent": rng}, method=model.sample)
        preds = preds.astype(jnp.float32)
        if sl is not None and standardization != "perpixel":
            sl_k = (sl[0][:, None], sl[1][:, None])
        else:
            sl_k = sl
        hr_preds = transforms.residual_to_hr(
            preds, pair["lrinterp"][:, None], standardization, sl_k)  # (B, K, H, W, C)
        return _ensemble_crps_metrics(hr_preds, hr, variables)

    return jax.jit(fn)


def make_edm_crps_eval_fn(model, lowres_scale: int, standardization: str,
                          variables: Tuple[str, ...], num_samples: int = 16,
                          num_steps: int = 18, compute_dtype=jnp.float32):
    """Ensemble CRPS for the EDM diffusion downscaler: K Heun chains (folded
    into the batch axis) -> physical HR ensemble -> the same per-variable
    CRPS/ensemble-mean-MAE surface as make_crps_eval_fn, so both probabilistic
    models report identical metrics."""
    sample_fn = make_edm_sample_fn(model, lowres_scale, standardization,
                                   num_samples, num_steps,
                                   compute_dtype=compute_dtype)

    def fn(params, hr_all, stats, idx, rng):
        hr_preds, pair = sample_fn(params, hr_all, stats, idx, rng)
        return _ensemble_crps_metrics(hr_preds, pair["hr"], variables)

    return jax.jit(fn)


def make_edm_train_step(
    model,
    tx,
    lowres_scale: int,
    standardization: str,
    p_mean: float = -1.2,
    p_std: float = 1.2,
    sigma_data: float = 1.0,
    compute_dtype=jnp.float32,
    donate: bool = True,
    watch: bool = False,
):
    """EDM denoising-score-matching step for diffusion-based downscaling.

    The reference ships ``EDMPrecond`` unused (networks.py:339-389); this makes
    it a live training path: residual targets are noised with log-normal
    sigmas (Karras et al. EDM schedule), the preconditioned UNet denoises them
    conditioned on the LR-interp input, weighted by lambda(sigma) =
    (sigma^2 + sigma_data^2) / (sigma * sigma_data)^2.
    """

    def step(state: TrainState, hr_all, stats, idx, rng):
        hr = hr_all[idx]
        sl = transforms.slice_stats(stats, standardization, idx)
        pair = transforms.make_pair(hr, lowres_scale, standardization, sl)
        x = pair["inputs"].astype(compute_dtype)       # conditioning (LR-interp)
        y = pair["targets"].astype(jnp.float32)        # clean residual
        r = jax.random.fold_in(rng, state.step)
        r_sigma, r_noise, r_drop = jax.random.split(r, 3)
        b = y.shape[0]
        sigma = jnp.exp(p_mean + p_std * jax.random.normal(r_sigma, (b,)))
        noise = jax.random.normal(r_noise, y.shape) * sigma[:, None, None, None]
        weight = ((sigma ** 2 + sigma_data ** 2) / ((sigma * sigma_data) ** 2))

        def loss_fn(params):
            d = model.apply({"params": params}, (y + noise).astype(compute_dtype), sigma,
                            condition_img=x, train=True, rngs={"dropout": r_drop})
            per = jnp.mean(jnp.square(d.astype(jnp.float32) - y), axis=(1, 2, 3))
            return jnp.mean(weight * per)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u.astype(p.dtype), state.params, updates)
        metrics = {"train_loss": loss, "grad_norm": optax.global_norm(grads)}
        if watch:
            metrics.update(_grad_leaf_norms(grads))
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _edm_heun_chain(model, params, x_cond, rng, num_steps: int,
                    sigma_min: float, sigma_max: float, rho: float):
    """Deterministic EDM (Heun, 2nd order) sampling chain: noise -> residual,
    conditioned on the LR-interp tiles (Karras et al. schedule). Traced body —
    callers jit it."""
    b, h, w, c = x_cond.shape
    steps = jnp.arange(num_steps, dtype=jnp.float32)
    t = (sigma_max ** (1 / rho)
         + steps / (num_steps - 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho
    t = jnp.concatenate([t, jnp.zeros((1,))])

    def denoise(xk, sigma):
        sig = jnp.full((b,), sigma)
        return model.apply({"params": params}, xk, sig, condition_img=x_cond)

    x = jax.random.normal(rng, (b, h, w, c)) * t[0]

    def body(i, x):
        t_cur, t_next = t[i], t[i + 1]
        d = (x - denoise(x, t_cur)) / t_cur
        x_euler = x + (t_next - t_cur) * d
        def heun(_):
            d2 = (x_euler - denoise(x_euler, t_next)) / t_next
            return x + (t_next - t_cur) * 0.5 * (d + d2)
        return jax.lax.cond(t_next > 0, heun, lambda _: x_euler, None)

    return jax.lax.fori_loop(0, num_steps, body, x)


@functools.lru_cache(maxsize=16)
def _edm_sample_jitted(model, num_steps, sigma_min, sigma_max, rho):
    # cached per (model, schedule): a fresh jax.jit(partial(...)) per call
    # would re-trace every time (jit caching is keyed on function identity)
    return jax.jit(functools.partial(_edm_heun_chain, model, num_steps=num_steps,
                                     sigma_min=sigma_min, sigma_max=sigma_max,
                                     rho=rho))


def edm_sample(model, params, x_cond, rng, num_steps: int = 18,
               sigma_min: float = 0.002, sigma_max: float = 80.0, rho: float = 7.0):
    """One EDM (Heun) residual draw per input, (B, H, W, C) — JITTED (one XLA
    program per (shape, num_steps); the loop runs on device, not 2x num_steps
    host dispatches)."""
    return _edm_sample_jitted(model, num_steps, sigma_min, sigma_max, rho)(
        params, x_cond, rng)


def make_edm_eval_step(model, lowres_scale: int, standardization: str,
                       p_mean: float = -1.2, p_std: float = 1.2,
                       sigma_data: float = 1.0, compute_dtype=jnp.float32):
    """Seeded denoising-score-matching loss on a held-out split (the EDM
    counterpart of the seeded stochastic prob-U-Net eval)."""

    def step(params, hr_all, stats, idx, rng):
        hr = hr_all[idx]
        sl = transforms.slice_stats(stats, standardization, idx)
        pair = transforms.make_pair(hr, lowres_scale, standardization, sl)
        x = pair["inputs"].astype(compute_dtype)
        y = pair["targets"].astype(jnp.float32)
        r_sigma, r_noise = jax.random.split(rng)
        b = y.shape[0]
        sigma = jnp.exp(p_mean + p_std * jax.random.normal(r_sigma, (b,)))
        noise = jax.random.normal(r_noise, y.shape) * sigma[:, None, None, None]
        weight = ((sigma ** 2 + sigma_data ** 2) / ((sigma * sigma_data) ** 2))
        d = model.apply({"params": params}, (y + noise).astype(compute_dtype), sigma,
                        condition_img=x, train=False)
        per = jnp.mean(jnp.square(d.astype(jnp.float32) - y), axis=(1, 2, 3))
        return {"val_loss": jnp.mean(weight * per)}

    return jax.jit(step)


def make_edm_sample_fn(model, lowres_scale: int, standardization: str,
                       num_samples: int, num_steps: int = 18,
                       sigma_min: float = 0.002, sigma_max: float = 80.0,
                       rho: float = 7.0, compute_dtype=jnp.float32):
    """Jitted EDM ensemble downscaling: K Heun chains folded into the BATCH
    axis (one (K*B)-batch chain — MXU-efficient, vs K sequential chains),
    residual->HR inverse on device. Returns fn(params, hr_all, stats, idx,
    rng) -> ((B, K, H, W, C) physical HR fields, pair dict) — the same
    surface as make_sample_fn so serving/plots treat both models uniformly."""

    def fn(params, hr_all, stats, idx, rng):
        hr = hr_all[idx]
        sl = transforms.slice_stats(stats, standardization, idx)
        pair = transforms.make_pair(hr, lowres_scale, standardization, sl)
        x = pair["inputs"].astype(compute_dtype)
        b, h, w, c = x.shape
        k = num_samples
        x_rep = jnp.broadcast_to(x[None], (k,) + x.shape).reshape(k * b, h, w, c)
        residual = _edm_heun_chain(model, params, x_rep, rng, num_steps,
                                   sigma_min, sigma_max, rho)
        preds = residual.astype(jnp.float32).reshape(k, b, h, w, c)
        preds = jnp.swapaxes(preds, 0, 1)                      # (B, K, H, W, C)
        if sl is not None and standardization != "perpixel":
            sl_k = (sl[0][:, None], sl[1][:, None])
        else:
            sl_k = sl
        hr_preds = transforms.residual_to_hr(
            preds, pair["lrinterp"][:, None], standardization, sl_k)
        return hr_preds, pair

    return jax.jit(fn)


def make_deterministic_train_step(
    model,
    tx,
    lowres_scale: int,
    standardization: str,
    compute_dtype=jnp.float32,
    donate: bool = True,
    loss: str = "mse",
    timetransform: str = "id",
    watch: bool = False,
):
    """MSE training step for the deterministic U-Net / LinearCNN baselines
    (reference trainmodel.py:119-202), with per-variable loss metrics.

    ``timetransform`` feeds :func:`transforms.time_features` to build the
    class_labels the model conditions on: 'id' = float days (the reference's
    raw-timestamp pass-through, trainmodel.py:157, inert at label_dim=0);
    'cyclic' = (sin, cos) annual phase, live when the model's label_dim is 2
    (the loop builds the baseline U-Net that way for cyclic).
    """

    def loss_of(pred, target):
        d = pred.astype(jnp.float32) - target.astype(jnp.float32)
        return jnp.mean(jnp.square(d)) if loss == "mse" else jnp.mean(jnp.abs(d))

    def step(state: TrainState, hr_all, stats, idx, timestamps, rng):
        hr = hr_all[idx]
        sl = transforms.slice_stats(stats, standardization, idx)
        pair = transforms.make_pair(hr, lowres_scale, standardization, sl)
        x = pair["inputs"].astype(compute_dtype)
        y = pair["targets"].astype(compute_dtype)
        rngs = _split_rngs(rng, state.step)
        labels = transforms.time_features(timestamps, timetransform)

        def loss_fn(params):
            preds = model.apply({"params": params}, x, class_labels=labels,
                                train=True, rngs=rngs)
            return loss_of(preds, y), preds

        (total, preds), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u.astype(p.dtype), state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        metrics = {"train_loss": total}
        for i in range(y.shape[-1]):
            metrics[f"train_loss_var{i}"] = loss_of(preds[..., i], y[..., i])
        if watch:
            metrics.update(_grad_leaf_norms(grads))
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_deterministic_eval_step(model, lowres_scale: int, standardization: str,
                                 variables: Tuple[str, ...],
                                 reconstruct: bool = False, loss: str = "mse",
                                 compute_dtype=jnp.float32,
                                 timetransform: str = "id"):
    """Per-variable eval (reference trainmodel.py:235-304). With
    ``reconstruct=True`` losses are computed on physical HR fields after
    residual->HR and unit conversion (mm/day, deg C)."""

    def loss_of(pred, target):
        d = pred.astype(jnp.float32) - target.astype(jnp.float32)
        return jnp.mean(jnp.square(d)) if loss == "mse" else jnp.mean(jnp.abs(d))

    def to_physical(field, var):
        return kgm2s_to_mmday(field) if var == "pr" else k_to_c(field)

    def step(params, hr_all, stats, idx, timestamps):
        hr = hr_all[idx]
        sl = transforms.slice_stats(stats, standardization, idx)
        pair = transforms.make_pair(hr, lowres_scale, standardization, sl)
        x = pair["inputs"].astype(compute_dtype)
        labels = transforms.time_features(timestamps, timetransform)
        preds = model.apply({"params": params}, x, class_labels=labels,
                            train=False)
        out = {}
        if reconstruct:
            hr_pred = transforms.residual_to_hr(preds.astype(jnp.float32),
                                                pair["lrinterp"], standardization, sl)
            for i, var in enumerate(variables):
                out[f"eval_{var}"] = loss_of(to_physical(hr_pred[..., i], var),
                                             to_physical(hr[..., i], var))
        else:
            y = pair["targets"]
            for i, var in enumerate(variables):
                out[f"eval_{var}"] = loss_of(preds[..., i], y[..., i])
        return out

    return jax.jit(step)
