"""Regression tests for the round-2 fixes (VERDICT.md / ADVICE.md items):
β-schedule × grad-accum semantics, abstract checkpoint restore, calendar-safe
day-of-year, CRPS eval-fn hoisting (no per-epoch recompile), streaming-stats
precision, and the baseline_channels flag."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probunet_tpu.data import transforms
from probunet_tpu.models import ProbabilisticUNet
from probunet_tpu.train import beta_schedule, create_train_state, make_probunet_train_step
from probunet_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from probunet_tpu.train.state import make_optimizer


def _tiny_model(**kw):
    base = dict(input_channels=3, num_classes=3, latent_dim=4,
                num_filters=(8, 16), img_resolution=(16, 16),
                model_channels=8, channel_mult=(1, 2), num_blocks=1,
                attn_resolutions=(8,), dropout=0.0)
    base.update(kw)
    return ProbabilisticUNet(**base)


def _init_state(model, tx, hw=16):
    x = jnp.zeros((1, hw, hw, 3))
    rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
            "dropout": jax.random.key(2)}
    return create_train_state(model.init(rngs, x, x, method=model.elbo)["params"], tx)


def _hr(t=16, hw=16, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal((t, hw, hw, 3)),
                       jnp.float32) + 2.0


class TestAccumBetaSemantics:
    def test_beta_uses_optimizer_step(self):
        """With accum=2 and a linear warmup of 2 OPTIMIZER steps, the four
        micro-steps must see beta = [0, 0, b/2, b/2]: both micro-steps of an
        accumulation window share the same optimizer-step beta."""
        model = _tiny_model()
        accum = 2
        tx = make_optimizer(lr=1e-3, accum=accum)
        state = _init_state(model, tx)
        hr = _hr(seed=1)
        stats = transforms.compute_lr_stats(hr, 4, "perpixel")
        beta_fn = beta_schedule("linear", 1.0, warmup_steps=2)
        step = make_probunet_train_step(model, tx, 4, "perpixel", beta_fn,
                                        donate=False, accum=accum)
        rng = jax.random.key(3)
        betas = []
        for k in range(4):
            state, m = step(state, hr, stats, jnp.arange(4) + k, rng)
            betas.append(float(m["beta"]))
        assert betas == pytest.approx([0.0, 0.0, 0.5, 0.5])

    def test_params_update_every_accum_micro_steps(self):
        """optax.MultiSteps only applies the update on the accum-th micro-step."""
        model = _tiny_model()
        tx = make_optimizer(lr=1e-3, accum=2)
        state = _init_state(model, tx)
        p0 = jax.tree.map(np.asarray, state.params)
        hr = _hr(seed=2)
        stats = transforms.compute_lr_stats(hr, 4, "perpixel")
        step = make_probunet_train_step(model, tx, 4, "perpixel",
                                        donate=False, accum=2)
        rng = jax.random.key(4)
        state, _ = step(state, hr, stats, jnp.arange(4), rng)
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(a, np.asarray(b))  # accumulating only
        state, _ = step(state, hr, stats, jnp.arange(4, 8), rng)
        changed = any(not np.array_equal(a, np.asarray(b)) for a, b in
                      zip(jax.tree.leaves(p0), jax.tree.leaves(state.params)))
        assert changed, "second micro-step must apply the accumulated update"


class TestAbstractRestore:
    def test_abstract_template_roundtrip(self, tmp_path):
        """Restoring into a jax.eval_shape template (no real init) must produce
        the same state as restoring into a real template."""
        from probunet_tpu.config import Config
        from probunet_tpu.train.loop import abstract_probunet_state, build_probunet

        cfg = Config(resolution=(16, 16), latent_dim=4, num_filters=(8, 16),
                     model_channels=8, channel_mult=(1, 2), num_blocks=1,
                     attn_resolutions=(8,), dropout=0.0)
        model = build_probunet(cfg)
        tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.accum, cfg.optimizer)
        state = _init_state(model, tx)
        hr = _hr(seed=3)
        stats = transforms.compute_lr_stats(hr, 4, "perpixel")
        step = make_probunet_train_step(model, tx, 4, "perpixel", donate=False)
        state, _ = step(state, hr, stats, jnp.arange(8), jax.random.key(0))
        save_checkpoint(str(tmp_path), state)

        template = abstract_probunet_state(cfg, model, tx)
        # template is abstract: no leaf is a real array
        assert all(isinstance(l, jax.ShapeDtypeStruct) for l in jax.tree.leaves(template))
        restored = restore_checkpoint(str(tmp_path), template)
        assert int(restored.step) == int(state.step)
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDayOfYear:
    def test_noleap_mapping_has_no_leap_drift(self):
        """decode_time maps noleap day counts onto Gregorian dates; day-of-year
        derived from those dates must equal the original noleap doy for every
        day of a multi-decade range (the old epoch-mod-365 formula drifted one
        day per leap year)."""
        from probunet_tpu.data.dataset import ClimexDataset
        from probunet_tpu.data.netcdf import decode_time

        n_years = 40
        raw_days = np.arange(365 * n_years, dtype=np.float64)
        dates = decode_time(raw_days, "days since 1950-01-01", "noleap")
        hr = np.zeros((8, 8, 8, 1), np.float32)  # content irrelevant
        ds = ClimexDataset(hr=np.zeros((len(dates), 8, 8, 1), np.float32),
                           timestamps=dates.astype("datetime64[ns]").astype(np.float64),
                           variables=("pr",), standardization="none")
        expected = (raw_days % 365).astype(np.int32)
        np.testing.assert_array_equal(ds.dayofyear, expected)

    def test_real_calendar_leap_year(self):
        from probunet_tpu.models.baselines import day_of_year_365

        dates = np.arange(np.datetime64("2000-01-01"), np.datetime64("2001-01-02"),
                          np.timedelta64(1, "D")).astype("datetime64[ns]")
        ts = dates.astype(np.int64).astype(np.float64)
        doy = day_of_year_365(ts)
        assert doy[0] == 0
        assert doy[59] == 59            # Feb 29, 2000
        assert doy[365] == 364          # Dec 31 of the leap year clips into 364
        assert doy[366] == 0            # Jan 1, 2001


class TestCrpsHoist:
    def test_crps_eval_fn_built_once_across_epochs(self, tmp_path, monkeypatch):
        """make_crps_eval_fn must be called once per training run, not per epoch
        (a fresh jax.jit instance every epoch = full recompile every epoch)."""
        import probunet_tpu.train as train_pkg
        from probunet_tpu.config import Config
        from probunet_tpu.data.dataset import ClimexDataset
        from probunet_tpu.train.loop import train_probunet

        calls = {"n": 0}
        real = train_pkg.make_crps_eval_fn

        def counting(*a, **kw):
            calls["n"] += 1
            return real(*a, **kw)

        monkeypatch.setattr(train_pkg, "make_crps_eval_fn", counting)

        rng = np.random.default_rng(0)
        def mkds(t, seed):
            hr = rng.standard_normal((t, 16, 16, 3)).astype(np.float32) + 2.0
            return ClimexDataset(hr=hr, standardization="perpixel", lowres_scale=4)
        datasets = {"train": mkds(8, 0), "val": mkds(8, 1), "test": mkds(4, 2)}
        cfg = Config(resolution=(16, 16), latent_dim=4, num_filters=(8, 16),
                     model_channels=8, channel_mult=(1, 2), num_blocks=1,
                     attn_resolutions=(8,), dropout=0.0, batch_size=4,
                     num_epochs=2, eval_crps=True, crps_samples=2,
                     plotdir=os.path.join(str(tmp_path), "plots"),
                     checkpoints_dir=os.path.join(str(tmp_path), "ckpt"))
        res = train_probunet(cfg, datasets=datasets, make_plots=False)
        assert np.isfinite(res["tr_losses"]).all()
        assert calls["n"] == 1, f"CRPS eval fn built {calls['n']} times for 2 epochs"


class TestStreamingStatsPrecision:
    def test_perpixel_streaming_matches_two_pass_on_kelvin_fields(self):
        """Kelvin-scale data (~300) with small variance: fp32 sum-of-squares
        catastrophically cancels; float64 host accumulation must match the
        two-pass reference std to ~1e-3 relative."""
        from probunet_tpu.data.pipeline import compute_lr_stats_streaming

        rng = np.random.default_rng(0)
        t = 4096
        hr = (300.0 + rng.standard_normal((t, 8, 8, 1))).astype(np.float32)
        mean_s, std_s = compute_lr_stats_streaming(hr, 2, "perpixel", chunk=512)

        # two-pass float64 reference on the pooled LR fields
        lr = hr.reshape(t, 4, 2, 4, 2, 1).mean(axis=(2, 4), dtype=np.float64)
        mean_ref = lr.mean(axis=0)
        std_ref = lr.std(axis=0, ddof=1)
        s = 2
        mean_ref = np.repeat(np.repeat(mean_ref, s, axis=0), s, axis=1)
        std_ref = np.repeat(np.repeat(std_ref, s, axis=0), s, axis=1)
        np.testing.assert_allclose(mean_s, mean_ref, rtol=1e-5)
        np.testing.assert_allclose(std_s, std_ref, rtol=2e-3)


class TestBF16OptState:
    def test_bf16_state_converges_and_dtypes(self):
        """Production bandwidth mode: bf16 mu/grads (nu stays fp32 — its
        per-step increment is below bf16 resolution and bf16 nu stalls
        convergence). The ELBO must still optimize, mu must actually be stored
        in bf16, and params stay fp32."""
        import optax

        model = _tiny_model()
        tx = make_optimizer(lr=3e-3, state_dtype="bfloat16")
        state = _init_state(model, tx)
        adam_state = [s for s in jax.tree.leaves(
                          state.opt_state,
                          is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
                      if isinstance(s, optax.ScaleByAdamState)]
        assert adam_state, "bf16 optimizer must expose ScaleByAdamState"
        assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(adam_state[0].mu))
        assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(adam_state[0].nu))
        hr = _hr(seed=9)
        stats = transforms.compute_lr_stats(hr, 4, "perpixel")
        step = make_probunet_train_step(model, tx, 4, "perpixel", donate=False)
        tx32 = make_optimizer(lr=3e-3, state_dtype="float32")
        state32 = _init_state(model, tx32)
        step32 = make_probunet_train_step(model, tx32, 4, "perpixel", donate=False)
        rng = jax.random.key(11)
        first = None
        for _ in range(60):
            state, m = step(state, hr, stats, jnp.arange(8), rng)
            state32, m32 = step32(state32, hr, stats, jnp.arange(8), rng)
            if first is None:
                first = float(m["train_loss"])
        last, last32 = float(m["train_loss"]), float(m32["train_loss"])
        assert np.isfinite(last) and last < first, f"{first} -> {last}"
        # bf16 storage must not change the optimization trajectory materially
        np.testing.assert_allclose(last, last32, rtol=2e-2)
        assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.params))

    def test_bf16_state_tracks_fp32_early(self):
        """First steps of bf16-state AdamW stay close to fp32 AdamW (same
        update math, only storage rounding differs)."""
        model = _tiny_model()
        tx32 = make_optimizer(lr=1e-3, state_dtype="float32")
        tx16 = make_optimizer(lr=1e-3, state_dtype="bfloat16")
        s32 = _init_state(model, tx32)
        s16 = _init_state(model, tx16)
        hr = _hr(seed=10)
        stats = transforms.compute_lr_stats(hr, 4, "perpixel")
        st32 = make_probunet_train_step(model, tx32, 4, "perpixel", donate=False)
        st16 = make_probunet_train_step(model, tx16, 4, "perpixel", donate=False)
        rng = jax.random.key(12)
        for _ in range(3):
            s32, m32 = st32(s32, hr, stats, jnp.arange(8), rng)
            s16, m16 = st16(s16, hr, stats, jnp.arange(8), rng)
        np.testing.assert_allclose(float(m16["train_loss"]), float(m32["train_loss"]),
                                   rtol=5e-3)


class TestBaselineChannels:
    def test_explicit_model_channels_does_not_leak_into_baseline(self):
        from probunet_tpu.config import Config
        from probunet_tpu.train.loop import build_baseline_model

        cfg = Config(ds_model="deterministic_unet", model_channels=128)
        assert build_baseline_model(cfg).model_channels == 64
        cfg = Config(ds_model="deterministic_unet", model_channels=128,
                     baseline_channels=16)
        assert build_baseline_model(cfg).model_channels == 16
