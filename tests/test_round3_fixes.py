"""Regression tests for the round-3 truth-sync fixes (VERDICT.md weak items):
live cyclic time features in the deterministic baseline, the hr_device
sharding-cache foot-gun, and the time_features contract itself."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from probunet_tpu.config import Config
from probunet_tpu.data import transforms
from probunet_tpu.data.dataset import ClimexDataset
from probunet_tpu.parallel import make_mesh
from probunet_tpu.train.loop import build_baseline_model


class TestTimeFeatures:
    def test_id_passes_float_days(self):
        ts = jnp.asarray([0.0, 86400e9, 2 * 86400e9])
        out = transforms.time_features(ts, "id")
        assert out.shape == (3, 1)
        np.testing.assert_allclose(np.asarray(out[:, 0]), [0.0, 1.0, 2.0])

    def test_cyclic_is_unit_circle_with_annual_period(self):
        days = np.asarray([0.0, 91.25, 365.0, 730.0])
        ts = jnp.asarray(days * 86400e9)
        out = np.asarray(transforms.time_features(ts, "cyclic"))
        assert out.shape == (4, 2)
        np.testing.assert_allclose((out ** 2).sum(-1), 1.0, atol=1e-6)
        # one-year period: day 0 == day 365 == day 730
        np.testing.assert_allclose(out[0], out[2], atol=1e-5)
        np.testing.assert_allclose(out[0], out[3], atol=1e-5)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            transforms.time_features(jnp.zeros((2,)), "nope")


class TestCyclicBaselineIsLive:
    """--timetransform cyclic must actually condition the baseline U-Net on
    time (label_dim=2 -> map_label embedding), not silently ignore it."""

    def _cfg(self, **kw):
        base = dict(resolution=(16, 16), lowres_scale=4, baseline_channels=8,
                    channel_mult=(1, 2), num_blocks=1,
                    ds_model="deterministic_unet")
        base.update(kw)
        return Config(**base)

    def test_label_dim_follows_timetransform(self):
        assert build_baseline_model(self._cfg(timetransform="id")).label_dim == 0
        assert build_baseline_model(self._cfg(timetransform="cyclic")).label_dim == 2

    def test_cyclic_output_depends_on_timestamps(self):
        cfg = self._cfg(timetransform="cyclic")
        model = build_baseline_model(cfg)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 16, 3)),
                        jnp.float32)
        ts_a = jnp.asarray([0.0, 0.0])
        ts_b = jnp.asarray([91.25 * 86400e9, 91.25 * 86400e9])
        la = transforms.time_features(ts_a, "cyclic")
        lb = transforms.time_features(ts_b, "cyclic")
        variables = model.init({"params": jax.random.key(0)}, x,
                               class_labels=la, train=False)
        # ADM zero-inits conv1/proj/out_conv, so at init the output is both
        # zero and label-independent; fill every zero param with small noise
        # so label-driven features can reach the output.
        leaves, treedef = jax.tree.flatten(variables["params"])
        filled = [jnp.where(p == 0,
                            0.03 * jax.random.normal(jax.random.key(i), p.shape), p)
                  for i, p in enumerate(leaves)]
        params = jax.tree.unflatten(treedef, filled)
        out_a = model.apply({"params": params}, x, class_labels=la, train=False)
        out_b = model.apply({"params": params}, x, class_labels=lb, train=False)
        assert not np.allclose(np.asarray(out_a), np.asarray(out_b)), \
            "cyclic time features must change the prediction"

    def test_id_output_ignores_timestamps(self):
        """Reference parity: with timetransform='id' the baseline keeps
        label_dim=0, so class_labels are inert (trainmodel.py:157)."""
        cfg = self._cfg(timetransform="id")
        model = build_baseline_model(cfg)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 16, 16, 3)),
                        jnp.float32)
        la = transforms.time_features(jnp.asarray([0.0, 0.0]), "id")
        lb = transforms.time_features(jnp.asarray([5e9 * 86400, 7e9 * 86400]), "id")
        variables = model.init({"params": jax.random.key(0)}, x,
                               class_labels=la, train=False)
        out_a = model.apply(variables, x, class_labels=la, train=False)
        out_b = model.apply(variables, x, class_labels=lb, train=False)
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


class TestHrDeviceReshard:
    def test_second_sharding_replaces_cache(self):
        hr = np.random.default_rng(0).standard_normal((8, 8, 8, 3)).astype(np.float32)
        ds = ClimexDataset(hr=hr, standardization="none")
        plain = ds.hr_device()
        mesh = make_mesh((-1,), ("data",))
        sh = NamedSharding(mesh, P("data"))
        sharded = ds.hr_device(sh)
        assert sharded.sharding == sh, "requested sharding must be honoured"
        # content identical either way
        np.testing.assert_array_equal(np.asarray(sharded), np.asarray(plain))
        # repeat call with the same sharding hits the cache (same object)
        assert ds.hr_device(sh) is sharded


class TestExactResume:
    """Step-granular checkpointing (--checkpoint_every / --max_steps) with
    EXACT mid-epoch resume: an interrupted run continued from its checkpoint
    must reach the identical final state as an uninterrupted run (batch order
    is a function of (seed, epoch); per-step noise folds in state.step)."""

    def _datasets(self):
        rng = np.random.default_rng(0)
        from probunet_tpu.data.dataset import ClimexDataset
        def mkds(t, seed):
            hr = (np.random.default_rng(seed).standard_normal((t, 16, 16, 3))
                  .astype(np.float32) + 2.0)
            return ClimexDataset(hr=hr, standardization="perpixel", lowres_scale=4)
        return {"train": mkds(16, 1), "val": mkds(4, 2), "test": mkds(4, 3)}

    def _cfg(self, tmp_path, tag, **kw):
        import os
        base = dict(resolution=(16, 16), lowres_scale=4, batch_size=4,
                    num_epochs=1, latent_dim=4, num_filters=(8,),
                    model_channels=8, channel_mult=(1, 2), num_blocks=1,
                    attn_resolutions=(8,), dropout=0.1, log_every=1,
                    plotdir=os.path.join(str(tmp_path), f"plots_{tag}"),
                    checkpoints_dir=os.path.join(str(tmp_path), f"ckpt_{tag}"))
        base.update(kw)
        return Config(**base)

    def test_interrupted_plus_resume_equals_uninterrupted(self, tmp_path):
        import os
        from probunet_tpu.train.loop import train_probunet

        datasets = self._datasets()
        # leg A: stop mid-epoch after 2 of 4 steps; checkpoint written at stop
        cfg_a = self._cfg(tmp_path, "a", max_steps=2)
        res_a = train_probunet(cfg_a, datasets=datasets, make_plots=False)
        assert int(res_a["state"].step) == 2
        ckpt = os.path.join(cfg_a.checkpoints_dir, "probunet")
        assert os.path.isdir(ckpt)
        # leg B: resume and finish the epoch (steps 3, 4 of the SAME plan)
        cfg_b = self._cfg(tmp_path, "b", resume=ckpt)
        res_b = train_probunet(cfg_b, datasets=datasets, make_plots=False)
        assert int(res_b["state"].step) == 4
        # leg C: uninterrupted single run
        cfg_c = self._cfg(tmp_path, "c")
        res_c = train_probunet(cfg_c, datasets=datasets, make_plots=False)
        assert int(res_c["state"].step) == 4
        for a, b in zip(jax.tree.leaves(res_b["state"].params),
                        jax.tree.leaves(res_c["state"].params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # the resumed epoch's val loss equals the uninterrupted run's
        np.testing.assert_allclose(res_b["val_losses"], res_c["val_losses"],
                                   rtol=1e-6)

    def test_checkpoint_every_periodic_saves(self, tmp_path, monkeypatch):
        # the epoch loop (and its checkpoint cadence) lives in the shared
        # engine now, so that's where the save call is intercepted
        import probunet_tpu.train.engine as E
        import probunet_tpu.train.loop as L

        calls = []
        orig = E.save_checkpoint
        monkeypatch.setattr(E, "save_checkpoint",
                            lambda d, s: calls.append(d) or orig(d, s))
        cfg = self._cfg(tmp_path, "p", checkpoint_every=2)
        L.train_probunet(cfg, datasets=self._datasets(), make_plots=False)
        # 4 steps -> periodic saves at steps 2 and 4, plus the epoch-end save
        assert len(calls) == 3, calls

    def test_resumed_epochs_are_skipped(self, tmp_path):
        import os
        from probunet_tpu.train.loop import train_probunet

        datasets = self._datasets()
        cfg_a = self._cfg(tmp_path, "f1", num_epochs=1)
        train_probunet(cfg_a, datasets=datasets, make_plots=False)
        ckpt = os.path.join(cfg_a.checkpoints_dir, "probunet")
        # resume a 2-epoch run from the completed epoch-1 checkpoint: only
        # epoch 2 trains (4 more steps)
        cfg_b = self._cfg(tmp_path, "f2", num_epochs=2, resume=ckpt)
        res = train_probunet(cfg_b, datasets=datasets, make_plots=False)
        assert int(res["state"].step) == 8
        # epoch 1 was skipped entirely: one train-loss entry (epoch 2 only)
        assert len(res["val_losses"]) == 1
