"""Spatially-sharded TRAINING: sharded ELBO loss and gradients must equal the
unsharded model's, and the full sharded train step must optimize."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from probunet_tpu.models import ProbabilisticUNet
from probunet_tpu.parallel import make_mesh
from probunet_tpu.parallel.spatial_train import (
    make_spatial_eval_elbo,
    make_spatial_probunet_train_step,
    put_spatial,
)
from probunet_tpu.parallel.spatial_unet import spatial_probunet_elbo
from probunet_tpu.train import create_train_state
from probunet_tpu.train.state import make_optimizer

# the production wrapper (check_vma off — required for Pallas kernels inside);
# grad parity below therefore proves correctness of the production config
from probunet_tpu.parallel.spatial_train import shard_map_unchecked


ARCH = dict(num_filters=(16, 32), model_channels=32, channel_mult=(1, 2),
            num_blocks=1, attn_resolutions=(16,))


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((-1,), ("space",))


@pytest.fixture(scope="module")
def model_and_params():
    m = ProbabilisticUNet(input_channels=3, num_classes=3, latent_dim=4,
                          img_resolution=(32, 32), dropout=0.0, **ARCH)
    x = jnp.zeros((1, 32, 32, 3))
    rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
            "dropout": jax.random.key(2)}
    v = m.init(rngs, x, x, method=m.elbo)
    keys = iter(jax.random.split(jax.random.key(123), 10_000))
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(next(keys), p.shape, p.dtype),
        v["params"])
    return m, params


def _data(seed=0, b=2, hw=32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, hw, hw, 3)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, hw, hw, 3)), jnp.float32)
    return x, y


class TestShardedElboGradParity:
    def test_loss_and_grads_match_unsharded(self, mesh, model_and_params):
        """jax.grad OUTSIDE the shard_map'd ELBO == grad of the unsharded ELBO
        (same explicit z; dropout off). This is the correctness proof for the
        spatially-sharded training step: the replicated-params transpose must
        psum the per-device cotangents without double-counting the replicated
        KL path."""
        m, params = model_and_params
        x, y = _data(0)
        z = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4)), jnp.float32)
        beta = jnp.float32(0.7)

        def ref_loss(p):
            total, recon, kl = m.apply({"params": p}, x, y, z, beta,
                                       method=m.elbo_with_z)
            return total, (recon, kl)

        (ref_total, (ref_recon, ref_kl)), ref_grads = (
            jax.value_and_grad(ref_loss, has_aux=True)(params))

        def sharded_loss(p):
            def body(p, xl, yl):
                return spatial_probunet_elbo(p, xl, yl, (32, 32), "space",
                                             beta=beta, z=z, **ARCH)
            fn = shard_map_unchecked(body, mesh=mesh,
                           in_specs=(P(), P(None, "space"), P(None, "space")),
                           out_specs=(P(), P(), P()))
            total, recon, kl = fn(p, x, y)
            return total, (recon, kl)

        (sh_total, (sh_recon, sh_kl)), sh_grads = jax.jit(
            jax.value_and_grad(sharded_loss, has_aux=True))(params)

        np.testing.assert_allclose(float(sh_total), float(ref_total), rtol=1e-4)
        np.testing.assert_allclose(float(sh_recon), float(ref_recon), rtol=1e-4)
        np.testing.assert_allclose(float(sh_kl), float(ref_kl), rtol=1e-4)
        flat_ref = jax.tree.leaves(ref_grads)
        flat_sh = jax.tree.leaves(sh_grads)
        assert len(flat_ref) == len(flat_sh)
        for a, b in zip(flat_ref, flat_sh):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-3, atol=5e-4)

    def test_remat_grads_identical(self, mesh, model_and_params):
        """Per-block rematerialization must not change gradients (beyond float
        reassociation noise from the recompute's different fusion order)."""
        m, params = model_and_params
        x, y = _data(2)
        z = jnp.asarray(np.random.default_rng(3).standard_normal((2, 4)), jnp.float32)

        def loss(p, remat):
            def body(p, xl, yl):
                t, _, _ = spatial_probunet_elbo(p, xl, yl, (32, 32), "space",
                                                z=z, remat=remat, **ARCH)
                return t
            fn = shard_map_unchecked(body, mesh=mesh,
                           in_specs=(P(), P(None, "space"), P(None, "space")),
                           out_specs=P())
            return fn(p, x, y)

        g0 = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
        g1 = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)


class TestSpatialTrainStep:
    def test_step_runs_and_optimizes(self, mesh, model_and_params):
        """The jitted sharded train step (dropout on, remat on) decreases the
        ELBO over repeated steps on one batch."""
        m, params = model_and_params
        m_dropout = ProbabilisticUNet(input_channels=3, num_classes=3, latent_dim=4,
                                      img_resolution=(32, 32), dropout=0.1, **ARCH)
        tx = make_optimizer(lr=1e-3)
        state = create_train_state(params, tx)
        x, y = _data(4, b=4)
        x = put_spatial(x, mesh)
        y = put_spatial(y, mesh)
        step = make_spatial_probunet_train_step(m_dropout, tx, mesh,
                                                donate=False, remat=True)
        rng = jax.random.key(5)
        first = None
        for _ in range(30):
            state, metrics = step(state, x, y, rng)
            if first is None:
                first = float(metrics["train_loss"])
        last = float(metrics["train_loss"])
        assert np.isfinite(last)
        assert last < first, f"sharded training should reduce ELBO: {first} -> {last}"
        assert int(state.step) == 30

    def test_parallel_mode_spatial_e2e(self, tmp_path):
        """train_probunet with --parallel_mode spatial: full epoch loop on
        synthetic host data with the SAME feature contract the DP loop's e2e
        test asserts (test_loop.py): metrics + checkpoint + epoch-2 sampling
        plot over the test split + CRPS metrics; losses finite."""
        import json
        import os

        from probunet_tpu.config import Config
        from probunet_tpu.data.dataset import ClimexDataset
        from probunet_tpu.train.loop import train_probunet

        rng = np.random.default_rng(0)
        def mkds(t):
            hr = rng.standard_normal((t, 32, 32, 3)).astype(np.float32) + 2.0
            return ClimexDataset(hr=hr, standardization="perpixel", lowres_scale=4)
        datasets = {"train": mkds(8), "val": mkds(4), "test": mkds(4)}
        cfg = Config(resolution=(32, 32), latent_dim=4, num_filters=(16, 32),
                     model_channels=32, channel_mult=(1, 2), num_blocks=1,
                     attn_resolutions=(16,), dropout=0.1, batch_size=4,
                     num_epochs=2, parallel_mode="spatial", remat=True,
                     eval_crps=True, crps_samples=4, num_samples=2,
                     plotdir=os.path.join(str(tmp_path), "plots"),
                     checkpoints_dir=os.path.join(str(tmp_path), "ckpt"))
        res = train_probunet(cfg, datasets=datasets, make_plots=True)
        assert len(res["tr_losses"]) == 2
        assert np.isfinite(res["tr_losses"]).all() and np.isfinite(res["val_losses"]).all()
        assert os.path.isdir(os.path.join(cfg.checkpoints_dir, "probunet"))
        metrics_path = os.path.join(cfg.plotdir, "metrics.jsonl")
        assert os.path.exists(metrics_path)
        # reference main.py:125-134: a sample plot every 2 epochs
        assert os.path.exists(os.path.join(cfg.plotdir, "epoch2.png"))
        # CRPS metrics logged per epoch, per variable, finite
        recs = [json.loads(l) for l in open(metrics_path)]
        crps = [r for r in recs if any(k.startswith("crps_") for k in r)]
        assert len(crps) == 2, "one CRPS record per epoch"
        for r in crps:
            for var in cfg.variables:
                assert np.isfinite(r[f"crps_{var}"])
                assert np.isfinite(r[f"ensmean_mae_{var}"])

    def test_eval_elbo_deterministic_given_rng(self, mesh, model_and_params):
        m, params = model_and_params
        x, y = _data(6)
        x = put_spatial(x, mesh)
        y = put_spatial(y, mesh)
        ev = make_spatial_eval_elbo(m, mesh)
        m1 = ev(params, x, y, jax.random.key(7), jnp.float32(1.0))
        m2 = ev(params, x, y, jax.random.key(7), jnp.float32(1.0))
        assert float(m1["val_loss"]) == float(m2["val_loss"])


class TestSpatial2D:
    """2D (data x spatial) composition: batch sharded over 'data', H over
    'space', scalars psum'd over both — loss/grads must equal the unsharded
    model and the driver must run end-to-end."""

    @pytest.fixture(scope="class")
    def mesh2d(self):
        return make_mesh((2, -1), ("data", "space"))

    def test_2d_loss_and_grads_match_unsharded(self, mesh2d, model_and_params):
        m, params = model_and_params
        x, y = _data(3, b=4)
        z = jnp.asarray(np.random.default_rng(5).standard_normal((4, 4)), jnp.float32)
        beta = jnp.float32(0.7)

        def ref_loss(p):
            total, recon, kl = m.apply({"params": p}, x, y, z, beta,
                                       method=m.elbo_with_z)
            return total, (recon, kl)

        (ref_total, (ref_recon, ref_kl)), ref_grads = (
            jax.value_and_grad(ref_loss, has_aux=True)(params))

        xy_spec = P("data", "space")

        def sharded_loss(p):
            def body(p, xl, yl, zl):
                return spatial_probunet_elbo(p, xl, yl, (32, 32), "space",
                                             beta=beta, z=zl,
                                             batch_axis_name="data", **ARCH)
            fn = shard_map_unchecked(body, mesh=mesh2d,
                           in_specs=(P(), xy_spec, xy_spec, P("data")),
                           out_specs=(P(), P(), P()))
            total, recon, kl = fn(p, x, y, z)
            return total, (recon, kl)

        (sh_total, (sh_recon, sh_kl)), sh_grads = jax.jit(
            jax.value_and_grad(sharded_loss, has_aux=True))(params)

        np.testing.assert_allclose(float(sh_total), float(ref_total), rtol=1e-4)
        np.testing.assert_allclose(float(sh_recon), float(ref_recon), rtol=1e-4)
        np.testing.assert_allclose(float(sh_kl), float(ref_kl), rtol=1e-4)
        for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(sh_grads)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-3, atol=5e-4)

    def test_2d_step_runs_and_optimizes(self, mesh2d, model_and_params):
        m, params = model_and_params
        tx = make_optimizer(lr=1e-3)
        state = jax.device_put(create_train_state(params, tx),
                               jax.sharding.NamedSharding(mesh2d, P()))
        x, y = _data(7, b=4)
        x = put_spatial(x, mesh2d, "space", "data")
        y = put_spatial(y, mesh2d, "space", "data")
        step = make_spatial_probunet_train_step(m, tx, mesh2d, "space",
                                                donate=False, remat=False,
                                                batch_axis_name="data")
        rng = jax.random.key(11)
        first = None
        for _ in range(20):
            state, metrics = step(state, x, y, rng)
            if first is None:
                first = float(metrics["train_loss"])
        last = float(metrics["train_loss"])
        assert np.isfinite(last) and last < first, (first, last)

    def test_parallel_mode_2d_e2e(self, tmp_path):
        import os

        from probunet_tpu.config import Config
        from probunet_tpu.data.dataset import ClimexDataset
        from probunet_tpu.train.loop import train_probunet

        rng = np.random.default_rng(0)
        def mkds(t):
            hr = rng.standard_normal((t, 32, 32, 3)).astype(np.float32) + 2.0
            return ClimexDataset(hr=hr, standardization="perpixel", lowres_scale=4)
        datasets = {"train": mkds(8), "val": mkds(4), "test": mkds(4)}
        cfg = Config(resolution=(32, 32), latent_dim=4, num_filters=(16, 32),
                     model_channels=32, channel_mult=(1, 2), num_blocks=1,
                     attn_resolutions=(16,), dropout=0.1, batch_size=4,
                     num_epochs=1, parallel_mode="2d", mesh_shape=(2, -1),
                     plotdir=os.path.join(str(tmp_path), "plots"),
                     checkpoints_dir=os.path.join(str(tmp_path), "ckpt"))
        res = train_probunet(cfg, datasets=datasets, make_plots=False)
        assert np.isfinite(res["tr_losses"]).all() and np.isfinite(res["val_losses"]).all()
