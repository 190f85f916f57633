"""ds_model=vae — the reference's dead `vae` enum (trainmodel.py:33) made a
live conditional conv-VAE sharing the prob-U-Net's elbo/sample surface."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probunet_tpu.config import Config
from probunet_tpu.data.synthetic import generate_climex_like
from probunet_tpu.models import ConvVAE
from probunet_tpu.train.loop import train_baseline


@pytest.fixture(scope="module")
def model_and_params():
    model = ConvVAE(input_channels=3, num_classes=3, latent_dim=4,
                    num_filters=(8, 16), decoder_channels=8)
    x = jnp.zeros((2, 16, 16, 3))
    rngs = {"params": jax.random.key(0), "latent": jax.random.key(1)}
    variables = model.init(rngs, x, x, method=model.elbo)
    return model, variables["params"]


def test_elbo_surface_and_kl_to_standard_normal(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    total, recon, kl = model.apply({"params": params}, x, y, jnp.float32(0.5),
                                   rngs={"latent": jax.random.key(2)},
                                   method=model.elbo)
    assert np.isfinite(float(total)) and float(kl) >= 0
    np.testing.assert_allclose(float(total), float(recon) + 0.5 * float(kl),
                               rtol=1e-6)
    # KL is against N(0, I): closed form from the posterior the model built
    post = model.apply({"params": params}, x, y, method=lambda m, a, b: m.posterior(a, b))
    mu, ls = np.asarray(post.mu, np.float64), np.asarray(post.log_sigma, np.float64)
    kl_ref = 0.5 * (np.exp(2 * ls) + mu ** 2 - 1.0 - 2 * ls).sum()
    np.testing.assert_allclose(float(kl), kl_ref, rtol=1e-4)


def test_sample_shape_and_diversity(model_and_params):
    model, params = model_and_params
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 16, 16, 3)),
                    jnp.float32)
    draws = model.apply({"params": params}, x, 5,
                        rngs={"latent": jax.random.key(3)}, method=model.sample)
    assert draws.shape == (2, 5, 16, 16, 3)
    # standard-normal prior draws through the decoder must differ per member
    assert float(jnp.std(draws, axis=1).mean()) > 0


def test_vae_overfits_one_batch(model_and_params):
    """The ELBO decreases under training — the surface works end to end with
    the shared prob-U-Net train step."""
    import optax

    from probunet_tpu.train import create_train_state, make_probunet_train_step
    from probunet_tpu.train.state import make_optimizer

    model, params = model_and_params
    tx = make_optimizer(1e-3)
    state = create_train_state(params, tx)
    step = make_probunet_train_step(model, tx, 2, "none", donate=False)
    hr = jnp.asarray(np.random.default_rng(2).standard_normal((4, 16, 16, 3)),
                     jnp.float32)
    idx = jnp.arange(4)
    rng = jax.random.key(4)
    first = last = None
    for i in range(30):
        state, metrics = step(state, hr, None, idx, rng)
        if i == 0:
            first = float(metrics["train_loss"])
        last = float(metrics["train_loss"])
    assert last < first


def test_vae_e2e_driver(tmp_path):
    """scripts surface: --ds_model vae trains through train_baseline, writes a
    vae checkpoint, evaluates CRPS — everything the other models get."""
    import json

    datadir = os.path.join(str(tmp_path), "data")
    generate_climex_like(datadir, years=(2000, 2001, 2002), grid=16,
                         days_per_year=12)
    cfg = Config(datadir=datadir, years_train=(2000, 2001),
                 years_val=(2001, 2002), years_test=(2001, 2002),
                 coords=(0, 16, 0, 16), resolution=(16, 16), lowres_scale=4,
                 batch_size=4, num_epochs=1, log_every=2, ds_model="vae",
                 latent_dim=4, num_filters=(8, 16), baseline_channels=8,
                 eval_crps=True, crps_samples=3,
                 plotdir=os.path.join(str(tmp_path), "plots"),
                 checkpoints_dir=os.path.join(str(tmp_path), "ckpt"),
                 metrics_path=os.path.join(str(tmp_path), "m.jsonl"))
    res = train_baseline(cfg, make_plots=False)
    assert np.isfinite(res["tr_losses"]).all()
    assert os.path.isdir(os.path.join(cfg.checkpoints_dir, "vae"))
    with open(cfg.metrics_path) as fh:
        recs = [json.loads(l) for l in fh]
    assert any("crps_pr" in r for r in recs)

    # serving shares the prob-U-Net path too (build_probunet dispatch)
    from probunet_tpu.data.netcdf import NetCDFFile
    from probunet_tpu.serve import downscale
    out = downscale(cfg, os.path.join(cfg.checkpoints_dir, "vae"),
                    os.path.join(str(tmp_path), "vae.nc"), num_samples=3)
    with NetCDFFile(out) as f:
        pr = f.read_var("pr")
    assert pr.shape == (12, 3, 16, 16) and np.isfinite(pr).all()
