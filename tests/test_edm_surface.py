"""EDM user surface (round-3 VERDICT ask #5): ds_model="edm" trains the
diffusion downscaler end-to-end on synthetic data with a decreasing loss,
produces the epoch plots/checkpoints, and serves ensemble netCDF through
scripts/downscale.py's path — completing the 'make the reference's dead
EDMPrecond live' story (reference networks.py:339-389)."""

import json
import os

import numpy as np
import pytest

from probunet_tpu.config import Config
from probunet_tpu.data.netcdf import NetCDFFile
from probunet_tpu.data.synthetic import generate_climex_like
from probunet_tpu.serve import downscale
from probunet_tpu.train.loop import train_baseline


@pytest.fixture(scope="module")
def datadir(tmp_path_factory):
    d = tmp_path_factory.mktemp("climex_edm")
    generate_climex_like(str(d), years=(2000, 2001, 2002), grid=16,
                         days_per_year=30, seed=3)
    return str(d)


def _cfg(datadir, tmp_path, **kw):
    base = dict(
        datadir=datadir, years_train=(2000, 2001), years_val=(2001, 2002),
        years_test=(2002, 2003), coords=(0, 16, 0, 16), resolution=(16, 16),
        lowres_scale=2, batch_size=4, num_epochs=2, log_every=3,
        standardization="pertimestep", ds_model="edm",
        model_channels=8, channel_mult=(1, 2), num_blocks=1,
        attn_resolutions=(8,), num_samples=2, edm_steps=4,
        eval_crps=True, crps_samples=2,
        plotdir=os.path.join(str(tmp_path), "plots"),
        checkpoints_dir=os.path.join(str(tmp_path), "ckpt"))
    base.update(kw)
    return Config(**base)


def test_config_accepts_edm_and_rejects_unknown():
    assert Config(ds_model="edm").ds_model == "edm"
    with pytest.raises(ValueError):
        Config(ds_model="ddpm")


def test_train_edm_e2e_and_downscale(datadir, tmp_path):
    cfg = _cfg(datadir, tmp_path)
    # user surface: the baseline driver dispatches ds_model="edm"
    res = train_baseline(cfg, make_plots=True)
    assert len(res["tr_losses"]) == 2
    assert np.isfinite(res["tr_losses"]).all() and np.isfinite(res["val_losses"]).all()
    assert res["tr_losses"][-1] < res["tr_losses"][0], \
        f"DSM loss should decrease: {res['tr_losses']}"
    # artifacts: every-2-epochs diffusion ensemble plot, metrics, checkpoint
    assert os.path.exists(os.path.join(cfg.plotdir, "epoch2.png"))
    mpath = os.path.join(cfg.plotdir, "metrics_edm.jsonl")
    assert os.path.exists(mpath)
    recs = [json.loads(l) for l in open(mpath)]
    assert any("val_loss" in r for r in recs)
    # CRPS metric surface matches the probunet loop's
    crps = [r for r in recs if any(k.startswith("crps_") for k in r)]
    assert len(crps) == 2, "one Heun-ensemble CRPS record per epoch"
    for r in crps:
        for var in cfg.variables:
            assert np.isfinite(r[f"crps_{var}"])
            assert np.isfinite(r[f"ensmean_mae_{var}"])
    ckpt = os.path.join(cfg.checkpoints_dir, "edm")
    assert os.path.isdir(ckpt)

    # serving: checkpoint -> Heun-ensemble netCDF (scripts/downscale.py path)
    out = os.path.join(str(tmp_path), "downscaled_edm.nc")
    path = downscale(cfg, ckpt, out, num_samples=2)
    with NetCDFFile(path) as f:
        pr = f.read_var("pr")
        tasmin = f.read_var("tasmin")
    assert pr.shape == (30, 2, 16, 16)            # (T, members, H, W)
    assert np.isfinite(pr).all() and np.isfinite(tasmin).all()
    # members differ (independent noise seeds per chain batch row)
    assert pr.std(axis=1).mean() > 0
    assert tasmin.mean() > 200, "tasmin should be in Kelvin scale"


def test_edm_threads_remat_and_fast_attention():
    """EDMPrecond threads remat/fast_attention to its backbone UNet (VERDICT
    round-4 item 2 / missing #2): the fields exist, build_edm_model passes
    them from the config, and a remat'd forward still runs (remat is what
    makes the 256x256 diffusion configuration trainable in HBM)."""
    import jax
    import jax.numpy as jnp

    from probunet_tpu.config import Config
    from probunet_tpu.train.loop import build_edm_model

    cfg = Config(ds_model="edm", resolution=(16, 16), coords=(0, 16, 0, 16),
                 model_channels=8, channel_mult=(1, 2), num_blocks=1,
                 attn_resolutions=(8,), remat=True, fast_attention=True)
    model = build_edm_model(cfg)
    assert model.remat is True and model.fast_attention is True

    x = jnp.zeros((2, 16, 16, 3))
    var = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                     x, jnp.ones((2,)), condition_img=x)
    out = model.apply({"params": var["params"]}, x, jnp.ones((2,)),
                      condition_img=x)
    assert out.shape == (2, 16, 16, 3)

    # remat=False builds the identical parameter tree (remat is
    # execution-only, never a parameterization change)
    model2 = build_edm_model(cfg.replace(remat=False))
    var2 = model2.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                       x, jnp.ones((2,)), condition_img=x)
    t1 = jax.tree.structure(var["params"])
    t2 = jax.tree.structure(var2["params"])
    assert t1 == t2
