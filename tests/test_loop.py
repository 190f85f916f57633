"""Integration tests: full train_probunet / train_baseline loops on synthetic
netCDF data with tiny models (the reference's notebook smoke run, automated)."""

import os

import numpy as np
import pytest

from probunet_tpu.config import Config
from probunet_tpu.data.synthetic import generate_climex_like
from probunet_tpu.train.loop import load_datasets, run_bcsd, train_baseline, train_probunet


@pytest.fixture(scope="module")
def datadir(tmp_path_factory):
    d = tmp_path_factory.mktemp("climex_e2e")
    generate_climex_like(str(d), years=(2000, 2001, 2002), grid=32, days_per_year=30)
    return str(d)


def _cfg(datadir, tmp_path, **kw):
    base = dict(
        datadir=datadir,
        years_train=(2000, 2001),
        years_val=(2001, 2002),
        years_test=(2002, 2003),
        coords=(0, 32, 0, 32),
        resolution=(32, 32),
        lowres_scale=4,
        batch_size=4,
        num_epochs=2,
        log_every=3,
        latent_dim=4,
        num_filters=(8, 16),
        model_channels=8,
        channel_mult=(1, 2),
        num_blocks=1,
        attn_resolutions=(16,),
        plotdir=os.path.join(str(tmp_path), "plots"),
        checkpoints_dir=os.path.join(str(tmp_path), "ckpt"),
    )
    base.update(kw)
    return Config(**base)


def test_train_probunet_e2e(datadir, tmp_path):
    cfg = _cfg(datadir, tmp_path)
    res = train_probunet(cfg, make_plots=True)
    assert len(res["tr_losses"]) == 2
    assert np.isfinite(res["tr_losses"]).all() and np.isfinite(res["val_losses"]).all()
    # loss should drop between first and last epoch on this easy synthetic task
    assert res["tr_losses"][-1] < res["tr_losses"][0]
    # artifacts: loss curve + epoch-2 ensemble plot + metrics + checkpoint
    assert os.path.exists(os.path.join(cfg.plotdir, "loss.png"))
    assert os.path.exists(os.path.join(cfg.plotdir, "epoch2.png"))
    assert os.path.exists(os.path.join(cfg.plotdir, "metrics.jsonl"))
    assert os.path.isdir(os.path.join(cfg.checkpoints_dir, "probunet"))


def test_train_baseline_unet_e2e(datadir, tmp_path):
    cfg = _cfg(datadir, tmp_path, ds_model="deterministic_unet", num_epochs=1,
               baseline_channels=8)
    res = train_baseline(cfg, make_plots=True)
    for v in cfg.variables:
        assert np.isfinite(res["mae"][v])
        assert len(res["tr_losses"][v]) > 0
    # plot_batch sample figure + per-variable smoothed loss curves
    assert os.path.exists(os.path.join(
        cfg.plotdir, "epoch1_samples_from_deterministic_unet.png"))
    assert os.path.exists(os.path.join(cfg.plotdir, "loss_pr.png"))


def test_train_baseline_linearcnn_e2e(datadir, tmp_path):
    cfg = _cfg(datadir, tmp_path, ds_model="linearcnn", num_epochs=1)
    res = train_baseline(cfg, make_plots=False)
    assert all(np.isfinite(res["mae"][v]) for v in cfg.variables)


def test_bcsd_e2e(datadir, tmp_path):
    cfg = _cfg(datadir, tmp_path, ds_model="bcsd")
    out = run_bcsd(cfg, load_datasets(cfg))
    assert set(out) == {"val", "test"}
    for split in out.values():
        assert np.asarray(split["preds"]).shape == (30, 32, 32, 3)
        assert all(np.isfinite(m) for m in split["mae"].values())


def test_bcsd_chunked_matches_unchunked(datadir, tmp_path):
    """Chunked climatology accumulation (with a padded tail chunk) must equal
    the one-shot segment-sum implementation."""
    import jax.numpy as jnp
    from probunet_tpu.data import transforms
    from probunet_tpu.models import bcsd

    cfg = _cfg(datadir, tmp_path, ds_model="bcsd")
    datasets = load_datasets(cfg)
    out = run_bcsd(cfg, datasets, chunk=7)  # 30 days -> 4 full chunks + tail of 2
    ds_train, ds_val = datasets["train"], datasets["val"]
    train_pair = transforms.make_pair(ds_train.hr_device(), cfg.lowres_scale, "none", None)
    val_pair = transforms.make_pair(ds_val.hr_device(), cfg.lowres_scale, "none", None)
    ref = bcsd(ds_train.hr_device(), train_pair["lrinterp"], val_pair["lrinterp"],
               jnp.asarray(ds_train.dayofyear), jnp.asarray(ds_val.dayofyear))
    np.testing.assert_allclose(out["val"]["preds"], np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_train_baseline_streaming_mode(datadir, tmp_path):
    """Baseline loop in host-resident streaming mode (device_resident_data=False)."""
    cfg = _cfg(datadir, tmp_path, ds_model="linearcnn", num_epochs=1,
               device_resident_data=False)
    res = train_baseline(cfg, make_plots=False)
    assert all(np.isfinite(res["mae"][v]) for v in cfg.variables)


def test_train_baseline_resume(datadir, tmp_path):
    """Baseline resume is EXACT (same semantics as the other three drivers,
    VERDICT round-4 item 4): resuming a finished run is a no-op; extending
    num_epochs trains only the added epochs."""
    cfg = _cfg(datadir, tmp_path, ds_model="linearcnn", num_epochs=1)
    res1 = train_baseline(cfg, make_plots=False)
    steps1 = int(np.asarray(res1["state"].step))
    assert steps1 > 0
    ckpt = os.path.join(cfg.checkpoints_dir, "linearcnn")

    # finished run -> pure no-op (no extra steps)
    cfg2 = _cfg(datadir, tmp_path, ds_model="linearcnn", num_epochs=1, resume=ckpt)
    res2 = train_baseline(cfg2, make_plots=False)
    assert int(np.asarray(res2["state"].step)) == steps1

    # extend to 2 epochs -> exactly one more epoch trains
    cfg3 = _cfg(datadir, tmp_path, ds_model="linearcnn", num_epochs=2, resume=ckpt)
    res3 = train_baseline(cfg3, make_plots=False)
    assert int(np.asarray(res3["state"].step)) == 2 * steps1
