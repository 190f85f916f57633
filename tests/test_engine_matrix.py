"""Driver x lifecycle-feature matrix (VERDICT round-4 item 1).

All four training drivers are thin configurations of ONE engine
(probunet_tpu/train/engine.py), so every lifecycle flag —
``--checkpoint_every`` / ``--max_steps`` / exact resume / ``--watch_every`` /
streaming ingest (``--device_resident_data false``) / scheduled-β eval —
must work identically in each. These tests pin the features the engine
newly delivered to the EDM, spatial and baseline drivers (the DP prob-U-Net
loop's equivalents are covered by tests/test_round{3,4}_fixes.py) plus the
scheduled-β eval contract.
"""

import json
import os

import numpy as np
import pytest

from probunet_tpu.config import Config
from probunet_tpu.train.loop import train_baseline, train_edm, train_probunet


def _cfg(datadir, tmp_path, tag, **kw):
    base = dict(
        datadir=datadir,
        years_train=(2000, 2001), years_val=(2001, 2002),
        years_test=(2002, 2003),
        coords=(0, 16, 0, 16), resolution=(16, 16), lowres_scale=4,
        batch_size=4, num_epochs=1, log_every=1,
        latent_dim=4, num_filters=(8,), model_channels=8,
        channel_mult=(1, 2), num_blocks=1, attn_resolutions=(8,),
        plotdir=os.path.join(str(tmp_path), f"plots_{tag}"),
        checkpoints_dir=os.path.join(str(tmp_path), f"ckpt_{tag}"),
        metrics_path=os.path.join(str(tmp_path), f"metrics_{tag}.jsonl"),
    )
    base.update(kw)
    return Config(**base)


def _records(path):
    with open(path) as fh:
        return [json.loads(l) for l in fh]


def _train_losses(path):
    return [r["train_loss"] for r in _records(path) if "train_loss" in r]


# ---------------------------------------------------------------- EDM driver

def test_edm_max_steps_and_exact_resume(datadir_small, tmp_path):
    """EDM inherits --max_steps / --checkpoint_every / exact resume from the
    engine: an interrupted run resumed to completion equals an uninterrupted
    run step-for-step (same batch/noise sequence)."""
    kw = dict(ds_model="edm", edm_steps=2)
    # uninterrupted oracle: 4 steps (16 train days, batch 4)
    cfg_full = _cfg(datadir_small, tmp_path, "edm_full", **kw)
    train_edm(cfg_full, make_plots=False)
    full = _train_losses(cfg_full.metrics_path)
    assert len(full) == 4

    # interrupted at step 2, then resumed
    cfg_a = _cfg(datadir_small, tmp_path, "edm_a", max_steps=2, **kw)
    res_a = train_edm(cfg_a, make_plots=False)
    assert int(np.asarray(res_a["state"].step)) == 2
    ckpt = os.path.join(cfg_a.checkpoints_dir, "edm")
    cfg_b = _cfg(datadir_small, tmp_path, "edm_b", resume=ckpt, **kw)
    res_b = train_edm(cfg_b, make_plots=False)
    assert int(np.asarray(res_b["state"].step)) == 4
    seq = _train_losses(cfg_a.metrics_path) + _train_losses(cfg_b.metrics_path)
    np.testing.assert_allclose(seq, full, rtol=1e-5)


def test_edm_watch_every_logs_layers(datadir_small, tmp_path):
    """--watch_every works for the EDM driver (engine-supplied): per-layer
    gradient norms + parameter norms at the watch cadence."""
    cfg = _cfg(datadir_small, tmp_path, "edm_watch", ds_model="edm",
               edm_steps=2, watch_every=2)
    train_edm(cfg, make_plots=False)
    recs = _records(cfg.metrics_path)
    grad_recs = [r for r in recs if any(k.startswith("gradnorm/") for k in r)]
    param_recs = [r for r in recs if any(k.startswith("paramnorm/") for k in r)]
    assert grad_recs and param_recs
    assert all(r["step"] % 2 == 0 for r in grad_recs)


def test_edm_streaming_matches_resident(datadir_small, tmp_path):
    """EDM gains the streaming-ingest branch (VERDICT round-4 item 8 /
    missing #4): host-resident double-buffered batches produce the identical
    training trajectory as the device-resident gather path (standardization
    'none' removes the only (fp-noise-level) stats-path difference)."""
    kw = dict(ds_model="edm", edm_steps=2, standardization="none")
    cfg_r = _cfg(datadir_small, tmp_path, "edm_res", **kw)
    train_edm(cfg_r, make_plots=False)
    cfg_s = _cfg(datadir_small, tmp_path, "edm_str",
                 device_resident_data=False, **kw)
    train_edm(cfg_s, make_plots=False)
    np.testing.assert_allclose(_train_losses(cfg_s.metrics_path),
                               _train_losses(cfg_r.metrics_path), rtol=1e-6)


# ------------------------------------------------------------ spatial driver

SPATIAL_KW = dict(parallel_mode="spatial", coords=(0, 32, 0, 32),
                  resolution=(32, 32), num_filters=(8, 16),
                  attn_resolutions=(16,))


@pytest.fixture(scope="module")
def datadir32(tmp_path_factory):
    from probunet_tpu.data.synthetic import generate_climex_like
    d = tmp_path_factory.mktemp("climex_sp32")
    generate_climex_like(str(d), years=(2000, 2001, 2002), grid=32,
                         days_per_year=8)
    return str(d)


def test_spatial_streaming_matches_resident(datadir32, tmp_path):
    """The spatial driver now honors --device_resident_data (VERDICT round-4
    item 8): streaming (double-buffered host->device — the spatial default,
    'auto' resolves to streaming here) and resident (dataset tensor in HBM,
    gathered in the jitted pair reshard) produce identical losses."""
    kw = dict(standardization="none", **SPATIAL_KW)
    cfg_r = _cfg(datadir32, tmp_path, "sp_res", device_resident_data=True, **kw)
    assert not _cfg(datadir32, tmp_path, "sp_auto", **kw).resident_data
    res_r = train_probunet(cfg_r, make_plots=False)
    cfg_s = _cfg(datadir32, tmp_path, "sp_str", device_resident_data=False, **kw)
    res_s = train_probunet(cfg_s, make_plots=False)
    np.testing.assert_allclose(_train_losses(cfg_s.metrics_path),
                               _train_losses(cfg_r.metrics_path), rtol=1e-6)
    np.testing.assert_allclose(res_s["val_losses"], res_r["val_losses"],
                               rtol=1e-6)


def test_spatial_max_steps_watch_and_resume(datadir32, tmp_path):
    """Spatial inherits --max_steps, --checkpoint_every, --watch_every and
    exact resume from the engine."""
    cfg = _cfg(datadir32, tmp_path, "sp_life", max_steps=1, watch_every=1,
               **SPATIAL_KW)
    res = train_probunet(cfg, make_plots=False)
    assert int(np.asarray(res["state"].step)) == 1
    recs = _records(cfg.metrics_path)
    assert any(any(k.startswith("gradnorm/") for k in r) for r in recs)
    ckpt = os.path.join(cfg.checkpoints_dir, "probunet")
    cfg_b = _cfg(datadir32, tmp_path, "sp_life_b", resume=ckpt, **SPATIAL_KW)
    res_b = train_probunet(cfg_b, make_plots=False)
    assert int(np.asarray(res_b["state"].step)) == 2  # 8 days b4 -> 2 steps/epoch


def test_pure_spatial_multiprocess_error_is_instructive():
    """Pure --parallel_mode spatial under multi-process must point at the
    2d composition instead of a dead-end (VERDICT round-4 item 10)."""
    import inspect

    from probunet_tpu.parallel import spatial_train
    src = inspect.getsource(spatial_train.train_probunet_spatial)
    assert "--parallel_mode 2d --mesh_shape" in src


# ----------------------------------------------------------- baseline driver

def test_baseline_max_steps_checkpoint_every(datadir_small, tmp_path):
    """The baseline driver inherits --max_steps + --checkpoint_every +
    max_steps-noop-resume from the engine (it previously had none of them)."""
    cfg = _cfg(datadir_small, tmp_path, "bl", ds_model="linearcnn",
               max_steps=2, checkpoint_every=1)
    res = train_baseline(cfg, make_plots=False)
    assert int(np.asarray(res["state"].step)) == 2
    ckpt = os.path.join(cfg.checkpoints_dir, "linearcnn")
    assert os.path.isdir(ckpt)
    # resume at max_steps: pure no-op
    cfg2 = _cfg(datadir_small, tmp_path, "bl2", ds_model="linearcnn",
                max_steps=2, resume=ckpt)
    res2 = train_baseline(cfg2, make_plots=False)
    assert int(np.asarray(res2["state"].step)) == 2
    assert res2["tr_losses"] == []


# ------------------------------------------------------------ scheduled beta

def test_eval_beta_follows_schedule(datadir_small, tmp_path):
    """With --beta_schedule linear mid-warmup, the eval ELBO uses the SAME
    scheduled β as training (VERDICT round-4 item 5 / weak #2), not the full
    target β; the epoch record logs it as val_beta."""
    beta = 0.8
    cfg = _cfg(datadir_small, tmp_path, "beta", beta=beta,
               beta_schedule="linear", beta_warmup_steps=100)
    train_probunet(cfg, make_plots=False)
    recs = [r for r in _records(cfg.metrics_path) if "val_beta" in r]
    assert recs
    # 4 steps of a 100-step warmup: β = 0.8 * 4/100, NOT 0.8
    expected = beta * recs[-1]["step"] / 100
    np.testing.assert_allclose(recs[-1]["val_beta"], expected, rtol=1e-6)
    assert recs[-1]["val_beta"] < 0.1 * beta
