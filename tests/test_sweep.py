"""Sweep runner tests (grid expansion + end-to-end over a stub train fn)."""

import os

import numpy as np

from probunet_tpu.config import Config
from probunet_tpu.train.sweep import grid_points, load_sweep, run_sweep


def _write_sweep(tmp_path, text):
    p = os.path.join(str(tmp_path), "sweep.yaml")
    with open(p, "w") as f:
        f.write(text)
    return p


def test_grid_points(tmp_path):
    p = _write_sweep(tmp_path, """
method: grid
metric: {name: val-loss, goal: minimize}
parameters:
  batch_size: {values: [8, 16]}
  latent_dim: {values: [2, 4, 6]}
""")
    pts = grid_points(load_sweep(p))
    assert len(pts) == 6
    assert {"batch_size": 16, "latent_dim": 4} in pts


def test_run_sweep_with_stub(tmp_path):
    p = _write_sweep(tmp_path, """
method: grid
metric: {name: val-loss, goal: minimize}
parameters:
  batch_size: {values: [4, 8]}
  beta: {values: [0.1, 1.0]}
""")
    cfg = Config(plotdir=str(tmp_path), checkpoints_dir=str(tmp_path))
    seen = []

    def fake_train(cfg):
        seen.append((cfg.batch_size, cfg.beta))
        return {"val_losses": [float(cfg.batch_size) * cfg.beta]}

    out_path = os.path.join(str(tmp_path), "res.json")
    res = run_sweep(p, cfg, out_path=out_path, train_fn=fake_train)
    assert len(res["runs"]) == 4
    assert res["best"]["point"] == {"batch_size": 4, "beta": 0.1}
    assert res["metric"] == "val_loss"  # 'val-loss' alias resolved
    assert os.path.exists(out_path)
    assert len(seen) == 4


def test_sweep_resolves_jsonl_metrics(tmp_path):
    """A sweep can optimize ANY metric the training loop logs (VERDICT
    round-4 item 6): metrics that live only in the run's metrics JSONL (CRPS,
    ensemble-mean MAE) resolve from the file, last record wins."""
    p = _write_sweep(tmp_path, """
method: grid
metric: {name: crps_pr, goal: minimize}
parameters:
  latent_dim: {values: [2, 4]}
""")
    cfg = Config(plotdir=os.path.join(str(tmp_path), "runs"),
                 checkpoints_dir=os.path.join(str(tmp_path), "ckpt"))

    def fake_train(cfg):
        # mimic the real loop: CRPS metrics appear only in the metrics JSONL
        import json
        os.makedirs(cfg.plotdir, exist_ok=True)
        path = os.path.join(cfg.plotdir, "metrics.jsonl")
        with open(path, "w") as f:
            f.write(json.dumps({"train_loss": 1.0, "step": 1}) + "\n")
            f.write(json.dumps({"crps_pr": 10.0, "step": 2}) + "\n")
            # last record wins (final-epoch value)
            f.write(json.dumps({"crps_pr": float(cfg.latent_dim), "step": 4}) + "\n")
        return {"val_losses": [0.5]}

    res = run_sweep(p, cfg, train_fn=fake_train)
    assert res["best"]["point"] == {"latent_dim": 2}
    assert res["best"]["value"] == 2.0


def test_sweep_crps_metric_end_to_end(tmp_path, datadir_small):
    """REAL micro-sweep over latent_dim minimizing crps_pr through the full
    training loop (eval_crps on): proves the JSONL metric path against the
    loop's actual log format, not a stub."""
    p = _write_sweep(tmp_path, """
method: grid
metric: {name: crps_pr, goal: minimize}
parameters:
  latent_dim: {values: [2, 4]}
""")
    cfg = Config(
        datadir=datadir_small,
        years_train=(2000, 2001), years_val=(2001, 2002),
        years_test=(2002, 2003),
        coords=(0, 16, 0, 16), resolution=(16, 16), lowres_scale=4,
        batch_size=4, num_epochs=1, log_every=2,
        num_filters=(8,), model_channels=8, channel_mult=(1, 2),
        num_blocks=1, attn_resolutions=(8,),
        eval_crps=True, crps_samples=2,
        plotdir=os.path.join(str(tmp_path), "plots"),
        checkpoints_dir=os.path.join(str(tmp_path), "ckpt"))
    res = run_sweep(p, cfg)
    assert len(res["runs"]) == 2
    assert res["metric"] == "crps_pr"
    for r in res["runs"]:
        assert np.isfinite(r["value"]) and r["value"] > 0
    assert res["best"]["value"] == min(r["value"] for r in res["runs"])


def test_resolve_metric_handles_baseline_dict_result(tmp_path):
    """The baseline driver returns per-variable DICTS for val_losses —
    _resolve_metric must fall through to the JSONL (and report a clear error
    if the metric isn't there), not crash on ['val_losses'][-1]
    (code-review round-5 finding #2)."""
    import pytest

    from probunet_tpu.train.sweep import _resolve_metric

    cfg = Config(plotdir=os.path.join(str(tmp_path), "none"))
    baseline_result = {"val_losses": {"pr": [1.0], "tasmin": [2.0]},
                       "tr_losses": {"pr": [0.5]},
                       "mae": {"pr": 3.0}}
    # mae_<var> resolves from the result dict
    assert _resolve_metric(baseline_result, "mae_pr", cfg) == 3.0
    # val_loss falls through past the dict and reports a clear error
    with pytest.raises(KeyError, match="not found"):
        _resolve_metric(baseline_result, "val_loss", cfg)
