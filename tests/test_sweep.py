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
