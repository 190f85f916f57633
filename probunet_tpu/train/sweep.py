"""Hyperparameter sweeps (reference sweeps.yaml + wandb agent).

Reads a wandb-style sweep YAML (``method: grid``, ``parameters: {name:
{values: [...]}}``, ``metric: {name, goal}``) and runs the training pipeline
for every grid point, locally, recording the optimization metric per run and
returning the best configuration. The reference's sweep minimizes
``val-loss`` (sweeps.yaml:5-7) — a key its training loop never actually logs
(it logs ``val_loss``); both spellings are accepted here.

Runs execute in-process sequentially (one accelerator) — each run is already
fully device-parallel; wandb, when installed and enabled, receives per-run
logs through the standard MetricLogger.
"""

from __future__ import annotations

import glob
import itertools
import json
import os
from typing import Dict, List, Optional

import yaml

from probunet_tpu.config import Config


def load_sweep(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f)


def grid_points(sweep: Dict) -> List[Dict]:
    params = sweep.get("parameters", {})
    names, valuess = [], []
    for name, spec in params.items():
        names.append(name)
        valuess.append(spec["values"] if isinstance(spec, dict) else list(spec))
    return [dict(zip(names, combo)) for combo in itertools.product(*valuess)]


def _metric_name(sweep: Dict) -> str:
    name = (sweep.get("metric") or {}).get("name", "val_loss")
    return "val_loss" if name == "val-loss" else name


def _resolve_metric(result: Dict, metric: str, cfg: Config) -> float:
    """Value of the optimization metric for one finished run.

    ``val_loss`` comes straight from the train result; any other metric name
    (e.g. ``crps_pr``, ``ensmean_mae_tasmax``, ``mae_pr``) is read from the
    run's metrics JSONL — the last record containing the key wins, so
    per-epoch metrics resolve to their final-epoch value. This is what lets a
    sweep optimize anything the training loop logs, not just loss-shaped
    keys in the result dict."""
    if metric == "val_loss":
        vl = result.get("val_losses")
        # the baseline driver's val_losses is a per-variable DICT — fall
        # through to the JSONL lookup for it instead of indexing [-1]
        if isinstance(vl, (list, tuple)) and vl \
                and not isinstance(vl[-1], (dict, list, tuple)):
            return float(vl[-1])
    if metric in result and not isinstance(result[metric], (dict, list, tuple)):
        return float(result[metric])
    if isinstance(result.get("mae"), dict) and metric.startswith("mae_"):
        var = metric[len("mae_"):]
        if var in result["mae"]:
            return float(result["mae"][var])
    paths = ([cfg.metrics_path] if cfg.metrics_path else
             sorted(glob.glob(os.path.join(cfg.plotdir, "metrics*.jsonl"))))
    for path in paths:
        if not os.path.exists(path):
            continue
        value = None
        with open(path) as fh:
            for line in fh:
                rec = json.loads(line)
                if metric in rec:
                    value = rec[metric]
        if value is not None:
            return float(value)
    raise KeyError(
        f"sweep metric {metric!r} not found in the run result or in the "
        f"run's metrics files ({paths}); check the sweep YAML's metric.name "
        "against the keys the training loop logs")


def run_sweep(sweep_path: str, base_cfg: Config, out_path: Optional[str] = None,
              train_fn=None) -> Dict:
    """Execute the grid; returns {"runs": [...], "best": {...}}."""
    from probunet_tpu.train.loop import train_probunet

    sweep = load_sweep(sweep_path)
    train_fn = train_fn or (lambda cfg: train_probunet(cfg, make_plots=False))
    metric = _metric_name(sweep)
    goal = (sweep.get("metric") or {}).get("goal", "minimize")
    sign = 1.0 if goal == "minimize" else -1.0

    runs = []
    for i, point in enumerate(grid_points(sweep)):
        overrides = {k: v for k, v in point.items() if hasattr(base_cfg, k)}
        cfg = base_cfg.replace(**overrides)
        cfg = cfg.replace(plotdir=os.path.join(base_cfg.plotdir, f"sweep_{i}"),
                          checkpoints_dir=os.path.join(base_cfg.checkpoints_dir, f"sweep_{i}"))
        result = train_fn(cfg)
        value = _resolve_metric(result, metric, cfg)
        runs.append({"point": point, "metric": metric, "value": float(value)})
        print(f"[sweep {i}] {point} -> {metric}={value:.4f}")

    best = min(runs, key=lambda r: sign * r["value"])
    out = {"runs": runs, "best": best, "metric": metric, "goal": goal}
    if out_path:
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=2)
    return out


def run_wandb_agent(sweep_path: str, base_cfg: Config, train_fn=None,
                    count: Optional[int] = None, project: Optional[str] = None) -> str:
    """Drive the sweep through a real wandb agent — the reference's workflow
    (``wandb sweep sweeps.yaml && wandb agent <id>``, sweeps.yaml:1-14).
    Requires wandb to be importable; the local grid (:func:`run_sweep`) is the
    fallback. The metric is reported under the sweep's own declared name, so
    the reference YAML's ``val-loss`` spelling optimizes correctly here even
    though the training loop logs ``val_loss``."""
    import wandb

    from probunet_tpu.train.loop import train_probunet

    sweep = load_sweep(sweep_path)
    raw_metric = (sweep.get("metric") or {}).get("name", "val_loss")
    metric = _metric_name(sweep)
    train_fn = train_fn or (lambda cfg: train_probunet(cfg, make_plots=False))
    sweep_id = wandb.sweep(sweep, project=project or sweep.get("project", "probunet_tpu"))

    def _run():
        with wandb.init() as run:
            overrides = {k: v for k, v in dict(run.config).items()
                         if hasattr(base_cfg, k)}
            overrides["wandb"] = False  # the agent owns the run; avoid nesting
            cfg = base_cfg.replace(**overrides)
            result = train_fn(cfg)
            run.log({raw_metric: _resolve_metric(result, metric, cfg)})

    wandb.agent(sweep_id, function=_run, count=count)
    return sweep_id
