"""Observability: scalar metric logging + progress + step timing.

The reference logs to wandb when available (train_prob_unet_model.py:94-99)
and always shows tqdm loss postfixes. Here a :class:`MetricLogger` fans out to
(a) a JSONL file (always — machine-readable run record), (b) wandb if the
package is importable and enabled, and (c) an optional tqdm bar. Scalar names
match the reference's (train_loss/recon_loss/kl_div, val_*) so dashboards and
sweeps transfer. The sweep metric-name bug in the reference (sweeps.yaml
minimizes 'val-loss' which is never logged) is avoided by logging both
aliases.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

try:
    import wandb as _wandb
except ImportError:  # pragma: no cover
    _wandb = None

try:
    from tqdm import tqdm
except ImportError:  # pragma: no cover
    tqdm = None


class MetricLogger:
    def __init__(self, jsonl_path: Optional[str] = None, use_wandb: bool = False,
                 wandb_project: str = "prob-unet-mds-tpu", wandb_config: Optional[dict] = None):
        self.jsonl_path = jsonl_path
        self._fh = None
        if jsonl_path:
            os.makedirs(os.path.dirname(os.path.abspath(jsonl_path)), exist_ok=True)
            self._fh = open(jsonl_path, "a")
        self.wandb_run = None
        if use_wandb:
            if _wandb is None:
                print("[probunet_tpu] wandb requested but not installed; logging to JSONL only")
            else:
                self.wandb_run = _wandb.init(project=wandb_project, config=wandb_config or {})

    def log(self, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        rec = {k: float(v) for k, v in metrics.items()}
        if "val_loss" in rec:
            rec["val-loss"] = rec["val_loss"]  # reference sweeps.yaml metric alias
        if step is not None:
            rec["step"] = int(step)
        rec["time"] = time.time()
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self.wandb_run is not None:
            self.wandb_run.log(rec, step=step)

    def log_param_histograms(self, params, step: Optional[int] = None) -> None:
        """Parameter-distribution logging — the parameter half of the
        reference's ``wandb.watch(model)`` (baseline/main.py:57-58). With a
        wandb run, full per-layer histograms go up as wandb.Histogram;
        the JSONL record always gets per-layer L2 norms (full histograms
        would bloat the machine-readable log)."""
        import jax
        import numpy as np

        flat = jax.tree_util.tree_flatten_with_path(jax.device_get(params))[0]
        def name(kp):
            return ".".join(str(getattr(k, "key", getattr(k, "idx", k)))
                            for k in kp)
        norms = {f"paramnorm/{name(kp)}": float(np.linalg.norm(np.asarray(v, np.float64)))
                 for kp, v in flat}
        self.log(norms, step=step)
        if self.wandb_run is not None:
            hists = {f"params/{name(kp)}": _wandb.Histogram(np.asarray(v))
                     for kp, v in flat}
            self.wandb_run.log(hists, step=step)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
        if self.wandb_run is not None:
            self.wandb_run.finish()


def progress(iterable, desc: str = "", total: Optional[int] = None):
    if tqdm is None:
        return iterable
    return tqdm(iterable, desc=desc, total=total, dynamic_ncols=True)


class StepTimer:
    """Wall-clock steps/sec over a sliding window; optional jax.profiler trace."""

    def __init__(self, profile_dir: str = ""):
        self.t0 = time.perf_counter()
        self.count = 0
        self.profile_dir = profile_dir
        self._tracing = False

    def start_trace(self):
        if self.profile_dir and not self._tracing:
            import jax
            jax.profiler.start_trace(self.profile_dir)
            self._tracing = True

    def stop_trace(self):
        if self._tracing:
            import jax
            jax.profiler.stop_trace()
            self._tracing = False

    def tick(self, n: int = 1):
        self.count += n

    def rate(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.count / dt if dt > 0 else 0.0

    def reset(self):
        self.t0 = time.perf_counter()
        self.count = 0
