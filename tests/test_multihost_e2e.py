"""REAL 2-process jax.distributed training parity (VERDICT round-2 ask #1).

Two subprocesses (4 virtual CPU devices each) form one 8-device global mesh
via ``jax.distributed.initialize`` and run the production ``train_probunet``
loop end-to-end: year-sharded ingest per process, GLOBAL perpixel stats via
the cross-process moment all-reduce, lockstep stratified global batches
assembled with ``make_array_from_process_local_data``, gradient all-reduce
by XLA/Gloo.

Parity oracle: a single process (8 devices) running the same loop with
``--data_shards 2`` — which makes the single process compute the *identical*
global batch plan and global stats over the full year range. Per-step train
losses and the epoch val loss must agree (tolerances cover cross-host
reduction-order float noise; step 1 is pre-divergence and must be tight).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from probunet_tpu.data.synthetic import generate_climex_like

# These spawn REAL 2-process jax.distributed runs and dominate the suite's
# wall clock; `pytest -m "not slow"` gives the fast dev tier (CLAUDE.md).
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "_multihost_child.py")
ALLREDUCE_CHILD = os.path.join(REPO, "tests", "_allreduce_child.py")
SERVE_CHILD = os.path.join(REPO, "tests", "_serve_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _flags(datadir, metrics_path, plotdir, extra=()):
    return [
        # derived from the metrics path so BOTH processes of a leg share one
        # checkpoint dir (orbax multi-process saves coordinate on it)
        "--checkpoints_dir", metrics_path + "_ckpt",
        "--datadir", datadir,
        "--years_train", "2000,2004", "--years_val", "2004,2005",
        "--years_test", "2005,2006",
        "--coords", "0,16,0,16", "--resolution", "16,16",
        "--lowres_scale", "4", "--standardization", "perpixel",
        "--batch_size", "8", "--num_epochs", "1", "--log_every", "1",
        "--latent_dim", "4", "--num_filters", "8,16",
        "--model_channels", "8", "--channel_mult", "1,2",
        "--num_blocks", "1", "--attn_resolutions", "8",
        "--lr", "1e-3", "--seed", "42",
        "--metrics_path", metrics_path, "--plotdir", plotdir,
        *extra,
    ]


def _env(n_devices, **extra):
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    # replace any inherited device-count flag with this leg's
    flags = " ".join(f for f in flags.split()
                     if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (flags +
                        f" --xla_force_host_platform_device_count={n_devices}").strip()
    env["JAX_PLATFORMS"] = "cpu"
    env.update({k: str(v) for k, v in extra.items()})
    return env


def _read_losses(path):
    steps, val = [], None
    with open(path) as fh:
        for line in fh:
            rec = json.loads(line)
            if "train_loss" in rec:
                steps.append(rec["train_loss"])
            if "val_loss" in rec:
                val = rec["val_loss"]
    return np.asarray(steps), val


@pytest.mark.skipif(sys.platform != "linux", reason="gloo transport")
def test_two_process_training_matches_single_process(tmp_path):
    datadir = str(tmp_path / "data")
    generate_climex_like(datadir, years=range(2000, 2006), grid=16,
                         days_per_year=16, seed=7)

    # ---- leg A: one process, 8 devices, simulated 2-shard batch plan ----
    m_single = str(tmp_path / "single.jsonl")
    cmd = [sys.executable, CHILD] + _flags(datadir, m_single,
                                           str(tmp_path / "plots_s"),
                                           extra=("--data_shards", "2"))
    proc = subprocess.run(cmd, env=_env(8), cwd=REPO, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, f"single-process leg failed:\n{proc.stderr[-4000:]}"

    # ---- leg B: two REAL processes, 4 devices each, one 8-device mesh ----
    port = _free_port()
    m_multi = str(tmp_path / "multi.jsonl")
    procs = []
    for pid in (0, 1):
        env = _env(4, COORDINATOR_ADDRESS=f"localhost:{port}",
                   PROBUNET_NUM_PROCESSES=2, PROBUNET_PROCESS_ID=pid)
        cmd = [sys.executable, CHILD] + _flags(datadir, m_multi,
                                               str(tmp_path / f"plots_m{pid}"))
        procs.append(subprocess.Popen(cmd, env=env, cwd=REPO,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    # ---- parity: per-step train losses + epoch val loss ----
    tr_s, val_s = _read_losses(m_single)
    tr_m, val_m = _read_losses(m_multi)
    # 4 train years x 16 days = 64 samples, batch 8 stratified over 2 shards
    # -> 8 lockstep steps per epoch on BOTH legs
    assert len(tr_s) == len(tr_m) == 8, (len(tr_s), len(tr_m))
    # step 1 runs on identical params + identical global batch: only
    # cross-host reduction order differs
    np.testing.assert_allclose(tr_m[0], tr_s[0], rtol=1e-5)
    # full-epoch trajectory: float noise compounds through the optimizer
    np.testing.assert_allclose(tr_m, tr_s, rtol=5e-3)
    assert val_s is not None and val_m is not None
    np.testing.assert_allclose(val_m, val_s, rtol=5e-3)


@pytest.mark.skipif(sys.platform != "linux", reason="gloo transport")
def test_two_process_edm_training_matches_single_process(tmp_path):
    """Multi-process EDM training (VERDICT round-3 ask #3): the diffusion
    driver rides the same MultihostPlan as the prob-U-Net loop; a REAL
    2-process run must match the single-process --data_shards 2 oracle."""
    datadir = str(tmp_path / "data")
    generate_climex_like(datadir, years=range(2000, 2006), grid=16,
                         days_per_year=16, seed=7)
    edm_flags = ("--ds_model", "edm", "--edm_steps", "2")

    m_single = str(tmp_path / "single_edm.jsonl")
    cmd = [sys.executable, CHILD] + _flags(datadir, m_single,
                                           str(tmp_path / "plots_se"),
                                           extra=(*edm_flags, "--data_shards", "2"))
    proc = subprocess.run(cmd, env=_env(8), cwd=REPO, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, f"single-process EDM leg failed:\n{proc.stderr[-4000:]}"

    port = _free_port()
    m_multi = str(tmp_path / "multi_edm.jsonl")
    procs = []
    for pid in (0, 1):
        env = _env(4, COORDINATOR_ADDRESS=f"localhost:{port}",
                   PROBUNET_NUM_PROCESSES=2, PROBUNET_PROCESS_ID=pid)
        cmd = [sys.executable, CHILD] + _flags(datadir, m_multi,
                                               str(tmp_path / f"plots_me{pid}"),
                                               extra=edm_flags)
        procs.append(subprocess.Popen(cmd, env=env, cwd=REPO,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"EDM process {pid} failed:\n{out[-4000:]}"

    tr_s, val_s = _read_losses(m_single)
    tr_m, val_m = _read_losses(m_multi)
    assert len(tr_s) == len(tr_m) == 8, (len(tr_s), len(tr_m))
    np.testing.assert_allclose(tr_m[0], tr_s[0], rtol=1e-5)
    np.testing.assert_allclose(tr_m, tr_s, rtol=5e-3)
    assert val_s is not None and val_m is not None
    np.testing.assert_allclose(val_m, val_s, rtol=5e-3)


@pytest.mark.skipif(sys.platform != "linux", reason="gloo transport")
def test_two_process_2d_spatial_training_matches_single_process(tmp_path):
    """2D (data x spatial) composed parallelism across REAL processes
    (VERDICT round-3 ask #4): mesh (2, 4) where the batch 'data' axis spans
    the two processes and H shards over each process's 4 devices. Parity
    oracle: one 8-device process with --data_shards 2 on the identical mesh."""
    datadir = str(tmp_path / "data")
    generate_climex_like(datadir, years=range(2000, 2006), grid=16,
                         days_per_year=16, seed=7)
    # eval_crps exercises the multiprocess H-sharded ensemble decode
    # (_spatial_ensemble_physical multiprocess=True: global upload ->
    # collective sampler on all processes -> replicated gather)
    sp_flags = ("--parallel_mode", "2d", "--mesh_shape", "2,-1",
                "--eval_crps", "true", "--crps_samples", "2",
                "--crps_eval_batches", "2")

    m_single = str(tmp_path / "single_2d.jsonl")
    cmd = [sys.executable, CHILD] + _flags(datadir, m_single,
                                           str(tmp_path / "plots_s2d"),
                                           extra=(*sp_flags, "--data_shards", "2"))
    proc = subprocess.run(cmd, env=_env(8), cwd=REPO, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, f"single-process 2d leg failed:\n{proc.stderr[-4000:]}"

    port = _free_port()
    m_multi = str(tmp_path / "multi_2d.jsonl")
    procs = []
    for pid in (0, 1):
        env = _env(4, COORDINATOR_ADDRESS=f"localhost:{port}",
                   PROBUNET_NUM_PROCESSES=2, PROBUNET_PROCESS_ID=pid)
        cmd = [sys.executable, CHILD] + _flags(datadir, m_multi,
                                               str(tmp_path / f"plots_m2d{pid}"),
                                               extra=sp_flags)
        procs.append(subprocess.Popen(cmd, env=env, cwd=REPO,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"2d process {pid} failed:\n{out[-4000:]}"

    tr_s, val_s = _read_losses(m_single)
    tr_m, val_m = _read_losses(m_multi)
    assert len(tr_s) == len(tr_m) == 8, (len(tr_s), len(tr_m))
    np.testing.assert_allclose(tr_m[0], tr_s[0], rtol=1e-5)
    np.testing.assert_allclose(tr_m, tr_s, rtol=5e-3)
    assert val_s is not None and val_m is not None
    np.testing.assert_allclose(val_m, val_s, rtol=5e-3)

    # multiprocess ensemble-CRPS decode matches the single-process oracle
    def crps_rec(path):
        with open(path) as fh:
            recs = [json.loads(l) for l in fh if "crps_pr" in l]
        return recs[-1]
    c_s, c_m = crps_rec(m_single), crps_rec(m_multi)
    assert c_m["crps_batches_evaluated"] == 2
    for k in ("crps_pr", "crps_tasmin", "crps_tasmax"):
        np.testing.assert_allclose(c_m[k], c_s[k], rtol=5e-3)


def _kelvin_half_century(pid: int):
    """Keep in sync with tests/_allreduce_child.py::local_moments."""
    rng = np.random.default_rng(1234 + pid)
    x = 273.0 + 5.0 * rng.standard_normal((18250, 4, 4, 3))
    s1 = x.sum(axis=0, dtype=np.float64)
    s2 = np.square(x, dtype=np.float64).sum(axis=0, dtype=np.float64)
    return x, s1, s2


@pytest.mark.skipif(sys.platform != "linux", reason="gloo transport")
def test_two_process_f64_allreduce_is_bitexact(tmp_path):
    """Kelvin-scale century-length moments through the cross-process
    all-reduce must match a single-host float64 pass bit-for-bit (VERDICT
    round-3 weak #1: the transport used to silently canonicalize f64→f32,
    cancelling catastrophically in ``s2 - n·mean²``)."""
    port = _free_port()
    out = str(tmp_path / "mom")
    procs = []
    for pid in (0, 1):
        env = _env(1, COORDINATOR_ADDRESS=f"localhost:{port}",
                   PROBUNET_NUM_PROCESSES=2, PROBUNET_PROCESS_ID=pid)
        procs.append(subprocess.Popen(
            [sys.executable, ALLREDUCE_CHILD, out], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{o[-4000:]}"

    r0 = np.load(out + ".p0.npz")
    r1 = np.load(out + ".p1.npz")

    # single-host float64 reference over the union of both halves
    x0, s1_0, s2_0 = _kelvin_half_century(0)
    x1, s1_1, s2_1 = _kelvin_half_century(1)
    s1_ref = s1_0 + s1_1
    s2_ref = s2_0 + s2_1
    n_ref = x0.shape[0] + x1.shape[0]

    for r in (r0, r1):
        # the transport must be BIT-exact, not merely close
        np.testing.assert_array_equal(r["rs1"], s1_ref)
        np.testing.assert_array_equal(r["rs2"], s2_ref)
        assert int(r["rn"]) == n_ref
        np.testing.assert_array_equal(r["counts"],
                                      [16_777_217, 16_777_218])

    # derived std matches a direct f64 std over the raw union data
    data = np.concatenate([x0, x1], axis=0)
    std_ref = data.std(axis=0, ddof=1, dtype=np.float64)
    np.testing.assert_allclose(r0["std"], std_ref, rtol=1e-6)

    # the test has teeth: an f32 transport of the same moments would violate
    # the tolerance (this is the failure mode the bit transport fixes)
    s2_f32 = (s2_0.astype(np.float32) + s2_1.astype(np.float32)).astype(np.float64)
    mean = s1_ref / n_ref
    var_f32 = (s2_f32 - n_ref * mean * mean) / (n_ref - 1)
    std_f32 = np.sqrt(np.maximum(var_f32, 0.0))
    worst = np.max(np.abs(std_f32 - std_ref) / std_ref)
    assert worst > 1e-6, f"f32 simulation unexpectedly accurate ({worst:.2e})"


@pytest.mark.skipif(sys.platform != "linux", reason="gloo transport")
def test_two_process_serving_matches_single_process(tmp_path):
    """Multi-process serving (VERDICT round-4 item 3): two jax.distributed
    processes each downscale their contiguous batch range and the primary
    merges the part files; the merged per-variable fields must be
    BYTE-identical to a single-process run of the same checkpoint (every
    process evaluates the same dataset/stats and folds the sampling RNG on
    the GLOBAL batch index)."""
    from probunet_tpu.config import Config
    from probunet_tpu.data.netcdf import NetCDFFile
    from probunet_tpu.train.loop import train_probunet

    datadir = str(tmp_path / "data")
    generate_climex_like(datadir, years=(2000, 2001), grid=16, days_per_year=10)
    serve_flags = [
        "--datadir", datadir, "--years_train", "2000,2001",
        "--years_val", "2001,2002", "--years_test", "2001,2002",
        "--coords", "0,16,0,16", "--resolution", "16,16",
        "--lowres_scale", "2", "--batch_size", "4", "--latent_dim", "4",
        "--standardization", "pertimestep",
        "--num_filters", "8", "--model_channels", "8",
        "--channel_mult", "1,2", "--num_blocks", "1",
        "--attn_resolutions", "8",
    ]
    # train a tiny checkpoint in-process (the parent's 8-device session)
    cfg = Config(
        datadir=datadir, years_train=(2000, 2001), years_val=(2001, 2002),
        years_test=(2001, 2002), coords=(0, 16, 0, 16), resolution=(16, 16),
        lowres_scale=2, batch_size=4, num_epochs=1, latent_dim=4,
        standardization="pertimestep", num_filters=(8,), model_channels=8,
        channel_mult=(1, 2), num_blocks=1, attn_resolutions=(8,),
        plotdir=str(tmp_path / "plots"),
        checkpoints_dir=str(tmp_path / "ckpt"))
    train_probunet(cfg, make_plots=False)
    ckpt = os.path.join(cfg.checkpoints_dir, "probunet")

    # ---- leg A: single process, 1 device ----
    out_single = str(tmp_path / "single.nc")
    proc = subprocess.run(
        [sys.executable, SERVE_CHILD, ckpt, out_single] + serve_flags,
        env=_env(1), cwd=REPO, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, f"single-process serve failed:\n{proc.stderr[-4000:]}"

    # ---- leg B: two REAL processes, 1 device each ----
    port = _free_port()
    out_multi = str(tmp_path / "multi.nc")
    procs = []
    for pid in (0, 1):
        env = _env(1, COORDINATOR_ADDRESS=f"localhost:{port}",
                   PROBUNET_NUM_PROCESSES=2, PROBUNET_PROCESS_ID=pid)
        procs.append(subprocess.Popen(
            [sys.executable, SERVE_CHILD, ckpt, out_multi] + serve_flags,
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"serve process {pid} failed:\n{out[-4000:]}"
    # parts were merged into the final file and cleaned up
    assert not os.path.exists(out_multi + ".part0")
    assert not os.path.exists(out_multi + ".part1")

    with NetCDFFile(out_single) as a, NetCDFFile(out_multi) as b:
        for var in ("pr", "tasmin", "tasmax"):
            fa, fb = a.read_var(var), b.read_var(var)
            assert fa.shape == (10, 3, 16, 16)
            np.testing.assert_array_equal(fb, fa)
        np.testing.assert_array_equal(b.read_time(), a.read_time())
