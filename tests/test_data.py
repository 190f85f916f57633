"""Data-path tests: standardization round-trips, pair-synthesis parity with a
torch oracle of the reference __getitem__ math, synthetic netCDF IO."""

import numpy as np
import pytest
import jax.numpy as jnp
import torch
import torch.nn as tnn

from probunet_tpu.data import transforms
from probunet_tpu.data.dataset import ClimexDataset
from probunet_tpu.data.netcdf import decode_time, load_window
from probunet_tpu.data.synthetic import generate_climex_like
from probunet_tpu.data.units import date_to_float, float_to_date

MODES = ["none", "perpixel", "pertimestep", "minmax"]


def _hr(t=20, h=16, w=16, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((t, h, w, c)) * 2 + 5).astype(np.float32)


def _torch_oracle(hr_nhwc: np.ndarray, scale: int, mode: str):
    """Reference __getitem__ math (climex_utils.py:122-194) with stock torch
    ops, full-dataset batched. Returns (inputs, targets, lrinterp) NHWC."""
    eps = 1e-10
    hr = torch.from_numpy(hr_nhwc).permute(0, 3, 1, 2)  # NCHW
    lr = tnn.AvgPool2d(kernel_size=scale)(hr)
    lrinterp = tnn.functional.interpolate(lr, scale_factor=scale, mode="bilinear")
    if mode == "none":
        inp, hr_stand = lrinterp, hr
    elif mode == "perpixel":
        mean, std = lr.mean(dim=0), lr.std(dim=0)
        mean = mean.repeat_interleave(scale, dim=1).repeat_interleave(scale, dim=2)
        std = std.repeat_interleave(scale, dim=1).repeat_interleave(scale, dim=2)
        inp = (lrinterp - mean) / (std + eps)
        hr_stand = (hr - mean) / (std + eps)
    elif mode == "pertimestep":
        mean = lr.mean(dim=(2, 3))[:, :, None, None]
        std = lr.std(dim=(2, 3))[:, :, None, None]
        inp = (lrinterp - mean) / (std + eps)
        hr_stand = (hr - mean) / (std + eps)
    else:  # minmax
        lo = lr.amin(dim=(2, 3))[:, :, None, None]
        hi = lr.amax(dim=(2, 3))[:, :, None, None]
        inp = (lrinterp - lo) / (hi - lo + eps)
        hr_stand = (hr - lo) / (hi - lo + eps)
    tgt = hr_stand - inp
    to_nhwc = lambda x: x.permute(0, 2, 3, 1).numpy()
    return to_nhwc(inp), to_nhwc(tgt), to_nhwc(lrinterp)


class TestPairSynthesis:
    @pytest.mark.parametrize("mode", MODES)
    @pytest.mark.parametrize("scale", [2, 4])
    def test_matches_torch_oracle(self, mode, scale):
        hr = _hr()
        stats = transforms.compute_lr_stats(jnp.asarray(hr), scale, mode)
        idx = jnp.arange(hr.shape[0])
        out = transforms.make_pair(jnp.asarray(hr), scale, mode,
                                   transforms.slice_stats(stats, mode, idx))
        inp_t, tgt_t, lrint_t = _torch_oracle(hr, scale, mode)
        np.testing.assert_allclose(np.asarray(out["lrinterp"]), lrint_t, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["inputs"]), inp_t, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["targets"]), tgt_t, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("mode", MODES)
    def test_residual_roundtrip(self, mode):
        """residual_to_hr(targets, lrinterp) must reconstruct HR exactly
        (the invstand o stand = id contract, climex_utils.py:198-211)."""
        hr = _hr(seed=1)
        scale = 4
        stats = transforms.compute_lr_stats(jnp.asarray(hr), scale, mode)
        idx = jnp.arange(hr.shape[0])
        sl = transforms.slice_stats(stats, mode, idx)
        out = transforms.make_pair(jnp.asarray(hr), scale, mode, sl)
        rec = transforms.residual_to_hr(out["targets"], out["lrinterp"], mode, sl)
        np.testing.assert_allclose(np.asarray(rec), hr, rtol=1e-4, atol=1e-4)

    def test_time_features(self):
        ts = jnp.asarray(np.arange(5) * 86400e9)
        assert transforms.time_features(ts, "id").shape == (5, 1)
        cyc = transforms.time_features(ts, "cyclic")
        assert cyc.shape == (5, 2)
        np.testing.assert_allclose(np.asarray((cyc ** 2).sum(-1)), 1.0, rtol=1e-5)


class TestSyntheticNetCDF:
    @pytest.fixture(scope="class")
    def datadir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("climex")
        generate_climex_like(str(d), years=(2000, 2001), grid=32, days_per_year=20)
        return str(d)

    def test_load_window(self, datadir):
        out = load_window(datadir, [2000, 2001], ("pr", "tasmin", "tasmax"),
                          coords=(4, 20, 8, 24))
        assert out["hr"].shape == (40, 16, 16, 3)
        assert out["lat"].shape == (16, 16)
        assert np.all(np.isfinite(out["hr"]))
        assert out["hr"][..., 0].min() >= 0  # precip non-negative
        # timestamps strictly increasing across the year boundary
        assert np.all(np.diff(out["timestamps"]) > 0)

    def test_dataset_end_to_end(self, datadir):
        ds = ClimexDataset(datadir, years=[2000], coords=(0, 32, 0, 32),
                           lowres_scale=4, standardization="perpixel")
        assert len(ds) == 20
        b = ds.batch(np.arange(8))
        assert b["inputs"].shape == (8, 32, 32, 3)
        assert b["targets"].shape == (8, 32, 32, 3)
        rec = ds.residual_to_hr(b["targets"], b["lrinterp"])
        np.testing.assert_allclose(np.asarray(rec), ds.hr_np[:8], rtol=1e-3, atol=1e-3)

    def test_dataset_minmax_per_sample_stats(self, datadir):
        ds = ClimexDataset(datadir, years=[2000], coords=(0, 32, 0, 32),
                           lowres_scale=2, standardization="minmax")
        idx = np.array([3, 7, 1])
        b = ds.batch(idx)
        # minmax inputs live in ~[0, 1] modulo upsampling overshoot
        v = np.asarray(b["inputs"])
        assert v.min() > -0.5 and v.max() < 1.5
        rec = ds.residual_to_hr(b["targets"], b["lrinterp"],
                                stand_stats=b["stand_stats"])
        np.testing.assert_allclose(np.asarray(rec), ds.hr_np[idx], rtol=1e-3, atol=1e-3)

    def test_epoch_indices(self, datadir):
        ds = ClimexDataset(datadir, years=[2000], coords=(0, 32, 0, 32))
        idx = ds.epoch_indices(epoch_seed=0, batch_size=6)
        assert idx.shape == (3, 6)
        assert len(np.unique(idx)) == 18
        idx2 = ds.epoch_indices(epoch_seed=0, batch_size=6)
        np.testing.assert_array_equal(idx, idx2)  # reproducible
        idx3 = ds.epoch_indices(epoch_seed=1, batch_size=6)
        assert not np.array_equal(idx, idx3)


class TestTimeUtils:
    def test_decode_time_standard(self):
        t = decode_time(np.array([0.0, 1.5]), "days since 2000-01-01", "standard")
        assert str(t[0])[:10] == "2000-01-01"
        assert str(t[1])[:13] == "2000-01-02T12"

    def test_decode_time_noleap(self):
        # day 365 in noleap = Jan 1 of the next year even across leap years
        t = decode_time(np.array([365.0 * 4]), "days since 2000-01-01", "noleap")
        assert str(t[0])[:10] == "2004-01-01"

    def test_date_float_roundtrip(self):
        d = np.array(["2005-06-15T12:00:00"], dtype="datetime64[ns]")
        np.testing.assert_array_equal(float_to_date(date_to_float(d)), d)
