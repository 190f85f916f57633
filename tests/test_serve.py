"""Serving path: checkpoint -> ensemble netCDF output, read back and checked."""

import os

import numpy as np
import pytest

from probunet_tpu.config import Config
from probunet_tpu.data.netcdf import NetCDFFile, write_fields
from probunet_tpu.data.synthetic import generate_climex_like
from probunet_tpu.serve import downscale
from probunet_tpu.train.loop import train_probunet


def test_write_fields_roundtrip(tmp_path):
    path = os.path.join(str(tmp_path), "out.nc")
    t, k, h, w = 3, 2, 8, 8
    rng = np.random.default_rng(0)
    fields = {"pr": rng.random((t, k, h, w)).astype(np.float32)}
    ts = (np.arange(t) + 20000.0) * 86400e9
    lat = rng.random((h, w)).astype(np.float32)
    write_fields(path, fields, ts, lat=lat, lon=lat, attrs={"members": "2"})
    with NetCDFFile(path) as f:
        back = f.read_var("pr")
        times = f.read_time()
    np.testing.assert_allclose(back, fields["pr"], rtol=1e-6)
    assert times.shape == (t,)
    np.testing.assert_array_equal(times.astype(float), ts)


def test_streaming_writer_matches_write_fields(tmp_path):
    """Chunked appends must produce the same file contents as the one-shot
    writer (serving now streams: VERDICT round-3 weak #5)."""
    from probunet_tpu.data.netcdf import StreamingFieldWriter

    t, k, h, w = 11, 2, 8, 8
    rng = np.random.default_rng(1)
    data = rng.random((t, k, h, w)).astype(np.float32)
    ts = (np.arange(t) + 20000.0) * 86400e9
    lat = rng.random((h, w)).astype(np.float32)

    ref = os.path.join(str(tmp_path), "ref.nc")
    write_fields(ref, {"pr": data}, ts, lat=lat, lon=lat, attrs={"members": "2"})
    out = os.path.join(str(tmp_path), "stream.nc")
    with StreamingFieldWriter(out, {"pr": (t, k, h, w)}, ts, lat=lat, lon=lat,
                              attrs={"members": "2"}, time_chunk=4) as wr:
        for lo in range(0, t, 4):      # uneven tail chunk included
            wr.append({"pr": data[lo:lo + 4]}, lo)

    with NetCDFFile(ref) as a, NetCDFFile(out) as b:
        np.testing.assert_array_equal(b.read_var("pr"), a.read_var("pr"))
        np.testing.assert_array_equal(b.read_time(), a.read_time())


def test_downscale_end_to_end(tmp_path):
    datadir = os.path.join(str(tmp_path), "data")
    generate_climex_like(datadir, years=(2000, 2001), grid=16, days_per_year=10)
    cfg = Config(
        datadir=datadir, years_train=(2000, 2001), years_val=(2001, 2002),
        years_test=(2001, 2002), coords=(0, 16, 0, 16), resolution=(16, 16),
        lowres_scale=2, batch_size=4, num_epochs=1, latent_dim=4,
        standardization="pertimestep",  # perpixel std can be ~0 for all-dry
        # precip pixels in tiny synthetic data (reference eps=1e-10 hazard)
        num_filters=(8,), model_channels=8, channel_mult=(1, 2), num_blocks=1,
        attn_resolutions=(8,), num_samples=3,
        plotdir=os.path.join(str(tmp_path), "plots"),
        checkpoints_dir=os.path.join(str(tmp_path), "ckpt"))
    train_probunet(cfg, make_plots=False)

    out = os.path.join(str(tmp_path), "downscaled.nc")
    path = downscale(cfg, os.path.join(cfg.checkpoints_dir, "probunet"), out,
                     num_samples=3)
    with NetCDFFile(path) as f:
        pr = f.read_var("pr")
        tasmin = f.read_var("tasmin")
    assert pr.shape == (10, 3, 16, 16)       # (T, members, H, W)
    assert np.isfinite(pr).all() and np.isfinite(tasmin).all()
    # members differ (prior sampling) and live in a physical range
    assert pr.std(axis=1).mean() > 0
    assert tasmin.mean() > 200, "tasmin should be in Kelvin scale"


def test_streaming_writer_compression_modes(tmp_path):
    """'none' and 'lzf' produce identical field VALUES to the gzip default
    (compression is the serving write-throughput lever: gzip is netCDF-
    standard but write-bound on one host core, BASELINE_MEASURED.md)."""
    from probunet_tpu.data.netcdf import StreamingFieldWriter

    t, k, h, w = 6, 2, 8, 8
    rng = np.random.default_rng(3)
    data = rng.random((t, k, h, w)).astype(np.float32)
    ts = (np.arange(t) + 20000.0) * 86400e9
    outs = {}
    for comp in ("gzip", "none", "lzf"):
        out = os.path.join(str(tmp_path), f"c_{comp}.nc")
        with StreamingFieldWriter(out, {"pr": (t, k, h, w)}, ts,
                                  compression=comp) as wr:
            wr.append({"pr": data}, 0)
        outs[comp] = out
    with NetCDFFile(outs["gzip"]) as f:
        ref = f.read_var("pr")
    np.testing.assert_array_equal(ref, data)
    for comp in ("none", "lzf"):
        with NetCDFFile(outs[comp]) as f:
            np.testing.assert_array_equal(f.read_var("pr"), ref)
    import pytest
    with pytest.raises(ValueError):
        StreamingFieldWriter(os.path.join(str(tmp_path), "bad.nc"),
                             {"pr": (t, k, h, w)}, ts, compression="zstd")


def test_writer_int16_packing_roundtrip(tmp_path):
    """CF short packing: int16 storage with scale_factor/add_offset, read
    back transparently by NetCDFFile; quantization error <= scale/2; values
    outside the range clip."""
    import h5py

    from probunet_tpu.data.netcdf import StreamingFieldWriter, pack_params

    t, k, h, w = 4, 2, 8, 8
    rng = np.random.default_rng(5)
    data = (200 + 100 * rng.random((t, k, h, w))).astype(np.float32)
    data[0, 0, 0, 0] = 500.0  # above range -> clips to hi
    ts = (np.arange(t) + 20000.0) * 86400e9
    out = os.path.join(str(tmp_path), "packed.nc")
    with StreamingFieldWriter(out, {"tas": (t, k, h, w)}, ts,
                              packing={"tas": (180.0, 330.0)}) as wr:
        wr.append({"tas": data}, 0)

    scale, offset = pack_params(180.0, 330.0)
    with h5py.File(out) as f:
        assert f["tas"].dtype == np.int16
        assert f["tas"].attrs["scale_factor"] == scale
    with NetCDFFile(out) as f:
        back = f.read_var("tas")  # read_var applies scale/offset
    inside = np.ones(data.shape, bool)
    inside[0, 0, 0, 0] = False
    np.testing.assert_allclose(back[inside], data[inside], atol=scale / 2 + 1e-6)
    assert abs(back[0, 0, 0, 0] - 330.0) <= scale  # clipped to range top


def test_downscale_with_packing(tmp_path):
    """On-device CF int16 packing through the full serving path: the packed
    output equals the unpacked output within one quantization step, and the
    file stores int16 (half the bytes crossing the device->host link)."""
    import h5py

    from probunet_tpu.data.netcdf import pack_params

    datadir = os.path.join(str(tmp_path), "data")
    generate_climex_like(datadir, years=(2000, 2001), grid=16, days_per_year=8)
    cfg = Config(
        datadir=datadir, years_train=(2000, 2001), years_val=(2001, 2002),
        years_test=(2001, 2002), coords=(0, 16, 0, 16), resolution=(16, 16),
        lowres_scale=2, batch_size=4, num_epochs=1, latent_dim=4,
        standardization="pertimestep", num_filters=(8,), model_channels=8,
        channel_mult=(1, 2), num_blocks=1, attn_resolutions=(8,),
        plotdir=os.path.join(str(tmp_path), "plots"),
        checkpoints_dir=os.path.join(str(tmp_path), "ckpt"))
    train_probunet(cfg, make_plots=False)
    ckpt = os.path.join(cfg.checkpoints_dir, "probunet")

    out_f32 = downscale(cfg, ckpt, os.path.join(str(tmp_path), "f32.nc"),
                        num_samples=2)
    ranges = {"pr": (-0.01, 0.05), "tasmin": (150.0, 350.0),
              "tasmax": (150.0, 350.0)}
    out_i16 = downscale(cfg, ckpt, os.path.join(str(tmp_path), "i16.nc"),
                        num_samples=2, pack_ranges=ranges)

    with h5py.File(out_i16) as f:
        assert f["pr"].dtype == np.int16
    for var in ("pr", "tasmin", "tasmax"):
        with NetCDFFile(out_f32) as a, NetCDFFile(out_i16) as b:
            ref, packed = a.read_var(var), b.read_var(var)
        scale, _ = pack_params(*ranges[var])
        np.testing.assert_allclose(packed, ref, atol=scale + 1e-7)

    # pack_ranges must cover every variable
    import pytest
    with pytest.raises(ValueError, match="every output variable"):
        downscale(cfg, ckpt, os.path.join(str(tmp_path), "bad.nc"),
                  num_samples=2, pack_ranges={"pr": (0, 1)})


def test_merge_parts_preserves_packing(tmp_path):
    """The multi-process merge moves packed variables as raw int16 (no
    unpack/repack round trip): merged file == concatenation of the parts."""
    from probunet_tpu.data.netcdf import StreamingFieldWriter, pack_int16
    from probunet_tpu.serve import _merge_parts

    rng = np.random.default_rng(9)
    t, k, h, w = 6, 2, 4, 4
    data = (200 + 100 * rng.random((t, k, h, w))).astype(np.float32)
    ts = (np.arange(t) + 20000.0) * 86400e9
    packing = {"tas": (180.0, 330.0)}
    parts = []
    for p, (lo, hi) in enumerate([(0, 4), (4, 6)]):
        path = os.path.join(str(tmp_path), f"m.nc.part{p}")
        with StreamingFieldWriter(path, {"tas": (hi - lo, k, h, w)},
                                  ts[lo:hi], packing=packing) as wr:
            wr.append({"tas": data[lo:hi]}, 0)
        parts.append((lo, path))
    out = os.path.join(str(tmp_path), "m.nc")
    _merge_parts(out, parts, ["tas"], {"tas": (t, k, h, w)}, ts, None, None,
                 {}, packing=packing)
    import h5py
    with h5py.File(out) as f:
        assert f["tas"].dtype == np.int16
        np.testing.assert_array_equal(f["tas"][...],
                                      pack_int16(data, 180.0, 330.0))


def test_batch_range_more_processes_than_batches(tmp_path):
    """Idle processes (pc > nb, or ranges past the ragged tail) get empty,
    non-crashing ranges, and the writer accepts zero-length part shapes —
    the many-process serve must reach its merge barriers instead of dying
    in h5py (code-review round-5 finding #1)."""
    from probunet_tpu.data.netcdf import StreamingFieldWriter
    from probunet_tpu.serve import _batch_range

    # n=10 days, batch 4 -> nb=3; 4 processes
    ranges = [_batch_range(3, p, 4) for p in range(4)]
    assert ranges == [(0, 1), (1, 2), (2, 3), (3, 3)]
    covered = [b for lo, hi in ranges for b in range(lo, hi)]
    assert covered == [0, 1, 2]
    # process 3: t_lo = min(3*4, 10) = 10 = t_hi -> empty part file
    ts = np.zeros((0,), np.float64)
    out = os.path.join(str(tmp_path), "empty_part.nc")
    with StreamingFieldWriter(out, {"pr": (0, 2, 4, 4)}, ts) as wr:
        pass  # no appends
    import h5py
    with h5py.File(out) as f:
        assert f["pr"].shape == (0, 2, 4, 4)

    # the partition rule IS multihost.shard_years (single source of truth)
    from probunet_tpu.parallel.multihost import shard_years
    for nb, pc in ((3, 4), (10, 3), (8, 8), (1, 5)):
        for p in range(pc):
            lo, hi = _batch_range(nb, p, pc)
            assert list(range(lo, hi)) == shard_years(range(nb), p, pc)
