"""Multi-host scaffolding: pure shard/merge math (the parts that must be
bit-correct before a pod run can trust them)."""

import numpy as np
import pytest

from probunet_tpu.parallel.multihost import (
    local_batch_slice,
    merge_moment_stats,
    shard_years,
)


class TestShardYears:
    def test_partition_exact_and_balanced(self):
        years = list(range(1960, 2060))  # 100 years
        for pc in (1, 2, 3, 4, 7, 8, 16):
            shards = [shard_years(years, i, pc) for i in range(pc)]
            # exact cover, order preserved, contiguous
            flat = [y for s in shards for y in s]
            assert flat == years
            sizes = [len(s) for s in shards]
            assert max(sizes) - min(sizes) <= 1
            # larger shards come first (divmod remainder layout)
            assert sizes == sorted(sizes, reverse=True)

    def test_more_processes_than_years(self):
        shards = [shard_years([2000, 2001], i, 4) for i in range(4)]
        assert shards == [[2000], [2001], [], []]

    def test_bad_index_raises(self):
        with pytest.raises(ValueError):
            shard_years([2000], 2, 2)


class TestLocalBatchSlice:
    def test_slices_tile_the_batch(self):
        sl = [local_batch_slice(32, i, 4) for i in range(4)]
        rows = np.arange(32)
        parts = [rows[s] for s in sl]
        np.testing.assert_array_equal(np.concatenate(parts), rows)
        assert all(len(p) == 8 for p in parts)

    def test_indivisible_raises(self):
        with pytest.raises(ValueError):
            local_batch_slice(10, 0, 3)


class TestMergeMoments:
    def test_merged_equals_global_two_pass(self):
        """Sharded-ingest stats must match a single pass over all the data."""
        rng = np.random.default_rng(0)
        chunks = [300.0 + rng.standard_normal((n, 4, 4)) for n in (100, 37, 263)]
        parts = [(c.sum(axis=0), (c * c).sum(axis=0), c.shape[0]) for c in chunks]
        mean, std = merge_moment_stats(parts)
        allx = np.concatenate(chunks, axis=0)
        np.testing.assert_allclose(mean, allx.mean(axis=0), rtol=1e-6)
        np.testing.assert_allclose(std, allx.std(axis=0, ddof=1), rtol=1e-5)


class TestLoadDatasetsSharding:
    def test_single_process_years_unchanged(self, tmp_path):
        """On one process load_datasets must read the full train range."""
        from probunet_tpu.config import Config
        from probunet_tpu.data.synthetic import generate_climex_like
        from probunet_tpu.train.loop import load_datasets

        generate_climex_like(str(tmp_path), years=(2000, 2001, 2002), grid=16,
                             days_per_year=5)
        cfg = Config(datadir=str(tmp_path), years_train=(2000, 2002),
                     years_val=(2002, 2003), years_test=(2002, 2003),
                     coords=(0, 16, 0, 16), resolution=(16, 16))
        ds = load_datasets(cfg)
        assert len(ds["train"]) == 10   # 2 years x 5 days
        assert ds["train"].years == [2000, 2001]
