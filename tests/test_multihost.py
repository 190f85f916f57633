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


class TestStratifiedEpochBatches:
    def test_exact_cover_and_shard_grouping(self):
        from probunet_tpu.parallel.multihost import (local_batch_slice,
                                                     stratified_epoch_batches)
        sizes = [20, 20]
        b = stratified_epoch_batches(sizes, 8, seed=3)
        assert b.shape == (5, 8)
        # rows grouped per shard: first 4 columns from shard 0, last 4 from 1
        for p, (lo, hi) in enumerate([(0, 20), (20, 40)]):
            cols = b[:, local_batch_slice(8, p, 2)]
            assert cols.min() >= lo and cols.max() < hi
        # within a shard every used sample appears exactly once
        for lo, hi in [(0, 20), (20, 40)]:
            used = b[(b >= lo) & (b < hi)]
            assert len(np.unique(used)) == len(used)

    def test_deterministic_and_single_shard_is_plain_permutation(self):
        from probunet_tpu.parallel.multihost import stratified_epoch_batches
        a = stratified_epoch_batches([12, 24], 4, seed=7)
        bb = stratified_epoch_batches([12, 24], 4, seed=7)
        np.testing.assert_array_equal(a, bb)
        # uneven shards -> lockstep nb = min over shards
        assert a.shape == (6, 4)
        one = stratified_epoch_batches([10], 5, seed=1, shuffle=False)
        np.testing.assert_array_equal(one, np.arange(10).reshape(2, 5))

    def test_indivisible_batch_raises(self):
        from probunet_tpu.parallel.multihost import stratified_epoch_batches
        with pytest.raises(ValueError):
            stratified_epoch_batches([8, 8, 8], 8, seed=0)


class TestShardSizesFor:
    def test_proportional_to_year_split(self):
        from probunet_tpu.parallel.multihost import shard_sizes_for
        # 4 years x 10 samples, 2 shards -> 20/20; 3 shards -> 20/10/10
        assert shard_sizes_for(40, range(2000, 2004), 2) == [20, 20]
        assert shard_sizes_for(40, range(2000, 2004), 3) == [20, 10, 10]

    def test_nonuniform_raises(self):
        from probunet_tpu.parallel.multihost import shard_sizes_for
        with pytest.raises(ValueError):
            shard_sizes_for(41, range(2000, 2004), 2)


class TestAllreduceSingleProcessIdentity:
    def test_allreduce_sum_identity(self):
        from probunet_tpu.parallel.multihost import allreduce_sum
        a = np.arange(6.0).reshape(2, 3)
        (out,) = allreduce_sum(a)
        np.testing.assert_array_equal(out, a)

    def test_allgather_counts_identity(self):
        from probunet_tpu.parallel.multihost import allgather_counts
        np.testing.assert_array_equal(allgather_counts(37), [37])

    def test_global_perpixel_stats_matches_device_stats(self):
        import jax.numpy as jnp
        from probunet_tpu.data import transforms
        from probunet_tpu.parallel.multihost import global_perpixel_stats
        hr = np.asarray(280.0 + np.random.default_rng(0).standard_normal((24, 8, 8, 3)),
                        np.float32)
        mean, std = global_perpixel_stats(hr, 2)
        dmean, dstd = transforms.compute_lr_stats(jnp.asarray(hr), 2, "perpixel")
        np.testing.assert_allclose(mean, np.asarray(dmean), rtol=0, atol=2e-4)
        np.testing.assert_allclose(std, np.asarray(dstd), rtol=2e-4, atol=0)


class TestMultihostPlanSingleProcess:
    """--data_shards=2 on one process: the plan must assemble exactly the
    batches a device-resident run would gather for the same global ids."""

    def _fixture(self, standardization):
        import jax
        import jax.numpy as jnp
        from probunet_tpu.config import Config
        from probunet_tpu.data.dataset import ClimexDataset
        from probunet_tpu.parallel import make_mesh
        from probunet_tpu.parallel.multihost import make_plan

        hr = np.asarray(2.0 + np.random.default_rng(1).standard_normal((16, 8, 8, 3)),
                        np.float32)
        ds = ClimexDataset(hr=hr, standardization=standardization, lowres_scale=2,
                           years=range(2000, 2004))
        cfg = Config(standardization=standardization, lowres_scale=2,
                     batch_size=4, data_shards=2, resolution=(8, 8))
        mesh = make_mesh((-1,), ("data",))
        plan = make_plan(cfg, ds, mesh)
        assert plan is not None and plan.shard_sizes == [8, 8]
        return cfg, ds, mesh, plan

    @pytest.mark.parametrize("standardization", ["none", "pertimestep", "perpixel"])
    def test_device_batch_matches_direct_gather(self, standardization):
        import jax.numpy as jnp
        from probunet_tpu.data import transforms

        cfg, ds, mesh, plan = self._fixture(standardization)
        batches = plan.epoch_batches(5)
        gids = batches[0]
        item = plan.device_batch(ds.hr_np, gids, plan.stats_np)
        # hr rows equal the direct global gather in the same order
        np.testing.assert_array_equal(np.asarray(item["hr"]), ds.hr_np[gids])
        np.testing.assert_array_equal(np.asarray(item["idx"]), np.arange(4))
        # the standardized pair built from the plan's stats matches the
        # dataset's device stats path
        sl_plan = transforms.slice_stats(item["stats"], standardization,
                                         jnp.asarray(item["idx"]))
        pair_plan = transforms.make_pair(jnp.asarray(item["hr"]), 2,
                                         standardization, sl_plan)
        ref = ds.batch(gids)
        atol = 0 if standardization != "perpixel" else 1e-5
        np.testing.assert_allclose(np.asarray(pair_plan["inputs"]),
                                   np.asarray(ref["inputs"]), atol=atol)
        np.testing.assert_allclose(np.asarray(pair_plan["targets"]),
                                   np.asarray(ref["targets"]), atol=atol)

    def test_replicated_source_eval_batches(self):
        cfg, ds, mesh, plan = self._fixture("pertimestep")
        vb = plan.replicated_batches(len(ds))
        assert vb.shape == (4, 4)
        item = plan.device_batch(ds.hr_np, vb[1], plan.split_stats(ds),
                                 replicated_source=True)
        np.testing.assert_array_equal(np.asarray(item["hr"]), ds.hr_np[4:8])
