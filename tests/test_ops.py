"""Unit tests for core ops against torch oracles (torch-cpu is a test-only dep)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from probunet_tpu.ops import (
    avg_pool,
    bilinear_upsample,
    nearest_upsample_2x,
    crps_empirical,
    crps_naive,
    group_norm,
    num_groups_for,
    DiagGaussian,
    kl_diag_gaussian,
)


def _rand(*shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


class TestResample:
    @pytest.mark.parametrize("k", [2, 4, 8])
    def test_avg_pool_matches_torch(self, k):
        x = _rand(2, 64, 64, 3)
        ours = np.asarray(avg_pool(jnp.asarray(x), k))
        theirs = torch.nn.AvgPool2d(kernel_size=k)(torch.from_numpy(x).permute(0, 3, 1, 2))
        np.testing.assert_allclose(ours, theirs.permute(0, 2, 3, 1).numpy(), rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("scale,n", [(2, 8), (4, 16), (8, 8)])
    def test_bilinear_matches_torch(self, scale, n):
        x = _rand(2, n, n, 3, seed=1)
        ours = np.asarray(bilinear_upsample(jnp.asarray(x), scale))
        theirs = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=scale, mode="bilinear"
        )
        np.testing.assert_allclose(ours, theirs.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5)

    def test_bilinear_hwc_rank3(self):
        x = _rand(16, 16, 3, seed=2)
        out = bilinear_upsample(jnp.asarray(x), 4)
        assert out.shape == (64, 64, 3)

    def test_nearest_upsample_2x_matches_reference_conv_transpose(self):
        # Reference networks.py:83: conv_transpose2d with 2x2 ones kernel == pixel replication.
        x = _rand(1, 4, 4, 2, seed=3)
        ours = np.asarray(nearest_upsample_2x(jnp.asarray(x)))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        f = torch.ones(2, 1, 2, 2)
        theirs = F.conv_transpose2d(xt, f, groups=2, stride=2).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


class TestGroupNorm:
    @pytest.mark.parametrize("c", [64, 128, 192, 512, 6])
    def test_group_count_rule(self, c):
        assert num_groups_for(c) == min(32, c // 4)

    @pytest.mark.parametrize("c", [64, 128, 512])
    def test_matches_torch(self, c):
        x = _rand(2, 8, 8, c, seed=4)
        w = _rand(c, seed=5) * 0.1 + 1.0
        b = _rand(c, seed=6) * 0.1
        g = num_groups_for(c)
        ours = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), g))
        theirs = F.group_norm(
            torch.from_numpy(x).permute(0, 3, 1, 2), g,
            torch.from_numpy(w), torch.from_numpy(b), eps=1e-5,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_bf16_input_fp32_stats(self):
        x = jnp.asarray(_rand(1, 4, 4, 64, seed=7), dtype=jnp.bfloat16)
        out = group_norm(x, jnp.ones(64), jnp.zeros(64), 16)
        assert out.dtype == jnp.bfloat16
        assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


class TestDiagGaussian:
    def test_kl_matches_torch(self):
        mu_q, ls_q = _rand(8, 6, seed=8), _rand(8, 6, seed=9) * 0.3
        mu_p, ls_p = _rand(8, 6, seed=10), _rand(8, 6, seed=11) * 0.3
        q = DiagGaussian(jnp.asarray(mu_q), jnp.asarray(ls_q))
        p = DiagGaussian(jnp.asarray(mu_p), jnp.asarray(ls_p))
        ours = np.asarray(kl_diag_gaussian(q, p))
        tq = torch.distributions.Independent(
            torch.distributions.Normal(torch.from_numpy(mu_q), torch.from_numpy(ls_q).exp()), 1)
        tp = torch.distributions.Independent(
            torch.distributions.Normal(torch.from_numpy(mu_p), torch.from_numpy(ls_p).exp()), 1)
        theirs = torch.distributions.kl.kl_divergence(tq, tp).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    def test_rsample_statistics(self):
        d = DiagGaussian(jnp.full((4,), 2.0), jnp.full((4,), np.log(0.5)))
        draws = d.sample(jax.random.key(0), 20000)
        np.testing.assert_allclose(np.asarray(draws.mean(0)), 2.0, atol=0.02)
        np.testing.assert_allclose(np.asarray(draws.std(0)), 0.5, atol=0.02)

    def test_log_prob_matches_torch(self):
        mu, ls = _rand(4, 6, seed=12), _rand(4, 6, seed=13) * 0.2
        x = _rand(4, 6, seed=14)
        ours = np.asarray(DiagGaussian(jnp.asarray(mu), jnp.asarray(ls)).log_prob(jnp.asarray(x)))
        theirs = torch.distributions.Independent(
            torch.distributions.Normal(torch.from_numpy(mu), torch.from_numpy(ls).exp()), 1
        ).log_prob(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


class TestCRPS:
    @pytest.mark.parametrize("n", [2, 3, 16])
    def test_sorted_equals_naive(self, n):
        pred = jnp.asarray(_rand(n, 5, 7, seed=15))
        truth = jnp.asarray(_rand(5, 7, seed=16))
        np.testing.assert_allclose(
            np.asarray(crps_empirical(pred, truth)),
            np.asarray(crps_naive(pred, truth)),
            rtol=1e-5, atol=1e-6,
        )

    def test_single_sample_is_abs_error(self):
        pred = jnp.asarray(_rand(1, 4, seed=17))
        truth = jnp.asarray(_rand(4, seed=18))
        np.testing.assert_allclose(
            np.asarray(crps_empirical(pred, truth)), np.abs(np.asarray(pred[0] - truth)), rtol=1e-6)

    def test_shape_validation(self):
        with pytest.raises(ValueError):
            crps_empirical(jnp.zeros((3, 4)), jnp.zeros((5,)))
