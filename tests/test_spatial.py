"""Spatial-sharding primitives: sharded == unsharded on the 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from probunet_tpu.models.layers import conv2d_nhwc
from probunet_tpu.ops.norm import group_norm
from probunet_tpu.parallel import make_mesh
from probunet_tpu.parallel.spatial import (
    halo_exchange_rows,
    local_rows,
    spatial_attention,
    spatial_avg_pool,
    spatial_conv3x3,
    spatial_group_norm_silu,
    spatial_nearest_up_2x,
)

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((-1,), ("h",))


def _x(b=2, h=32, w=16, c=8, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal((b, h, w, c)),
                       jnp.float32)


def _smap(mesh, fn, in_specs, out_specs=P(None, "h")):
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


class TestHalo:
    def test_halo_rows(self, mesh):
        x = _x(h=16)

        def body(xl):
            return halo_exchange_rows(xl, "h", 1)

        out = _smap(mesh, body, (P(None, "h"),))(x)
        # each local block of 2 rows gains 2 halo rows -> 4 per shard, 32 total
        assert out.shape == (2, 32, 16, 8)


class TestSpatialConv:
    @pytest.mark.parametrize("stride", [1, 2])
    def test_matches_global_conv(self, mesh, stride):
        x = _x(h=32, seed=1)
        w = jnp.asarray(np.random.default_rng(2).standard_normal((3, 3, 8, 12)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(np.random.default_rng(3).standard_normal(12) * 0.1, jnp.float32)

        ref = conv2d_nhwc(x, w, stride=stride, padding=1) + b.reshape(1, 1, 1, -1)

        def body(xl):
            return spatial_conv3x3(xl, w, "h", stride=stride, bias=b)

        out = _smap(mesh, body, (P(None, "h"),))(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_two_layer_stack(self, mesh):
        """Composition: conv -> conv with halos each time == global."""
        x = _x(h=32, seed=4)
        w1 = jnp.asarray(np.random.default_rng(5).standard_normal((3, 3, 8, 8)) * 0.1,
                         jnp.float32)
        w2 = jnp.asarray(np.random.default_rng(6).standard_normal((3, 3, 8, 8)) * 0.1,
                         jnp.float32)
        ref = conv2d_nhwc(jax.nn.relu(conv2d_nhwc(x, w1, padding=1)), w2, padding=1)

        def body(xl):
            h1 = jax.nn.relu(spatial_conv3x3(xl, w1, "h"))
            return spatial_conv3x3(h1, w2, "h")

        out = _smap(mesh, body, (P(None, "h"),))(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


class TestSpatialNorm:
    def test_group_norm_silu_global_stats(self, mesh):
        x = _x(h=32, c=16, seed=7)
        wgt = jnp.asarray(1 + 0.1 * np.random.default_rng(8).standard_normal(16), jnp.float32)
        bias = jnp.asarray(0.1 * np.random.default_rng(9).standard_normal(16), jnp.float32)
        g = 4
        ref = group_norm(x, wgt, bias, g)
        ref = ref * jax.nn.sigmoid(ref)

        def body(xl):
            return spatial_group_norm_silu(xl, wgt, bias, g, "h")

        out = _smap(mesh, body, (P(None, "h"),))(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


class TestSpatialResample:
    def test_avg_pool_local(self, mesh):
        x = _x(h=32, seed=10)
        from probunet_tpu.ops.resample import avg_pool
        ref = avg_pool(x, 2)

        def body(xl):
            return spatial_avg_pool(xl, 2)

        out = _smap(mesh, body, (P(None, "h"),))(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)

    def test_nearest_up_local(self, mesh):
        x = _x(h=16, seed=11)
        from probunet_tpu.ops.resample import nearest_upsample_2x
        ref = nearest_upsample_2x(x)

        def body(xl):
            return spatial_nearest_up_2x(xl)

        out = _smap(mesh, body, (P(None, "h"),))(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


class TestSpatialAttention:
    def test_gather_and_slice_roundtrip(self, mesh):
        x = _x(h=32, seed=12)

        def body(xl):
            full = spatial_attention(xl, "h")
            return local_rows(full, "h")

        out = _smap(mesh, body, (P(None, "h"),))(x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
