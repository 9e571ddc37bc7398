"""Mesh/sharding helper tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupose.parallel import (
    batch_sharding,
    data_only_sharding,
    make_mesh,
    replicated,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(n_data=4, n_spatial=2)


class TestMakeMesh:
    def test_axis_names_and_shape(self, mesh):
        assert mesh.axis_names == ("data", "spatial")
        assert mesh.devices.shape == (4, 2)

    def test_default_uses_all_devices(self):
        m = make_mesh()
        assert m.devices.size == len(jax.devices())

    def test_oversubscription_rejected(self):
        with pytest.raises(ValueError):
            make_mesh(n_data=len(jax.devices()) + 1)


class TestShardings:
    def test_batch_sharding_layout(self, mesh):
        x = jnp.zeros((8, 16, 16, 3))
        y = jax.device_put(x, batch_sharding(mesh))
        # each device holds (8/4, 16/2, 16, 3)
        shard = y.addressable_shards[0]
        assert shard.data.shape == (2, 8, 16, 3)

    def test_replicated_layout(self, mesh):
        x = jnp.zeros((5, 5))
        y = jax.device_put(x, replicated(mesh))
        assert y.addressable_shards[0].data.shape == (5, 5)
        assert len(y.addressable_shards) == 8

    def test_shard_batch_tree(self, mesh):
        batch = {
            "imgs": np.zeros((8, 16, 16, 3), np.uint8),
            "poses": np.zeros((8, 4, 18, 3), np.float32),
        }
        out = shard_batch(batch, mesh)
        assert out["imgs"].addressable_shards[0].data.shape == (2, 8, 16, 3)
        # 2-dim-under-3 arrays shard on data only
        assert out["poses"].addressable_shards[0].data.shape == (2, 4, 18, 3)

    def test_psum_over_data_axis(self, mesh):
        """Collectives ride the mesh: a data-sharded sum equals the global
        sum (XLA inserts the psum)."""
        x = np.arange(8.0)
        y = jax.device_put(jnp.asarray(x), data_only_sharding(mesh))
        total = jax.jit(jnp.sum, out_shardings=replicated(mesh))(y)
        assert float(total) == x.sum()
