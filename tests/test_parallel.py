"""Mesh/sharding tests: virtual 8-device CPU mesh + 2-process psum +
spatial-sharded inference."""

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


class TestSpatialShardedInference:
    def test_sharded_forward_matches_unsharded(self, mesh):
        """The CNN forward with height sharded over 'spatial' (XLA halo
        exchanges for the convs) matches the single-device result."""
        from tpupose.models import CocoPoseNet

        model = CocoPoseNet()
        x = jnp.asarray(np.random.RandomState(0).rand(4, 64, 64, 3),
                        jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x[:1])

        plain = jax.jit(model.apply)(variables, x)
        sharded = jax.jit(
            model.apply,
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
            out_shardings=replicated(mesh))(variables, x)
        for a, b in zip(jax.tree_util.tree_leaves(plain),
                        jax.tree_util.tree_leaves(sharded)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_detect_batch_on_spatial_mesh_matches_meshless(self, mesh):
        """End-to-end detect_batch on a (data=4, spatial=2) mesh returns
        the same pose tables as the mesh-less path."""
        import sys as _sys
        import os as _os

        _sys.path.insert(0, _os.path.dirname(__file__))
        from test_eval_apps import _stub_pose_detector

        det_plain = _stub_pose_detector()
        det_mesh = _stub_pose_detector()
        det_mesh.mesh = mesh
        imgs = np.random.RandomState(0).randint(
            0, 255, (4, 64, 80, 3), np.uint8)
        ref = det_plain.detect_batch(imgs)
        got = det_mesh.detect_batch(imgs)
        assert len(got) == len(ref)
        for (gp, gs), (rp, rs) in zip(got, ref):
            np.testing.assert_allclose(gp, rp, atol=1e-4)
            np.testing.assert_allclose(gs, rs, atol=1e-4)


def test_two_process_distributed_psum(tmp_path):
    """Multi-host bring-up evidence: two OS processes, each with 2 local
    CPU devices, initialize jax.distributed through
    ``initialize_distributed``, see all 4 global devices, and a psum
    crosses the process boundary (the DCN-analogue path of a TPU pod)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__),
                          "distributed_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-1500:]
    assert all("ok" in out for out in outs)
