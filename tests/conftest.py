"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver benches on one real TPU chip; tests instead use
``--xla_force_host_platform_device_count=8`` (the standard fake-multichip
harness) so sharding/collective code paths are exercised without hardware.

Note: this image's sitecustomize registers an ``axon`` remote-TPU PJRT
plugin and forces ``jax_platforms="axon,cpu"`` via ``jax.config.update`` —
the env var alone cannot override it, so we update the config here (before
any backend is initialized) to pin tests to the local CPU backend;
otherwise every eager op becomes a network round trip through the TPU
tunnel.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# TPUPOSE_TEST_PLATFORM=axon,cpu lets the env-gated slow parity tests
# (TPUPOSE_SLOW_PARITY) run their full-size compiles on the real chip.
jax.config.update("jax_platforms",
                  os.environ.get("TPUPOSE_TEST_PLATFORM", "cpu"))
