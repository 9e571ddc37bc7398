"""Driver-contract checks: entry() shapes and bench metric format."""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_entry_traces_with_expected_shapes():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    pafs, heatmaps = out
    assert pafs.shape == (6, 1, 46, 46, 38)
    assert heatmaps.shape == (6, 1, 46, 46, 19)


def test_bench_emits_one_json_line_fields():
    """Static contract check of bench.py's output schema (no TPU run):
    the module-level constants and json call must produce the four keys."""
    src = open(os.path.join(REPO, "bench.py")).read()
    for key in ('"metric"', '"value"', '"unit"', '"vs_baseline"'):
        assert key in src


def test_dryrun_two_devices():
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"),
         "dryrun", "2"],
        capture_output=True, text=True, timeout=500, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-500:]
    assert "dryrun_multichip(2)" in r.stdout
