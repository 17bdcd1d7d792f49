"""Regression test for the driver entry points (__graft_entry__.py):
the multi-chip dryrun must keep compiling + executing on a virtual mesh."""

import importlib.util
import os

import jax
import pytest


def _load_graft_entry():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    _load_graft_entry().dryrun_multichip(8)  # raises / asserts on failure


@pytest.mark.parametrize("shape", [(8, 1), (2, 4)])
def test_dryrun_multichip_mesh_shapes(shape):
    """All three mesh aspect ratios must compile+run (VERDICT r2 #8);
    (4, 2) is the default covered by test_dryrun_multichip_8."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    _load_graft_entry().dryrun_multichip(8, shape)


def test_make_mesh_and_shard_batch_errors():
    """Mesh-shape and batch-divisibility misuse must raise actionable
    ValueErrors, not bare asserts / opaque XLA errors (VERDICT r2 #8)."""
    from dasp_tpu.parallel import make_mesh, shard_batch
    import jax.numpy as jnp

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    with pytest.raises(ValueError, match="devices"):
        make_mesh((3, 2), devices=jax.devices()[:8])
    with pytest.raises(ValueError, match="positive"):
        make_mesh((0, 8), devices=jax.devices()[:8])
    mesh = make_mesh((4, 2), devices=jax.devices()[:8])
    with pytest.raises(ValueError, match="divisible"):
        shard_batch(jnp.zeros((3, 1, 16)), mesh)
    out = shard_batch(jnp.zeros((8, 1, 16)), mesh)
    assert out.shape == (8, 1, 16)


def test_force_device_count_flag():
    """The flag helper must append when absent, raise a smaller preset
    count, and leave an equal/larger preset (and unrelated flags) alone."""
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry_flag", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    f = mod._force_device_count_flag

    assert f("", 8) == "--xla_force_host_platform_device_count=8"
    assert f("--xla_cpu_foo=1", 8) == (
        "--xla_cpu_foo=1 --xla_force_host_platform_device_count=8")
    # preset smaller count is replaced in place
    assert f("--xla_force_host_platform_device_count=1 --xla_cpu_foo=1", 8) == (
        "--xla_force_host_platform_device_count=8 --xla_cpu_foo=1")
    # preset equal/larger count is kept
    assert f("--xla_force_host_platform_device_count=16", 8) == (
        "--xla_force_host_platform_device_count=16")


@pytest.mark.parametrize("preset_xla_flags", [None, "--xla_force_host_platform_device_count=1"])
def test_dryrun_multichip_self_bootstraps_from_latched_interpreter(preset_xla_flags):
    """Simulate the driver: an interpreter that already initialized a
    1-device backend must still complete dryrun_multichip(8) — the function
    has to bootstrap the virtual mesh itself (VERDICT r1 #1). The second
    case additionally presets XLA_FLAGS with a *smaller* device count,
    which the re-exec must override rather than inherit."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()  # backend latched, 1 device\n"
        "import importlib.util\n"
        "spec = importlib.util.spec_from_file_location('graft_entry', '__graft_entry__.py')\n"
        "mod = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(mod)\n"
        "mod.dryrun_multichip(8)\n"
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    if preset_xla_flags is not None:
        env["XLA_FLAGS"] = preset_xla_flags
    proc = subprocess.run([sys.executable, "-c", code], cwd=root, env=env,
                          capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "dryrun_multichip OK" in proc.stdout
