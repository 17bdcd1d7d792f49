"""Regression test for the driver entry points (__graft_entry__.py):
the multi-chip dryrun must keep compiling + executing on a virtual mesh."""

import importlib.util
import os

import jax
import pytest


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)  # raises / asserts on failure


def test_dryrun_multichip_self_bootstraps_from_latched_interpreter():
    """Simulate the driver: an interpreter that already initialized a
    1-device backend (no env preset) must still complete dryrun_multichip(8)
    — the function has to bootstrap the virtual mesh itself (VERDICT r1 #1)."""
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
    proc = subprocess.run([sys.executable, "-c", code], cwd=root, env=env,
                          capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "dryrun_multichip OK" in proc.stdout
