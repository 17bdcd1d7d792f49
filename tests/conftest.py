"""Test configuration: hermetic CPU backend with 8 virtual devices.

Tests run on the CPU backend for determinism and so that multi-device
sharding tests can fake an 8-device mesh on one host (the standard JAX
trick; SURVEY.md §4). Must run before jax initializes.
"""

import os

# force CPU even when the shell presets JAX_PLATFORMS (e.g. a TPU platform):
# tests must be hermetic, deterministic, and able to fake an 8-device mesh
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# a sitecustomize may have imported jax before this file ran, in which case
# the env var was already latched — override through the config API too
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Smoke tier: `pytest -m smoke` runs ONE representative test per subsystem
# (<5 min even on a 1-core host; the full suite is ~40 min there). The
# selection is centralized here so files stay unmarked; the full suite
# remains the CI gate.
# ---------------------------------------------------------------------------
_SMOKE_TESTS = (
    "test_dsp.py::TestBiquadDesign::test_peaking_unity_at_zero_gain",
    "test_dsp.py::TestExactIIR::test_sosfilt_exact_vs_scipy",
    "test_parity.py::TestEffectParity::test_parametric_eq",
    "test_parity.py::TestEffectParity::test_compressor_f32",
    "test_properties.py::TestBatchIndependence::test_vmap_consistency_eq",
    "test_effects_extra.py::TestDelay::test_mix_zero_is_identity",
    "test_streaming.py::TestEQStreams::test_parametric_eq_stream",
    "test_streaming.py::TestDynamicsStreams::test_compressor_stream",
    "test_blockmat.py::TestSosfiltBlockmat::test_matches_scipy_f64",
    "test_dft.py::TestIrdft::test_roundtrip",
    "test_datasets.py::test_fetch_full_and_sha256",
    "test_native.py::test_write_read_roundtrip_quantization",
    "test_presets.py::test_simple_roundtrip_render_parity",
    "test_integration.py::test_quickstart_recovers_drive",
    "test_fuzz.py::TestFuzzProcessors::test_gain_distortion_widener",
    "test_pallas_iir.py::TestSosfiltPallas::test_matches_scan",
    "test_pallas_ballistics.py::TestBallisticsPallas::test_bitwise_matches_exact_scan",
    "test_parallel.py::TestShardedConv::test_matches_unsharded",
    "test_parallel.py::TestShardedBallistics::test_exact_relay_gradients_match_unsharded",
    "test_utils.py::TestInputPipeline::test_reservoir_put_sample",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace("tests/", "")
        # match ignoring parametrization suffixes
        base = nodeid.split("[", 1)[0]
        if base in _SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)
