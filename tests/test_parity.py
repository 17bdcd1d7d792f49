"""Golden parity tests against the PyTorch reference.

Fixtures under tests/fixtures/ were produced by tests/make_fixtures.py
running the reference implementation. Each test checks output parity AND
parameter-gradient parity to the BASELINE north-star tolerance (1e-4).
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dasp_tpu as D
from dasp_tpu.ops import biquad as ops_biquad
from dasp_tpu.ops import lfilter_via_fsm, octave_band_filterbank

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
SR = 44100
TOL = 1e-4


def load(name):
    return dict(np.load(os.path.join(FIXTURES, f"{name}.npz")))


def assert_close(actual, expected, tol=TOL, what=""):
    actual = np.asarray(actual)
    expected = np.asarray(expected)
    assert actual.shape == expected.shape, f"{what}: shape {actual.shape} vs {expected.shape}"
    scale = max(1.0, float(np.abs(expected).max()))
    err = float(np.abs(actual - expected).max())
    assert err <= tol * scale, f"{what}: max err {err:.3e} > {tol:.0e} * {scale:.3g}"


def split_params(fx):
    return {k[len("param_"):]: jnp.asarray(v) for k, v in fx.items() if k.startswith("param_")}


def check_effect(fn, fixture_name, tol=TOL, grad_tol=None, **static_kwargs):
    """Check output and parameter-gradient parity for one effect."""
    fx = load(fixture_name)
    x = jnp.asarray(fx["x"])
    params = split_params(fx)

    f = jax.jit(lambda x, p: fn(x, SR, **p, **static_kwargs))
    y = f(x, params)
    assert_close(y, fx["y"], tol, what=f"{fixture_name}:output")

    loss = jax.jit(lambda p: jnp.mean(fn(x, SR, **p, **static_kwargs) ** 2))
    grads = jax.grad(loss)(params)
    gtol = grad_tol or tol
    for name, g in grads.items():
        assert_close(g, fx[f"grad_{name}"], gtol, what=f"{fixture_name}:grad_{name}")


class TestEffectParity:
    def test_gain(self):
        check_effect(D.gain, "gain")

    def test_distortion(self):
        check_effect(D.distortion, "distortion")

    def test_parametric_eq(self):
        check_effect(D.parametric_eq, "parametric_eq")

    def test_compressor_f32(self):
        # meets the 1e-4 north star in fp32: the smoother DC-splits the
        # (large-DC) gain curve around the FSM FFT, so the dominant fp32
        # FFT rounding term cancels (measured ~2e-6 after the split).
        check_effect(D.compressor, "compressor", smoother="fsm")

    def test_compressor_f64(self):
        jax.config.update("jax_enable_x64", True)
        try:
            check_effect(D.compressor, "compressor_f64", smoother="fsm")
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_compressor_lookahead(self):
        check_effect(
            D.compressor,
            "compressor_lookahead",
            smoother="fsm",
            lookahead_samples=32,
        )

    def test_stereo_widener_bs1(self):
        check_effect(D.stereo_widener, "stereo_widener")

    def test_stereo_widener_bs2(self):
        check_effect(D.stereo_widener, "stereo_widener_bs2")

    def test_stereo_panner(self):
        check_effect(D.stereo_panner, "stereo_panner")

    def test_stereo_bus(self):
        check_effect(D.stereo_bus, "stereo_bus")

    def test_reverb(self):
        fx = load("reverb")
        x = jnp.asarray(fx["x"])
        noise = jnp.asarray(fx["noise"])
        params = split_params(fx)
        num_samples = int(fx["num_samples"])
        num_taps = int(fx["num_taps"])

        fn = partial(
            D.noise_shaped_reverberation,
            num_samples=num_samples,
            num_bandpass_taps=num_taps,
        )
        f = jax.jit(lambda x, p: fn(x, SR, **p, noise=noise))
        y = f(x, params)
        assert_close(y, fx["y"], what="reverb:output")

        loss = jax.jit(lambda p: jnp.mean(fn(x, SR, **p, noise=noise) ** 2))
        grads = jax.grad(loss)(params)
        for name, g in grads.items():
            assert_close(g, fx[f"grad_{name}"], what=f"reverb:grad_{name}")


class TestChainParity:
    def test_style_chain(self):
        """Full reference style chain — EQ -> compressor -> reverb -> gain
        through the Processor.process_normalized protocol (reference
        examples/style_transfer.py:150-154), output AND the gradients of
        mean(y^2) w.r.t. ALL FOUR normalized parameter tensors checked
        through the whole composition (the configuration users actually
        train), with the reference's reverb noise captured."""
        fx = load("style_chain")
        x = jnp.asarray(fx["x"])
        noise = jnp.asarray(fx["noise"])
        num_samples = int(fx["num_samples"])
        num_taps = int(fx["num_taps"])

        eq = D.ParametricEQ(SR)
        comp = D.Compressor(SR, smoother="fsm")
        rev = D.NoiseShapedReverb(
            SR, num_samples=num_samples, num_bandpass_taps=num_taps)
        gain = D.Gain(SR)

        def chain(x, p):
            y = eq.process_normalized(x, p["eq"], clip_params=True)
            y = comp.process_normalized(y, p["comp"], clip_params=True)
            y = rev.process_normalized(y, p["reverb"], clip_params=True,
                                       noise=noise)
            return gain.process_normalized(y, p["gain"], clip_params=True)

        params = split_params(fx)
        y = jax.jit(chain)(x, params)
        assert_close(y, fx["y"], what="style_chain:output")

        loss = jax.jit(lambda p: jnp.mean(chain(x, p) ** 2))
        grads = jax.grad(loss)(params)
        for name, g in grads.items():
            assert_close(g, fx[f"grad_{name}"],
                         what=f"style_chain:grad_{name}")


class TestSignalParity:
    @pytest.mark.parametrize(
        "ftype", ["high_shelf", "low_shelf", "peaking", "low_pass", "high_pass"]
    )
    def test_biquad(self, ftype):
        fx = load(f"biquad_{ftype}")
        b, a = ops_biquad(
            jnp.asarray(fx["gain_db"]),
            jnp.asarray(fx["cutoff"]),
            jnp.asarray(fx["q"]),
            SR,
            ftype,
        )
        assert_close(b, fx["b"], 1e-6, what=f"biquad_{ftype}:b")
        assert_close(a, fx["a"], 1e-6, what=f"biquad_{ftype}:a")

    def test_filterbank(self):
        fx = load("filterbank")
        fb = octave_band_filterbank(1023, SR)
        assert_close(fb, fx["filters"], 1e-6, what="filterbank")

    def test_lfilter_via_fsm(self):
        fx = load("lfilter_fsm")
        y = jax.jit(lfilter_via_fsm)(
            jnp.asarray(fx["x"]), jnp.asarray(fx["b"]), jnp.asarray(fx["a"])
        )
        assert_close(y, fx["y"], what="lfilter_fsm")
