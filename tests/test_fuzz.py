"""Randomized in-range robustness fuzz: every processor, every fast path.

Samples normalized parameters uniformly over each Processor's full
declared range (the exact surface a sigmoid-driven network explores
during training) and asserts finite outputs AND finite, non-zero
gradients under jit. This is the test shape that would have caught the
NaN-at-training-scale incidents: parameter corners interacting with a
particular filter path at longer lengths.

Lengths are kept moderate for the CPU suite; the T=16384 compressor/EQ
cases still cross >100 cross-block scan products.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dasp_tpu as D

SR = 44100
BS = 4
RNG = np.random.default_rng(99)


def _x(chs, t):
    return jnp.asarray(RNG.standard_normal((BS, chs, t)).astype(np.float32) * 0.25)


def _p(proc):
    return jnp.asarray(RNG.uniform(0.0, 1.0, (BS, proc.num_params)).astype(np.float32))


def _assert_healthy(proc, x, n_draws=3, **kwargs):
    @jax.jit
    def loss(x, p):
        return jnp.mean(proc.process_normalized(x, p, clip_params=True, **kwargs) ** 2)

    grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
    for _ in range(n_draws):
        p = _p(proc)
        l = loss(x, p)
        assert bool(jnp.isfinite(l)), f"{type(proc).__name__}: non-finite output"
        gx, gp = grad(x, p)
        assert bool(jnp.isfinite(gx).all()), f"{type(proc).__name__}: non-finite dx"
        assert bool(jnp.isfinite(gp).all()), f"{type(proc).__name__}: non-finite dp"
        assert float(jnp.abs(gp).sum()) > 0, f"{type(proc).__name__}: zero dp"


class TestFuzzProcessors:
    @pytest.mark.parametrize("method", ["fsm", "exact", "block", "coupled"])
    def test_parametric_eq_long(self, method):
        _assert_healthy(D.ParametricEQ(SR, filter_method=method), _x(1, 16384))

    @pytest.mark.parametrize("smoother", ["fsm", "parallel", "block"])
    def test_compressor_long(self, smoother):
        _assert_healthy(D.Compressor(SR, smoother=smoother), _x(2, 16384))

    def test_expander(self):
        _assert_healthy(D.Expander(SR), _x(2, 8192))

    @pytest.mark.parametrize("method", ["fsm", "block", "coupled"])
    def test_graphic_eq(self, method):
        _assert_healthy(D.GraphicEQ(SR, filter_method=method), _x(2, 8192))

    @pytest.mark.parametrize("method", ["fsm", "block"])
    def test_advanced_distortion(self, method):
        _assert_healthy(D.AdvancedDistortion(SR, filter_method=method), _x(2, 8192))

    def test_gain_distortion_widener(self):
        _assert_healthy(D.Gain(SR), _x(2, 4096))
        _assert_healthy(D.Distortion(SR), _x(1, 4096))
        _assert_healthy(D.StereoWidener(SR), _x(2, 4096))

    def test_reverb(self):
        _assert_healthy(
            D.NoiseShapedReverb(SR, num_samples=2048), _x(2, 8192),
            key=jax.random.PRNGKey(0),
        )

    def test_style_chain_fuzz(self):
        # the full training render chain at the bench's method defaults
        from dasp_tpu.models import make_style_processors

        procs = make_style_processors(
            SR, reverb_num_samples=2048,
            eq_filter_method="block", compressor_smoother="block",
        )
        x = _x(1, 16384)

        @jax.jit
        def loss(x, pe, pc, pr, pg, key):
            y = procs["equalizer"].process_normalized(x, pe, clip_params=True)
            y = procs["compressor"].process_normalized(y, pc, clip_params=True)
            y = procs["reverb"].process_normalized(y, pr, clip_params=True, key=key)
            y = procs["gain"].process_normalized(y, pg, clip_params=True)
            return jnp.mean(y ** 2)

        grad = jax.jit(jax.grad(loss, argnums=(1, 2, 3, 4)))
        for i in range(3):
            ps = [
                jnp.asarray(RNG.uniform(0, 1, (BS, n)).astype(np.float32))
                for n in (18, 6, 25, 1)
            ]
            key = jax.random.PRNGKey(i)
            assert bool(jnp.isfinite(loss(x, *ps, key)))
            for g in grad(x, *ps, key):
                assert bool(jnp.isfinite(g).all())


class TestFuzzNewProcessors:
    """Same healthy-under-fuzz contract for the beyond-reference set."""

    def test_dynamics_family(self):
        _assert_healthy(D.Limiter(SR), _x(2, 8192))
        _assert_healthy(D.NoiseGate(SR), _x(2, 8192))
        _assert_healthy(D.TransientShaper(SR), _x(2, 8192))
        _assert_healthy(D.Clipper(SR), _x(2, 8192))

    def test_multiband_family(self):
        _assert_healthy(D.MultibandCompressor(SR), _x(2, 8192))
        _assert_healthy(D.DeEsser(SR), _x(2, 8192))
        _assert_healthy(D.StereoImager(SR), _x(2, 8192))

    def test_modulation_family(self):
        _assert_healthy(D.Chorus(SR), _x(2, 8192))
        _assert_healthy(D.Flanger(SR), _x(2, 8192))
        _assert_healthy(D.Tremolo(SR), _x(2, 8192))
        _assert_healthy(D.RingModulator(SR), _x(2, 8192))
        _assert_healthy(D.Phaser(SR), _x(2, 8192))
        _assert_healthy(D.AutoWah(SR), _x(2, 8192))
        _assert_healthy(D.Delay(SR), _x(2, 8192))
        _assert_healthy(D.PitchShift(SR, window_ms=20.0), _x(2, 8192))

    def test_spectral_family(self):
        _assert_healthy(D.DynamicEQ(SR), _x(2, 8192))
        _assert_healthy(D.SpectralGate(SR), _x(2, 8192))
        _assert_healthy(D.Exciter(SR), _x(2, 8192))
        _assert_healthy(D.Bitcrusher(SR), _x(2, 8192))

    def test_pv_family(self):
        # learnable-rate phase vocoder: frame 1024/hop 256 keeps the
        # CPU-suite cost moderate at T=8192
        _assert_healthy(D.TimeStretch(SR, frame_size=1024, hop=256), _x(2, 8192))
        _assert_healthy(
            D.PitchShiftPV(SR, max_semitones=7.0, frame_size=1024, hop=256),
            _x(2, 8192))

    def test_stochastic_and_side_input(self):
        _assert_healthy(D.WowFlutter(SR), _x(2, 8192), key=jax.random.PRNGKey(5))
        ir = jnp.asarray(RNG.standard_normal(256).astype(np.float32) * 0.1)
        _assert_healthy(D.ConvolutionReverb(SR), _x(2, 8192), ir=ir)
        sc = _x(1, 8192)
        _assert_healthy(D.SidechainCompressor(SR), _x(2, 8192), sidechain=sc)
