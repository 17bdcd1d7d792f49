"""DSP-correctness tests: validate primitives against scipy ground truth
and against analytic identities (SURVEY.md §4 item 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from dasp_tpu.ops import (
    ballistics_smooth,
    biquad,
    fft_conv_causal,
    fft_conv_full,
    fft_correlate_valid,
    lfilter1_exact,
    lfilter_via_fsm,
    onepole_exact,
    sosfilt_exact,
    sosfilt_via_fsm,
)

SR = 44100
RNG = np.random.default_rng(7)


class TestBiquadDesign:
    @pytest.mark.parametrize(
        "ftype,scipy_type",
        [("low_pass", "lowpass"), ("high_pass", "highpass"), ("peaking", None)],
    )
    def test_against_scipy_butter_like(self, ftype, scipy_type):
        """Cookbook low/high-pass at Q=1/sqrt(2) matches scipy butter(2)."""
        if scipy_type is None:
            pytest.skip("no scipy equivalent")
        fc = 1000.0
        q = 1.0 / np.sqrt(2.0)
        b, a = biquad(jnp.zeros(1), jnp.full((1,), fc), jnp.full((1,), q), SR, ftype)
        b_ref, a_ref = scipy.signal.butter(2, fc, btype=scipy_type, fs=SR)
        np.testing.assert_allclose(np.asarray(b)[0], b_ref, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a)[0], a_ref, atol=1e-6)

    def test_peaking_unity_at_zero_gain(self):
        b, a = biquad(jnp.zeros(2), jnp.array([500.0, 5000.0]), jnp.ones(2), SR, "peaking")
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-7)


class TestExactIIR:
    def test_sosfilt_exact_vs_scipy(self):
        """Exact scan-based biquad cascade matches scipy.signal.sosfilt.

        Run in float64 so the comparison measures the algorithm, not fp32
        recursion accumulation (a 3-section cascade in fp32 drifts ~2e-3
        over 2k samples in ANY implementation, scipy included)."""
        jax.config.update("jax_enable_x64", True)
        try:
            x = RNG.standard_normal((2, 1, 2048))
            secs = []
            for g, fc, q, ft in [
                (4.0, 200.0, 0.7, "low_shelf"),
                (-6.0, 1000.0, 2.0, "peaking"),
                (3.0, 8000.0, 0.7, "high_shelf"),
            ]:
                b, a = biquad(jnp.full((2,), g), jnp.full((2,), fc), jnp.full((2,), q), SR, ft)
                secs.append(jnp.concatenate([b, a], axis=-1))
            sos = jnp.stack(secs, axis=1)  # (2, 3, 6)

            y = jax.jit(sosfilt_exact)(sos, jnp.asarray(x))

            for i in range(2):
                # np.array (copy): scipy sosfilt needs a writable buffer
                y_ref = scipy.signal.sosfilt(np.array(sos[i]), x[i, 0])
                np.testing.assert_allclose(np.asarray(y)[i, 0], y_ref, atol=1e-9)
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_sosfilt_exact_fp32_sane(self):
        """fp32 cascade stays within fp32 recursion drift of scipy."""
        x = RNG.standard_normal((1, 1, 2048)).astype(np.float32)
        b, a = biquad(jnp.full((1,), -6.0), jnp.full((1,), 1000.0), jnp.full((1,), 2.0), SR, "peaking")
        sos = jnp.concatenate([b, a], axis=-1)[:, None, :]
        y = jax.jit(sosfilt_exact)(sos, jnp.asarray(x))
        y_ref = scipy.signal.sosfilt(np.asarray(sos)[0].astype(np.float64), x[0, 0])
        np.testing.assert_allclose(np.asarray(y)[0, 0], y_ref, atol=5e-3)

    def test_lfilter1_exact_vs_scipy(self):
        x = RNG.standard_normal((1, 1, 1024)).astype(np.float32)
        b = np.array([[0.2, 0.1]], dtype=np.float32)
        a = np.array([[1.0, -0.95]], dtype=np.float32)
        y = jax.jit(lfilter1_exact)(jnp.asarray(x), jnp.asarray(b)[:, None, :], jnp.asarray(a)[:, None, :])
        y_ref = scipy.signal.lfilter(b[0].astype(np.float64), a[0].astype(np.float64), x[0, 0])
        np.testing.assert_allclose(np.asarray(y)[0, 0], y_ref, atol=1e-4)

    def test_onepole_exact_vs_scipy(self):
        x = RNG.standard_normal((1, 1, 4096)).astype(np.float32)
        alpha = 0.995
        y = jax.jit(onepole_exact)(jnp.asarray(x), jnp.asarray(alpha))
        y_ref = scipy.signal.lfilter([1 - alpha], [1.0, -alpha], x[0, 0].astype(np.float64))
        np.testing.assert_allclose(np.asarray(y)[0, 0], y_ref, atol=1e-4)

    def test_fsm_approaches_exact(self):
        """FSM approximation should be close to the exact scan filter for a
        well-damped cascade (the reference's central numerical premise)."""
        x = RNG.standard_normal((1, 1, 4096)).astype(np.float32)
        b, a = biquad(jnp.full((1,), -4.0), jnp.full((1,), 2000.0), jnp.full((1,), 1.0), SR, "peaking")
        sos = jnp.concatenate([b, a], axis=-1)[:, None, :]
        y_fsm = jax.jit(sosfilt_via_fsm)(sos, jnp.asarray(x))
        y_exact = jax.jit(sosfilt_exact)(sos, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y_fsm), np.asarray(y_exact), atol=1e-3)

    def test_one_pole_butter_lowpass_matches_scipy_butter(self):
        """C7 coefficient math == scipy.signal.butter(1, ., 'low')
        (both are the bilinear transform of the analog 1-pole)."""
        from dasp_tpu.ops.biquad import one_pole_butter_lowpass

        fc = np.array([500.0, 4000.0], np.float64)
        b, a = one_pole_butter_lowpass(jnp.asarray(fc, jnp.float32), SR)
        for i, f in enumerate(fc):
            b_ref, a_ref = scipy.signal.butter(1, f / (SR / 2), btype="low")
            np.testing.assert_allclose(np.asarray(b)[i], b_ref, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(a)[i], a_ref, rtol=1e-5)

    def test_one_pole_butter_highpass_matches_scipy_butter(self):
        from dasp_tpu.ops.biquad import one_pole_butter_highpass

        fc = np.array([500.0, 4000.0], np.float64)
        b, a = one_pole_butter_highpass(jnp.asarray(fc, jnp.float32), SR)
        for i, f in enumerate(fc):
            b_ref, a_ref = scipy.signal.butter(1, f / (SR / 2), btype="high")
            np.testing.assert_allclose(np.asarray(b)[i], b_ref, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(a)[i], a_ref, rtol=1e-5)

    @pytest.mark.parametrize("ftype", ["lowpass", "highpass"])
    def test_one_pole_filter_behavior(self, ftype):
        """C8 (reference signal.py:199-239): the designed coefficients
        must produce a unity-gain monotone 1-pole response — unity at DC
        for lowpass / at Nyquist for highpass — and filtering white noise
        through them via our exact scan matches float64 scipy.lfilter."""
        from dasp_tpu.ops.biquad import one_pole_filter

        cut = np.array([0.2, 0.7], np.float32)  # normalized (fs=2 default)
        b, a = one_pole_filter(jnp.asarray(cut), ftype)
        b_np, a_np = np.asarray(b), np.asarray(a)
        for i in range(len(cut)):
            w, h = scipy.signal.freqz(b_np[i], a_np[i], worN=512)
            mag = np.abs(h)
            if ftype == "lowpass":
                assert abs(mag[0] - 1.0) < 1e-5  # unity DC gain
                assert np.all(np.diff(mag) < 1e-7)  # monotone decreasing
            else:
                # unity Nyquist gain, evaluated exactly at z = -1 (the freqz
                # grid stops just short of pi)
                h_nyq = (b_np[i, 0] - b_np[i, 1]) / (a_np[i, 0] - a_np[i, 1])
                assert abs(h_nyq - 1.0) < 1e-6
                assert np.all(np.diff(mag) > -1e-7)  # monotone increasing

        # time-domain: exact scan through the designed coefficients == scipy
        x = RNG.standard_normal((2, 1, 2048)).astype(np.float32)
        y = jax.jit(lfilter1_exact)(
            jnp.asarray(x), b[:, None, :], a[:, None, :])
        for i in range(len(cut)):
            y_ref = scipy.signal.lfilter(
                b_np[i].astype(np.float64), a_np[i].astype(np.float64), x[i, 0])
            np.testing.assert_allclose(np.asarray(y)[i, 0], y_ref, atol=1e-4)

    def test_fsm_onepole_step_response_closed_form(self):
        """The closed-form FSM step response (used to DC-split the
        compressor's gain smoothing) must equal lfilter_via_fsm applied to
        a ones block, per alpha, to fp64 accuracy."""
        from dasp_tpu.ops.fft_filter import fsm_onepole_step_response
        from dasp_tpu.ops.iir import onepole_ba

        jax.config.update("jax_enable_x64", True)
        try:
            T = 1000
            for alpha in (0.2, 0.9, 0.998, 0.99995):
                a_arr = jnp.full((1, 1), alpha, jnp.float64)
                b, a = onepole_ba(a_arr)
                u = jnp.ones((1, 1, T), jnp.float64)
                y_fsm = lfilter_via_fsm(u, b, a)
                y_closed = fsm_onepole_step_response(
                    jnp.full((1, 1, 1), alpha, jnp.float64), T)
                np.testing.assert_allclose(
                    np.asarray(y_fsm), np.asarray(y_closed), atol=1e-12)
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_ballistics_exact_vs_naive(self):
        """Sequential 'exact' ballistics equals a per-sample python loop."""
        g = -np.abs(RNG.standard_normal((1, 1, 256))).astype(np.float32)
        aa, ar = 0.9, 0.99
        y = ballistics_smooth(jnp.asarray(g), jnp.asarray(aa), jnp.asarray(ar), mode="exact")
        y_ref = np.zeros_like(g)
        prev = 0.0
        for n in range(g.shape[-1]):
            alpha = aa if g[0, 0, n] < prev else ar
            prev = (1 - alpha) * g[0, 0, n] + alpha * prev
            y_ref[0, 0, n] = prev
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)

    def test_ballistics_parallel_close_to_exact(self):
        g = -np.abs(RNG.standard_normal((1, 1, 1024))).astype(np.float32).cumsum(-1) / 50.0
        aa, ar = 0.9, 0.995
        y_p = ballistics_smooth(jnp.asarray(g), jnp.asarray(aa), jnp.asarray(ar), mode="parallel")
        y_e = ballistics_smooth(jnp.asarray(g), jnp.asarray(aa), jnp.asarray(ar), mode="exact")
        # the parallel approximation tracks the exact smoother closely
        err = np.abs(np.asarray(y_p) - np.asarray(y_e)).max()
        rng_span = np.abs(np.asarray(y_e)).max()
        assert err <= 0.05 * rng_span, f"parallel ballistics err {err} vs span {rng_span}"


class TestFFTConv:
    def test_full_vs_numpy(self):
        x = RNG.standard_normal((2, 3, 500)).astype(np.float32)
        h = RNG.standard_normal((3, 64)).astype(np.float32)
        y = jax.jit(fft_conv_full)(jnp.asarray(x), jnp.asarray(h))
        for i in range(2):
            for c in range(3):
                ref = np.convolve(x[i, c], h[c])
                np.testing.assert_allclose(np.asarray(y)[i, c], ref, atol=1e-4)

    def test_causal_matches_reference_pattern(self):
        """fft_conv_causal == left-pad + valid correlation with flipped IR
        (the reference reverb's conv pattern, functional.py:570-572)."""
        x = RNG.standard_normal((1, 2, 300)).astype(np.float32)
        ir = RNG.standard_normal((1, 2, 50)).astype(np.float32)
        y = fft_conv_causal(jnp.asarray(x), jnp.asarray(ir))
        K = ir.shape[-1]
        x_pad = np.pad(x, ((0, 0), (0, 0), (K - 1, 0)))
        for c in range(2):
            ref = np.correlate(x_pad[0, c], ir[0, c][::-1], mode="valid")
            np.testing.assert_allclose(np.asarray(y)[0, c], ref, atol=1e-4)

    def test_ola_matches_single_fft(self):
        """Overlap-save block convolution == single-FFT causal convolution."""
        from dasp_tpu.ops import ola_conv_causal

        x = RNG.standard_normal((2, 2, 3000)).astype(np.float32)
        h = RNG.standard_normal((2, 2, 200)).astype(np.float32)
        y_ref = fft_conv_causal(jnp.asarray(x), jnp.asarray(h))
        y_ola = jax.jit(lambda x, h: ola_conv_causal(x, h, block=512))(
            jnp.asarray(x), jnp.asarray(h)
        )
        np.testing.assert_allclose(np.asarray(y_ola), np.asarray(y_ref), atol=1e-4)

    def test_ola_default_block(self):
        from dasp_tpu.ops import ola_conv_causal

        x = RNG.standard_normal((1, 1, 10000)).astype(np.float32)
        h = RNG.standard_normal((1, 1, 63)).astype(np.float32)
        y_ref = fft_conv_causal(jnp.asarray(x), jnp.asarray(h))
        y_ola = ola_conv_causal(jnp.asarray(x), jnp.asarray(h))
        np.testing.assert_allclose(np.asarray(y_ola), np.asarray(y_ref), atol=1e-4)

    def test_ola_one_tap_ir(self):
        """Regression: K=1 made the -(K-1) history slice select the whole
        segment (-0 == 0) and crash the scan with a carry-shape mismatch."""
        from dasp_tpu.ops import ola_conv_causal

        x = RNG.standard_normal((1, 1, 2000)).astype(np.float32)
        h = np.asarray([[[0.5]]], dtype=np.float32)
        y = ola_conv_causal(jnp.asarray(x), jnp.asarray(h), block=512)
        np.testing.assert_allclose(np.asarray(y), 0.5 * x, atol=1e-6)

    def test_correlate_valid_vs_numpy(self):
        x = RNG.standard_normal((2, 4, 400)).astype(np.float32)
        h = RNG.standard_normal((4, 33)).astype(np.float32)
        y = fft_correlate_valid(jnp.asarray(x), jnp.asarray(h))
        for i in range(2):
            for c in range(4):
                ref = np.correlate(x[i, c], h[c], mode="valid")
                np.testing.assert_allclose(np.asarray(y)[i, c], ref, atol=1e-4)


class TestFFT4Step:
    """4-step MXU convolution (ops/fft4step.py) — the TPU path for the
    reverb-scale transforms, checked here on CPU against numpy."""

    def test_good_split(self):
        from dasp_tpu.ops.fft4step import good_split

        assert good_split(196608) == (384, 512)  # the reverb conv length
        assert good_split(65536) == (256, 256)
        n1, n2 = good_split(1024)
        assert n1 * n2 == 1024
        assert good_split(2 * 524287) is None  # large prime cofactor

    @pytest.mark.parametrize("n_fft,T,K", [(1024, 700, 325),
                                           (1536, 1000, 537),
                                           (4096, 3000, 1097)])
    def test_fft_mul_mxu_vs_numpy(self, n_fft, T, K):
        from dasp_tpu.ops.fft4step import fft_mul_mxu

        x = RNG.standard_normal((2, 2, T)).astype(np.float32)
        h = RNG.standard_normal((2, 2, K)).astype(np.float32)
        y = jax.jit(lambda a, b: fft_mul_mxu(a, b, n_fft))(
            jnp.asarray(x), jnp.asarray(h))
        assert y.shape == (2, 2, n_fft) and y.dtype == jnp.float32
        for i in range(2):
            for c in range(2):
                ref = np.fft.irfft(np.fft.rfft(x[i, c], n_fft)
                                   * np.fft.rfft(h[i, c], n_fft), n_fft)
                np.testing.assert_allclose(np.asarray(y)[i, c], ref,
                                           atol=2e-3, rtol=1e-5)

    def test_leading_axis_broadcast(self):
        # fft_correlate_valid-style broadcast: x (bs, 12, T) with h (12, K)
        from dasp_tpu.ops.fft4step import fft_mul_mxu

        x = RNG.standard_normal((2, 3, 300)).astype(np.float32)
        h = RNG.standard_normal((3, 40)).astype(np.float32)
        y = fft_mul_mxu(jnp.asarray(x), jnp.asarray(h), 512)
        for i in range(2):
            for c in range(3):
                ref = np.fft.irfft(np.fft.rfft(x[i, c], 512)
                                   * np.fft.rfft(h[c], 512), 512)
                np.testing.assert_allclose(np.asarray(y)[i, c], ref, atol=1e-4)

    def test_gradients_match_fft_path(self):
        # training runs through the conv: VJPs must agree with jnp.fft's
        from dasp_tpu.ops.fft4step import fft_mul_mxu

        x = jnp.asarray(RNG.standard_normal((1, 2, 600)).astype(np.float32))
        h = jnp.asarray(RNG.standard_normal((1, 2, 200)).astype(np.float32))

        def loss_mxu(x, h):
            return jnp.sum(fft_mul_mxu(x, h, 1024)[..., :600] ** 2)

        def loss_fft(x, h):
            y = jnp.fft.irfft(jnp.fft.rfft(x, 1024) * jnp.fft.rfft(h, 1024), 1024)
            return jnp.sum(y[..., :600] ** 2)

        gx1, gh1 = jax.grad(loss_mxu, argnums=(0, 1))(x, h)
        gx2, gh2 = jax.grad(loss_fft, argnums=(0, 1))(x, h)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                                   atol=2e-2, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh2),
                                   atol=2e-2, rtol=1e-4)


class TestSpectralBandNoise:
    """noise_mode="frequency" must draw the SAME Gaussian process as
    band-limiting time-domain white noise, for even and odd lengths."""

    def test_variance_matches_filter_energy(self):
        from dasp_tpu.functional import spectral_band_noise

        taps = RNG.standard_normal((2, 65)).astype(np.float32) * 0.2
        for n in (4096, 4097):  # even and odd
            y = spectral_band_noise(jax.random.PRNGKey(0), 64, jnp.asarray(taps), n)
            assert y.shape == (64, 2, n)
            # each sample is sum_j h_j * white: Var = sum(h^2) per band
            var = np.var(np.asarray(y), axis=(0, 2))
            np.testing.assert_allclose(var, (taps**2).sum(-1), rtol=0.08)

    def test_odd_length_last_bin_is_complex(self):
        """Regression: odd n has no Nyquist bin; the last rfft bin must be
        an ordinary complex bin (Var(re) = Var(im) = n/2), not a doubled
        real one."""
        from dasp_tpu.functional import spectral_band_noise

        n = 257
        delta = jnp.zeros((1, 9)).at[0, 0].set(1.0)  # unit filter
        y = spectral_band_noise(jax.random.PRNGKey(1), 4096, delta, n)
        Y = np.fft.rfft(np.asarray(y)[:, 0, :], axis=-1)
        v_re = np.var(Y[:, -1].real)
        v_im = np.var(Y[:, -1].imag)
        np.testing.assert_allclose(v_re, n / 2, rtol=0.15)
        np.testing.assert_allclose(v_im, n / 2, rtol=0.15)


class TestStereoIdentities:
    def test_panner_centre_balanced(self):
        """The reference pan law (functional.py:623-624) at centre gives
        equal gains of sqrt(cos(pi/4)/2) on both channels."""
        import dasp_tpu as D

        x = jnp.ones((1, 1, 8))
        y = D.stereo_panner(x, SR, jnp.full((1, 1), 0.5))
        lg = float(y[0, 0, 0, 0])
        rg = float(y[0, 1, 0, 0])
        assert abs(lg - rg) < 1e-6
        assert abs(lg - np.sqrt(np.cos(np.pi / 4) / 2)) < 1e-3

    def test_panner_hard_left(self):
        import dasp_tpu as D

        x = jnp.ones((1, 1, 8))
        y = D.stereo_panner(x, SR, jnp.zeros((1, 1)))
        assert abs(float(y[0, 0, 0, 0]) - 1.0) < 1e-6  # left gain 1
        assert abs(float(y[0, 1, 0, 0])) < 1e-6  # right gain 0

    def test_widener_half_is_identity(self):
        import dasp_tpu as D

        x = jnp.asarray(RNG.standard_normal((2, 2, 128)).astype(np.float32))
        y = D.stereo_widener(x, SR, jnp.full((2,), 0.5))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_widener_extremes(self):
        import dasp_tpu as D

        x = jnp.asarray(RNG.standard_normal((1, 2, 64)).astype(np.float32))
        # width=0: output is mono (mid only): left == right
        y0 = D.stereo_widener(x, SR, jnp.zeros((1,)))
        np.testing.assert_allclose(np.asarray(y0)[0, 0], np.asarray(y0)[0, 1], atol=1e-6)
        # width=1: side only: left == -right
        y1 = D.stereo_widener(x, SR, jnp.ones((1,)))
        np.testing.assert_allclose(np.asarray(y1)[0, 0], -np.asarray(y1)[0, 1], atol=1e-6)


class TestDynamicsCurves:
    def test_compressor_reduces_above_threshold(self):
        import dasp_tpu as D

        x = jnp.ones((1, 1, 8192)) * 0.9  # loud constant ~ -0.9 dB
        y = D.compressor(
            x, SR, jnp.array([-20.0]), jnp.array([8.0]), jnp.array([5.0]),
            jnp.array([50.0]), jnp.array([0.1]), jnp.array([0.0]), smoother="attack_only",
        )
        assert float(y[0, 0, -1]) < 0.9  # steady state gain < 1

    def test_expander_attenuates_below_threshold(self):
        import dasp_tpu as D

        x = jnp.ones((1, 1, 8192)) * 0.01  # quiet constant ~ -40 dB
        y = D.expander(
            x, SR, jnp.array([-20.0]), jnp.array([3.0]), jnp.array([5.0]),
            jnp.array([50.0]), jnp.array([0.1]), jnp.array([0.0]), smoother="attack_only",
        )
        assert float(y[0, 0, -1]) < 0.01

    def test_expander_transparent_above_threshold(self):
        import dasp_tpu as D

        x = jnp.ones((1, 1, 8192)) * 0.9
        y = D.expander(
            x, SR, jnp.array([-40.0]), jnp.array([4.0]), jnp.array([5.0]),
            jnp.array([50.0]), jnp.array([0.1]), jnp.array([0.0]), smoother="attack_only",
        )
        np.testing.assert_allclose(float(y[0, 0, -1]), 0.9, atol=1e-3)
