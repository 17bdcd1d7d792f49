"""Streaming layer: chunk-by-chunk processing == offline processing.

Each test renders a signal offline, then re-renders it through the
jitted stream step in chunks with carried state, and asserts the outputs
match to fp32 roundoff. This is the whole contract of
``dasp_tpu.streaming``: a serving deployment slicing audio into
2.9-ms chunks must produce the same samples an offline render does.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dasp_tpu as D
from dasp_tpu import streaming
from dasp_tpu.ops.biquad import biquad

SR = 44100
BS = 2
RNG = np.random.default_rng(21)


def _chunks(x, n):
    T = x.shape[-1]
    assert T % n == 0
    return [x[..., i : i + n] for i in range(0, T, n)]


def _stream_all(step, x, chunk, state=None):
    outs = []
    for c in _chunks(x, chunk):
        y, state = step(c, state)
        outs.append(y)
    return jnp.concatenate(outs, axis=-1), state


class TestSosfiltStream:
    def _sos(self, resonant=True):
        specs = [
            (4.0, 200.0, 0.7, "low_shelf"),
            (-6.0, 1000.0, 2.0, "peaking"),
            (3.0, 8000.0, 0.7, "high_shelf"),
        ]
        if resonant:
            # near-unit-circle resonant band — only the coupled
            # realization holds fp32 accuracy there (docs/PERFORMANCE.md)
            specs.insert(1, (6.0, 40.0, 2.0, "peaking"))
        secs = []
        for g, fc, q, ft in specs:
            b, a = biquad(jnp.full((BS,), g), jnp.full((BS,), fc),
                          jnp.full((BS,), q), SR, ft)
            secs.append(jnp.concatenate([b, a], axis=-1))
        return jnp.stack(secs, axis=1)

    @pytest.mark.parametrize("method", ["coupled", "block"])
    def test_chunked_equals_offline(self, method):
        from dasp_tpu.ops.iir import sosfilt_blockmat, sosfilt_coupled

        # the direct-form "block" state drifts from its own one-shot
        # rounding path on near-unit-circle bands (both are ~1e-1 from
        # f64 there), so it is exercised on the well-conditioned cascade;
        # "coupled" holds chunked == offline through the resonant band
        sos = self._sos(resonant=(method == "coupled"))
        x = jnp.asarray(RNG.standard_normal((BS, 2, 4096)).astype(np.float32) * 0.3)
        offline = (sosfilt_coupled if method == "coupled" else sosfilt_blockmat)(sos, x)
        step = jax.jit(lambda c, s: streaming.sosfilt_stream(sos, c, zi=s, filter_method=method))
        y, _ = _stream_all(step, x, 512)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=5e-4)

    def test_coupled_chunked_matches_float64(self):
        import scipy.signal

        sos = self._sos()
        x = jnp.asarray(RNG.standard_normal((BS, 2, 4096)).astype(np.float32) * 0.3)
        step = jax.jit(lambda c, s: streaming.sosfilt_stream(sos, c, zi=s))
        y, _ = _stream_all(step, x, 512)
        ref = scipy.signal.sosfilt(np.asarray(sos, np.float64)[0], np.asarray(x, np.float64)[0])
        scale = np.abs(ref).max()
        assert np.abs(np.asarray(y)[0] - ref).max() / scale < 1e-4

    def test_rejects_unaligned_chunk(self):
        sos = self._sos()
        x = jnp.zeros((BS, 2, 200))  # not a multiple of block=128
        with pytest.raises(ValueError, match="multiple of block"):
            streaming.sosfilt_stream(sos, x)


class TestEQStreams:
    def test_parametric_eq_stream(self):
        p = [jnp.full((BS,), v) for v in
             [2.0, 200.0, 0.7, 3.0, 400.0, 1.0, -2.0, 3000.0, 2.0,
              1.0, 9000.0, 1.0, 2.0, 13000.0, 1.0, -3.0, 8000.0, 0.7]]
        x = jnp.asarray(RNG.standard_normal((BS, 2, 2048)).astype(np.float32) * 0.3)
        offline = D.parametric_eq(x, SR, *p, filter_method="coupled")
        step = jax.jit(lambda c, s: streaming.parametric_eq_stream(c, SR, *p, zi=s))
        y, zf = _stream_all(step, x, 256)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=5e-4)
        assert zf.shape == (BS, 2, 6, 2)

    def test_graphic_eq_stream(self):
        gains = jnp.asarray(RNG.uniform(-6, 6, (BS, 10)).astype(np.float32))
        x = jnp.asarray(RNG.standard_normal((BS, 2, 2048)).astype(np.float32) * 0.3)
        offline = D.graphic_eq(x, SR, gains, filter_method="coupled")
        step = jax.jit(lambda c, s: streaming.graphic_eq_stream(c, SR, gains, zi=s))
        y, _ = _stream_all(step, x, 256)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=5e-4)


class TestDynamicsStreams:
    def _params(self):
        f = lambda v: jnp.full((BS,), v)  # noqa: E731
        return dict(threshold_db=f(-24.0), ratio=f(4.0), attack_ms=f(10.0),
                    release_ms=f(60.0), knee_db=f(6.0), makeup_gain_db=f(1.0))

    def test_compressor_stream(self):
        kw = self._params()
        x = jnp.asarray(RNG.standard_normal((BS, 2, 4096)).astype(np.float32) * 0.5)
        offline = D.compressor(x, SR, **kw, smoother="block")
        step = jax.jit(functools.partial(
            lambda c, s, kw: streaming.compressor_stream(c, SR, **kw, zi=s), kw=kw))
        y, zf = _stream_all(step, x, 512)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=1e-5)
        assert zf.shape == (BS, 1, 1, 4)

    def test_expander_stream(self):
        kw = self._params()
        x = jnp.asarray(RNG.standard_normal((BS, 2, 4096)).astype(np.float32) * 0.3)
        offline = D.expander(x, SR, **kw, smoother="block")
        step = jax.jit(functools.partial(
            lambda c, s, kw: streaming.expander_stream(c, SR, **kw, zi=s), kw=kw))
        y, _ = _stream_all(step, x, 512)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=1e-5)


class TestReverbStream:
    def test_reverb_stream_matches_offline(self):
        num_samples = 1024
        gains = jnp.asarray(RNG.uniform(0.2, 0.9, (BS, 12)).astype(np.float32))
        decays = jnp.asarray(RNG.uniform(0.2, 0.9, (BS, 12)).astype(np.float32))
        mix = jnp.full((BS,), 0.7)
        key = jax.random.PRNGKey(5)
        x = jnp.asarray(RNG.standard_normal((BS, 2, 2048)).astype(np.float32) * 0.3)

        # offline render with the SAME noise (inject via noise_mode +
        # identical key through the shared IR builder)
        offline = D.noise_shaped_reverberation(
            x, SR, *[gains[:, i] for i in range(12)],
            *[decays[:, i] for i in range(12)], mix,
            num_samples=num_samples, key=key, noise_mode="frequency",
        )

        state = streaming.reverb_stream_init(
            SR, gains, decays, mix, key, num_samples=num_samples,
            noise_mode="frequency",
        )
        step = jax.jit(streaming.reverb_stream)
        y, state = _stream_all(step, x, 256, state)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=1e-4)
        assert state["hist"].shape == (BS, 2, num_samples - 1)

    def test_mono_input_duplicated(self):
        state = streaming.reverb_stream_init(
            SR, jnp.full((1, 12), 0.5), jnp.full((1, 12), 0.5), 0.5,
            jax.random.PRNGKey(0), num_samples=512,
        )
        y, _ = streaming.reverb_stream(jnp.zeros((1, 1, 256)), state)
        assert y.shape == (1, 2, 256)


class TestStreamingChainScan:
    def test_stream_under_lax_scan(self):
        """The step is a pure function — drive a whole stream with ONE
        lax.scan (the production serving shape: no Python loop)."""
        gains = jnp.asarray(RNG.uniform(-6, 6, (BS, 10)).astype(np.float32))
        x = jnp.asarray(RNG.standard_normal((BS, 2, 2048)).astype(np.float32) * 0.3)
        offline = D.graphic_eq(x, SR, gains, filter_method="coupled")

        nb = 8
        xb = jnp.stack(_chunks(x, 2048 // nb), axis=0)  # (nb, bs, 2, 256)
        zi0 = jnp.zeros((BS, 2, 10, 2))

        @jax.jit
        def run(xb, zi):
            def body(s, c):
                y, s = streaming.graphic_eq_stream(c, SR, gains, zi=s)
                return s, y
            _, yb = jax.lax.scan(body, zi, xb)
            return yb

        yb = run(xb, zi0)
        y = jnp.concatenate(list(yb), axis=-1)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=5e-4)


class TestNewEffectStreams:
    def test_delay_stream_matches_offline(self):
        # integer-sample delay so offline (closed-form comb, fractional-
        # capable) and streaming (time-domain recursion) agree exactly
        D_samp = 300
        d_ms = D_samp / SR * 1e3
        fb = jnp.full((BS,), 0.6, jnp.float32)
        mix = jnp.full((BS,), 0.7, jnp.float32)
        x = jnp.asarray(RNG.standard_normal((BS, 2, 8192)).astype(np.float32) * 0.3)
        offline = jax.jit(
            lambda x: D.functional.delay(x, SR, jnp.full((BS,), d_ms), fb, mix)
        )(x)
        step = jax.jit(
            lambda c, s: streaming.delay_stream(c, SR, D_samp, fb, mix, state=s)
        )
        y, _ = _stream_all(step, x, 512)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=2e-4)

    def test_delay_stream_chunk_smaller_and_larger_than_delay(self):
        # chunk < D exercises the pure-gather path, chunk > D the
        # block-recursion path; both must agree with a one-shot call
        D_samp = 256
        fb = jnp.full((1,), 0.5, jnp.float32)
        mix = jnp.full((1,), 1.0, jnp.float32)
        x = jnp.asarray(RNG.standard_normal((1, 1, 4096)).astype(np.float32))
        one, _ = streaming.delay_stream(x, SR, D_samp, fb, mix)
        for chunk in (128, 1024):
            step = jax.jit(
                lambda c, s: streaming.delay_stream(c, SR, D_samp, fb, mix, state=s)
            )
            y, _ = _stream_all(step, x, chunk)
            np.testing.assert_allclose(np.asarray(y), np.asarray(one), atol=1e-5)

    def test_modulated_delay_stream_matches_offline(self):
        rate = jnp.full((BS,), 1.3, jnp.float32)
        depth = jnp.full((BS,), 6.0, jnp.float32)
        base = jnp.full((BS,), 12.0, jnp.float32)
        mix = jnp.full((BS,), 0.8, jnp.float32)
        L = int((12.0 + 6.0) / 1e3 * SR) + 2
        x = jnp.asarray(RNG.standard_normal((BS, 2, 8192)).astype(np.float32) * 0.3)
        offline = jax.jit(
            lambda x: D.functional.modulated_delay(x, SR, rate, depth, base, mix)
        )(x)
        step = jax.jit(
            lambda c, s: streaming.modulated_delay_stream(
                c, SR, rate, depth, base, mix, L, state=s
            )
        )
        y, _ = _stream_all(step, x, 512)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=5e-4)

    def test_exciter_stream_matches_offline(self):
        freq = jnp.full((BS,), 3000.0, jnp.float32)
        drive = jnp.full((BS,), 15.0, jnp.float32)
        amount = jnp.full((BS,), 0.8, jnp.float32)
        x = jnp.asarray(RNG.standard_normal((BS, 2, 8192)).astype(np.float32) * 0.3)
        offline = jax.jit(
            lambda x: D.functional.exciter(x, SR, freq, drive, amount)
        )(x)
        step = jax.jit(
            lambda c, s: streaming.exciter_stream(c, SR, freq, drive, amount, zi=s)
        )
        y, _ = _stream_all(step, x, 512)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=2e-4)

    @pytest.mark.parametrize("smoother", ["parallel", "exact"])
    def test_transient_shaper_stream_matches_offline(self, smoother):
        att = jnp.full((BS,), 0.8, jnp.float32)
        sus = jnp.full((BS,), -0.5, jnp.float32)
        x = jnp.asarray(RNG.standard_normal((BS, 2, 8192)).astype(np.float32) * 0.3)
        offline = jax.jit(
            lambda x: D.functional.transient_shaper(x, SR, att, sus, smoother=smoother)
        )(x)
        step = jax.jit(
            lambda c, s: streaming.transient_shaper_stream(
                c, SR, att, sus, state=s, smoother=smoother
            )
        )
        y, _ = _stream_all(step, x, 512)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=2e-4)

    def test_pitch_shift_stream_matches_offline(self):
        st = jnp.full((BS,), 5.0, jnp.float32)
        mix = jnp.full((BS,), 0.9, jnp.float32)
        x = jnp.asarray(RNG.standard_normal((BS, 2, 8192)).astype(np.float32) * 0.3)
        # streaming is causal: it matches the compensate_latency=False
        # form. Compare against the GATHER evaluation — the stream's own
        # formulation — so the comparison is kink-rounding-stable (the
        # matmul path's tile-local coordinates round floor/frac
        # differently at near-integer read positions; one-in-1e4 samples
        # then differ by the local signal slope, and the tile size is a
        # tuning knob that must not break this test).
        offline = jax.jit(
            lambda x: D.functional.pitch_shift(
                x, SR, st, mix, window_ms=30.0, compensate_latency=False,
                matmul=False,
            )
        )(x)
        step = jax.jit(
            lambda c, s: streaming.pitch_shift_stream(
                c, SR, st, mix, window_ms=30.0, state=s
            )
        )
        y, _ = _stream_all(step, x, 512)
        # chunked phase accumulation rounds the sawtooth differently at
        # a handful of near-integer read positions (kinks), where the
        # interpolation snaps to the other endpoint — bounded by the
        # local sample step, not by fp32 eps. Assert dense agreement
        # with an explicit kink-outlier budget instead of relying on
        # lucky rounding.
        diff = np.abs(np.asarray(y) - np.asarray(offline))
        outliers = int((diff > 5e-4).sum())
        assert outliers <= diff.size * 5e-4, (outliers, diff.size)
        assert float(diff.max()) < 5e-2, float(diff.max())

    def test_tremolo_stream_matches_offline(self):
        rate = jnp.full((BS,), 4.5, jnp.float32)
        depth = jnp.full((BS,), 0.9, jnp.float32)
        x = jnp.asarray(RNG.standard_normal((BS, 1, 8192)).astype(np.float32))
        offline = jax.jit(lambda x: D.functional.tremolo(x, SR, rate, depth))(x)
        step = jax.jit(
            lambda c, s: streaming.tremolo_stream(c, SR, rate, depth, state=s)
        )
        y, _ = _stream_all(step, x, 1024)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=1e-5)

    @pytest.mark.parametrize("smoother", ["block", "parallel", "exact"])
    def test_limiter_stream_matches_offline(self, smoother):
        args = [jnp.full((BS,), v, jnp.float32) for v in (-12.0, 2.0, 80.0, 3.0, 1.5)]
        x = jnp.asarray(RNG.standard_normal((BS, 2, 8192)).astype(np.float32) * 0.5)
        offline = jax.jit(
            lambda x: D.functional.limiter(x, SR, *args, smoother=smoother)
        )(x)
        step = jax.jit(
            lambda c, s: streaming.limiter_stream(
                c, SR, *args, zi=s, smoother=smoother
            )
        )
        y, _ = _stream_all(step, x, 512)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=5e-4)

    @pytest.mark.parametrize("smoother", ["parallel", "exact"])
    def test_compressor_stream_true_ballistics(self, smoother):
        # the streaming layer carries the (ya, ym) envelope state so the
        # true attack/release smoothers chunk exactly like offline —
        # release tails crossing chunk boundaries included
        args = [jnp.full((BS,), v, jnp.float32)
                for v in (-20.0, 4.0, 2.0, 150.0, 4.0, 1.0)]
        # bursty signal: loud attack region then silence, so the release
        # trajectory spans several 512-sample chunks
        x = np.asarray(RNG.standard_normal((BS, 2, 8192)), np.float32) * 0.05
        x[..., 1024:2048] *= 20.0
        x = jnp.asarray(x)
        offline = jax.jit(
            lambda x: D.functional.compressor(x, SR, *args, smoother=smoother)
        )(x)
        step = jax.jit(
            lambda c, s: streaming.compressor_stream(
                c, SR, *args, zi=s, smoother=smoother
            )
        )
        y, _ = _stream_all(step, x, 512)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=5e-4)

    @pytest.mark.parametrize("method", ["coupled", "block"])
    def test_multiband_stream_matches_offline(self, method):
        b = lambda v: jnp.full((BS,), v, jnp.float32)
        params = dict(
            crossover_low_hz=b(250.0), crossover_high_hz=b(2500.0),
            low_threshold_db=b(-25.0), low_ratio=b(4.0), low_attack_ms=b(5.0),
            low_release_ms=b(60.0), low_makeup_gain_db=b(1.0),
            mid_threshold_db=b(-20.0), mid_ratio=b(3.0), mid_attack_ms=b(5.0),
            mid_release_ms=b(60.0), mid_makeup_gain_db=b(0.5),
            high_threshold_db=b(-15.0), high_ratio=b(2.0), high_attack_ms=b(5.0),
            high_release_ms=b(60.0), high_makeup_gain_db=b(0.0),
            knee_db=b(4.0),
        )
        x = jnp.asarray(RNG.standard_normal((BS, 2, 4096)).astype(np.float32) * 0.4)
        offline = jax.jit(
            lambda x: D.functional.multiband_compressor(
                x, SR, **params, smoother="block", filter_method=method
            )
        )(x)
        step = jax.jit(
            lambda c, s: streaming.multiband_compressor_stream(
                c, SR, **params, state=s, filter_method=method
            )
        )
        y, _ = _stream_all(step, x, 512)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=1e-3)


class TestStreamChain:
    def test_chain_matches_manual_composition(self):
        eq_p = [jnp.full((BS,), v, jnp.float32) for v in
                (2.0, 150.0, 0.7, -3.0, 900.0, 1.5, 1.0, 2500.0, 1.0,
                 -1.0, 5000.0, 1.5, 2.0, 9000.0, 0.7, 0.0, 12000.0, 0.7)]
        cp = [jnp.full((BS,), v, jnp.float32)
              for v in (-20.0, 4.0, 5.0, 60.0, 4.0, 1.0)]
        lp = [jnp.full((BS,), v, jnp.float32)
              for v in (-8.0, 1.0, 120.0, 2.0, 0.0)]
        chain = streaming.StreamChain([
            ("eq", lambda c, s: streaming.parametric_eq_stream(c, SR, *eq_p, zi=s)),
            ("comp", lambda c, s: streaming.compressor_stream(c, SR, *cp, zi=s)),
            ("lim", lambda c, s: streaming.limiter_stream(c, SR, *lp, zi=s)),
        ])
        x = jnp.asarray(RNG.standard_normal((BS, 2, 4096)).astype(np.float32) * 0.3)

        # manual offline composition with matching smoother semantics
        @jax.jit
        def offline(x):
            y = D.functional.parametric_eq(x, SR, *eq_p, filter_method="coupled")
            y = D.functional.compressor(y, SR, *cp, smoother="block")
            return D.functional.limiter(y, SR, *lp, smoother="parallel")

        step = jax.jit(chain)
        state = None
        outs = []
        for i in range(0, 4096, 512):
            y, state = step(x[..., i : i + 512], state)
            outs.append(y)
        y_stream = jnp.concatenate(outs, axis=-1)
        # measured chain error is ~1.2e-7 (fp32 ULP at this scale); the
        # per-effect standard (2e-5) holds through composition because
        # every stage's streaming path is the SAME kernel as its offline
        # path with carried state, not an approximation of it
        np.testing.assert_allclose(
            np.asarray(y_stream), np.asarray(offline(x)), atol=2e-5
        )
        assert set(state.keys()) == {"eq", "comp", "lim"}

    def test_rejects_empty_and_duplicate(self):
        with pytest.raises(ValueError, match="at least one"):
            streaming.StreamChain([])
        fn = lambda c, s: (c, s)
        with pytest.raises(ValueError, match="Duplicate"):
            streaming.StreamChain([("a", fn), ("a", fn)])


class TestSidechainGateStreams:
    def test_sidechain_compressor_stream_matches_offline(self):
        x = jnp.asarray(RNG.standard_normal((BS, 2, 8192)).astype(np.float32) * 0.1)
        k = jnp.asarray(RNG.standard_normal((BS, 1, 8192)).astype(np.float32) * 0.6)
        kw = dict(threshold_db=jnp.full((BS,), -30.0), ratio=jnp.full((BS,), 8.0),
                  attack_ms=jnp.full((BS,), 5.0), release_ms=jnp.full((BS,), 60.0),
                  knee_db=jnp.full((BS,), 3.0), makeup_gain_db=jnp.full((BS,), 0.0))
        offline = jax.jit(lambda x, k: D.functional.sidechain_compressor(
            x, SR, **kw, smoother="parallel", sidechain=k))(x, k)
        step = jax.jit(lambda c, s, kc: streaming.sidechain_compressor_stream(
            c, SR, **kw, zi=s, smoother="parallel", sidechain=kc))
        outs, state = [], None
        for i in range(0, 8192, 1024):
            y, state = step(x[..., i:i + 1024], state, k[..., i:i + 1024])
            outs.append(y)
        y = jnp.concatenate(outs, axis=-1)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=2e-5)

    @pytest.mark.parametrize("hold_ms", [0.0, 12.0])
    def test_noise_gate_stream_matches_offline(self, hold_ms):
        # bursty signal so the gate actually opens and closes
        t = 16384
        env = np.where((np.arange(t) // 3000) % 2 == 0, 0.4, 0.002)
        x = jnp.asarray(
            (RNG.standard_normal((BS, 1, t)) * env).astype(np.float32))
        kw = dict(threshold_db=jnp.full((BS,), -30.0), ratio=jnp.full((BS,), 10.0),
                  range_db=jnp.full((BS,), 50.0), attack_ms=jnp.full((BS,), 0.5),
                  release_ms=jnp.full((BS,), 20.0), knee_db=jnp.full((BS,), 1.0))
        offline = jax.jit(lambda x: D.functional.noise_gate(
            x, SR, **kw, hold_ms=hold_ms, smoother="parallel"))(x)
        step = jax.jit(lambda c, s: streaming.noise_gate_stream(
            c, SR, **kw, hold_ms=hold_ms, state=s, smoother="parallel"))
        y, _ = _stream_all(step, x, 1024)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=2e-5)

    def test_noise_gate_stream_rejects_bad_smoother(self):
        x = jnp.zeros((1, 1, 512), jnp.float32)
        with pytest.raises(ValueError, match="smoother"):
            streaming.noise_gate_stream(
                x, SR, threshold_db=-30.0, ratio=4.0, range_db=40.0,
                attack_ms=1.0, release_ms=20.0, knee_db=1.0, smoother="block")


class TestTvFilterStreams:
    def test_phaser_stream_matches_offline_with_wola_delay(self):
        T, L, hop = 16384, 512, 128
        left = L - hop
        x = jnp.asarray(RNG.standard_normal((BS, 2, T)).astype(np.float32) * 0.3)
        kw = dict(rate_hz=jnp.full((BS,), 1.3), depth=jnp.full((BS,), 0.8),
                  centre_frequency_hz=jnp.full((BS,), 700.0),
                  feedback=jnp.full((BS,), 0.4), mix=jnp.full((BS,), 0.5))
        offline = jax.jit(lambda x: D.functional.phaser(x, SR, **kw))(x)
        step = jax.jit(lambda c, s: streaming.phaser_stream(c, SR, **kw, state=s))
        y, _ = _stream_all(step, x, 1024)
        # stream output = offline delayed by the WOLA lookahead (L - hop)
        np.testing.assert_allclose(
            np.asarray(y)[..., left:], np.asarray(offline)[..., : T - left],
            atol=2e-5,
        )

    def test_auto_wah_stream_matches_offline(self):
        T, L, hop = 16384, 512, 128
        left = L - hop
        env = np.where((np.arange(T) // 4096) % 2 == 0, 0.6, 0.05)
        x = jnp.asarray((RNG.standard_normal((BS, 1, T)) * env).astype(np.float32))
        kw = dict(sensitivity=jnp.full((BS,), 5.0), attack_ms=jnp.full((BS,), 5.0),
                  release_ms=jnp.full((BS,), 50.0),
                  min_frequency_hz=jnp.full((BS,), 200.0),
                  max_frequency_hz=jnp.full((BS,), 2000.0),
                  q_factor=jnp.full((BS,), 4.0), mix=jnp.full((BS,), 1.0))
        offline = jax.jit(lambda x: D.functional.auto_wah(x, SR, **kw))(x)
        step = jax.jit(lambda c, s: streaming.auto_wah_stream(c, SR, **kw, state=s))
        y, _ = _stream_all(step, x, 2048)
        # skip the offline render's clipped edge frames (first/last L)
        np.testing.assert_allclose(
            np.asarray(y)[..., left + L : T - L],
            np.asarray(offline)[..., L : T - left - L],
            atol=3e-5,
        )

    def test_spectral_gate_stream_matches_offline(self):
        T, L, hop = 32768, 2048, 512
        left = L - hop
        n = np.arange(T) / SR
        tone = 0.3 * np.sin(2 * np.pi * 1000.0 * n) * (np.arange(T) > T // 2)
        sig = (tone + 0.01 * RNG.standard_normal(T)).astype(np.float32)
        x = jnp.asarray(np.broadcast_to(sig, (BS, 1, T)).copy())
        noise_only = jnp.asarray(
            0.01 * RNG.standard_normal((BS, 1, T)).astype(np.float32)
        )
        prof = D.functional.spectral_noise_profile(noise_only)
        kw = dict(
            threshold_db=jnp.full((BS,), 6.0), range_db=jnp.full((BS,), 40.0),
            attack_ms=jnp.full((BS,), 5.0), release_ms=jnp.full((BS,), 80.0),
        )
        # streaming is causal: it matches det_smooth_mode="causal"
        offline = jax.jit(
            lambda x: D.functional.spectral_gate(
                x, SR, **kw, noise_profile_db=prof, det_smooth_mode="causal"
            )
        )(x)
        step = jax.jit(
            lambda c, s: streaming.spectral_gate_stream(
                c, SR, **kw, noise_profile_db=prof, state=s
            )
        )
        y, _ = _stream_all(step, x, 2048)
        np.testing.assert_allclose(
            np.asarray(y)[..., left:], np.asarray(offline)[..., : T - left],
            atol=5e-5,
        )

    def test_phaser_stream_chunk_size_invariance(self):
        T = 8192
        x = jnp.asarray(RNG.standard_normal((1, 1, T)).astype(np.float32))
        kw = dict(rate_hz=2.0, depth=1.0, centre_frequency_hz=900.0,
                  feedback=0.2, mix=0.7)
        outs = []
        for chunk in (128, 512, 2048):
            step = jax.jit(lambda c, s: streaming.phaser_stream(c, SR, **kw, state=s))
            y, _ = _stream_all(step, x, chunk)
            outs.append(np.asarray(y))
        # the carried LFO phase accumulates with chunk-size-dependent
        # grouping, so chunk sizes agree to fp32 phase roundoff
        np.testing.assert_allclose(outs[0], outs[1], atol=5e-5)
        np.testing.assert_allclose(outs[0], outs[2], atol=5e-5)


class TestDeEsserBitcrusherStreams:
    def test_de_esser_stream_matches_offline(self):
        t = 16384
        n = np.arange(t, dtype=np.float32)
        sib = (0.3 * np.sin(2 * np.pi * 300 * n / SR)
               + 0.4 * np.sin(2 * np.pi * 8000 * n / SR) * (n > t // 2))
        x = jnp.asarray(np.broadcast_to(sib, (BS, 1, t)).astype(np.float32))
        kw = dict(frequency_hz=jnp.full((BS,), 5000.0),
                  threshold_db=jnp.full((BS,), -40.0), ratio=jnp.full((BS,), 8.0),
                  attack_ms=jnp.full((BS,), 1.0), release_ms=jnp.full((BS,), 50.0),
                  knee_db=jnp.full((BS,), 3.0))
        offline = jax.jit(lambda x: D.functional.de_esser(
            x, SR, **kw, smoother="parallel"))(x)
        step = jax.jit(lambda c, s: streaming.de_esser_stream(
            c, SR, **kw, state=s))
        y, _ = _stream_all(step, x, 1024)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=3e-5)

    @pytest.mark.parametrize("srr", [44100.0, 11025.0, 3000.0])
    def test_bitcrusher_stream_matches_offline(self, srr):
        x = jnp.asarray(RNG.standard_normal((BS, 2, 8192)).astype(np.float32) * 0.5)
        kw = dict(bit_depth=jnp.full((BS,), 5.0),
                  sample_rate_hz=jnp.full((BS,), srr), mix=jnp.full((BS,), 0.9))
        offline = jax.jit(lambda x: D.functional.bitcrusher(x, SR, **kw))(x)
        step = jax.jit(lambda c, s: streaming.bitcrusher_stream(c, SR, **kw, state=s))
        y, _ = _stream_all(step, x, 512)
        np.testing.assert_allclose(np.asarray(y), np.asarray(offline), atol=1e-6)


class TestPhaseVocoderStreams:
    """Streaming PV (VERDICT r2 #6): the concatenated stream equals the
    offline time stretch delayed by frame_size - hop + D*hop."""

    @pytest.mark.parametrize("rate,k_in", [(1.25, 10), (0.8, 8), (1.0, 4), (1.5, 6)])
    def test_time_stretch_stream_matches_offline(self, rate, k_in):
        L, hop = 2048, 512
        T = k_in * hop * max(1, 40960 // (k_in * hop))  # whole chunks
        x = jnp.asarray(RNG.standard_normal((BS, 2, T)).astype(np.float32) * 0.3)
        offline = jax.jit(
            lambda x: D.functional.time_stretch(x, SR, rate, L, hop))(x)
        step = jax.jit(lambda c, s: streaming.time_stretch_stream(
            c, SR, rate, L, hop, state=s))
        y, _ = _stream_all(step, x, k_in * hop)
        Dl = max(1, int(np.ceil(2.0 / rate - 1.0)))
        delay = (L - hop) + Dl * hop
        n = min(offline.shape[-1], y.shape[-1] - delay) - L
        np.testing.assert_allclose(
            np.asarray(y)[..., delay:delay + n],
            np.asarray(offline)[..., :n], atol=1e-4)

    def test_time_stretch_stream_rejects_fractional_frames(self):
        x = jnp.zeros((1, 1, 5 * 512), jnp.float32)
        with pytest.raises(ValueError, match="integer"):
            streaming.time_stretch_stream(x, SR, 1.3, 2048, 512)

    def test_pitch_shift_pv_stream_moves_the_tone(self):
        T = 40960
        n = np.arange(T) / SR
        x = jnp.asarray((0.5 * np.sin(2 * np.pi * 440.0 * n))
                        .astype(np.float32))[None, None, :]
        semis = 12.0 * np.log2(1.5)  # r = 1.5 exactly (chunk-rational)
        step = jax.jit(lambda c, s: streaming.pitch_shift_pv_stream(
            c, SR, semis, 2048, 512, state=s))
        y, _ = _stream_all(step, x, 8 * 512)
        assert y.shape == x.shape
        seg = np.asarray(y)[0, 0, 16384:32768] * np.hanning(16384)
        f_peak = np.abs(np.fft.rfft(seg)).argmax() * SR / 16384
        assert abs(f_peak - 660.0) < 8.0, f_peak
