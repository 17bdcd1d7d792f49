"""Behavioral + fuzz tests for the beyond-reference time-based effects.

Covers functional.delay / modulated_delay / tremolo / limiter /
multiband_compressor and their Processor wrappers (Delay, Chorus,
Flanger, Tremolo, Limiter, MultibandCompressor). The reference ships
none of these; behavior is pinned against first-principles DSP
expectations (echo positions, LFO envelopes, ceiling enforcement,
crossover flatness) rather than fixtures.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dasp_tpu as D
import dasp_tpu.functional as F

SR = 44100.0
RNG = np.random.default_rng(7)


def _b(v, bs=1):
    return jnp.full((bs,), v, jnp.float32)


def _noise(bs, chs, t, scale=0.1):
    return jnp.asarray(RNG.standard_normal((bs, chs, t)).astype(np.float32) * scale)


class TestDelay:
    def test_echo_positions_and_amplitudes(self):
        # impulse through a 100-sample delay, fb=0.5, mix=1: taps at
        # n0 + k*100 with amplitude 0.5^(k-1)
        t = 4096
        x = np.zeros((1, 1, t), np.float32)
        x[0, 0, 10] = 1.0
        d_ms = 100.0 / SR * 1e3
        y = np.asarray(
            jax.jit(F.delay)(jnp.asarray(x), SR, _b(d_ms), _b(0.5), _b(1.0))
        )[0, 0]
        for k in range(1, 5):
            tap = y[10 + k * 100]
            assert abs(tap - 0.5 ** (k - 1)) < 1e-3, (k, tap)
        # between taps: silence
        assert abs(y[10 + 50]) < 1e-3

    def test_mix_zero_is_identity(self):
        x = _noise(2, 2, 2048)
        y = jax.jit(F.delay)(x, SR, _b(37.0, 2), _b(0.6, 2), _b(0.0, 2))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-4)

    def test_grad_flows_to_delay_time(self):
        x = _noise(1, 1, 4096)
        tgt = jax.jit(F.delay)(x, SR, _b(25.0), _b(0.4), _b(0.7))

        def loss(d_ms):
            y = F.delay(x, SR, d_ms, _b(0.4), _b(0.7))
            return jnp.mean((y - tgt) ** 2)

        g = jax.jit(jax.grad(loss))(_b(27.0))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestModulatedDelay:
    def test_zero_depth_is_static_fractional_delay(self):
        # depth=0, mix=1 -> pure base_ms delay; pick an integer-sample base
        t = 2048
        x = _noise(1, 1, t)
        base_samp = 64
        base_ms = base_samp / SR * 1e3
        y = jax.jit(F.modulated_delay)(x, SR, _b(1.0), _b(0.0), _b(base_ms), _b(1.0))
        # skip the boundary sample at exactly idx=0 (ms<->samples float
        # roundtrip can land it epsilon-negative, where the wet path zeros)
        np.testing.assert_allclose(
            np.asarray(y)[0, 0, base_samp + 1 :],
            np.asarray(x)[0, 0, 1 : t - base_samp],
            atol=1e-4,
        )
        # pre-delay region is zero
        assert np.abs(np.asarray(y)[0, 0, : base_samp - 1]).max() < 1e-5

    def test_concrete_params_auto_derive_mxu_bound(self):
        """Concrete depth/base (fixed-parameter chains) derive the MXU
        path's static delay bound automatically — identical to passing
        max_delay_ms explicitly; traced parameters keep the dynamic
        gather path (values agree to kink tolerance)."""
        x = _noise(2, 1, 6000, scale=0.3)
        y_auto = jax.jit(lambda x: F.modulated_delay(x, SR, 1.5, 6.0, 11.0, 0.5))(x)
        y_exp = jax.jit(lambda x: F.modulated_delay(
            x, SR, 1.5, 6.0, 11.0, 0.5, max_delay_ms=17.000001))(x)
        np.testing.assert_array_equal(np.asarray(y_auto), np.asarray(y_exp))
        args = tuple(jnp.full((2,), v) for v in (1.5, 6.0, 11.0, 0.5))
        y_tr = jax.jit(lambda x, *a: F.modulated_delay(x, SR, *a))(x, *args)
        np.testing.assert_allclose(np.asarray(y_tr), np.asarray(y_auto),
                                   atol=2e-3)

    def test_hybrid_adjoint_matches_autodiff(self):
        """The hand-written VJP of the tiled interpolation matmul
        (functional._frac_delay_tiles_hybrid, the default adjoint) must
        reproduce the checkpointed-autodiff VJP exactly — same formulas,
        same tile-local fp32 coordinates (a global-coordinate backward
        would flip floor/frac near integer read positions)."""
        x = _noise(2, 2, 6000, scale=0.3)
        st, mix = _b(3.0, 2), _b(0.8, 2)

        def g(adj):
            return jax.jit(jax.grad(
                lambda x, st, mix: jnp.mean(F.pitch_shift(
                    x, SR, st, mix, window_ms=20.0, adjoint=adj) ** 2),
                argnums=(0, 1, 2)))(x, st, mix)

        for a, b in zip(g("hybrid"), g("ad")):
            scale = max(float(jnp.abs(b).max()), 1e-9)
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale, atol=2e-6)

        args = (_b(1.7, 2), _b(6.0, 2), _b(11.0, 2), _b(0.8, 2))

        def gm(adj):
            return jax.jit(jax.grad(
                lambda x: jnp.mean(F.modulated_delay(
                    x, SR, *args, max_delay_ms=20.0, adjoint=adj) ** 2)))(x)

        np.testing.assert_allclose(np.asarray(gm("hybrid")),
                                   np.asarray(gm("ad")), atol=1e-7)

    def test_matmul_path_matches_gather_path(self):
        # the MXU per-tile interpolation-matmul path equals the gather
        # path (tolerance covers the gather path's own fp32 n-d
        # cancellation at large n; vs float64 the matmul path is the
        # MORE accurate of the two)
        x = _noise(2, 2, 10000, scale=0.3)
        args = (_b(1.7, 2), _b(6.0, 2), _b(11.0, 2), _b(0.8, 2))
        y_g = jax.jit(lambda x: F.modulated_delay(x, SR, *args))(x)
        y_m = jax.jit(
            lambda x: F.modulated_delay(x, SR, *args, max_delay_ms=20.0)
        )(x)
        np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_m), atol=2e-3)

        # Parameter gradients are ill-conditioned fp32 reductions (sums
        # of large cancelling n*cos terms over floor boundaries), so the
        # two fp32 paths are individually noisy; pin the meaningful
        # property instead: vs a float64 reference, the matmul path is
        # at least as accurate as the gather path on every parameter.
        def gl(fn, dtype):
            xx = x.astype(dtype)
            bb = lambda v: jnp.full((2,), v, dtype)
            g = jax.jit(jax.grad(
                lambda r, d, bm: jnp.sum(fn(xx, SR, r, d, bm, bb(0.8)) ** 2),
                argnums=(0, 1, 2)))
            return [np.asarray(v) for v in g(bb(1.7), bb(6.0), bb(11.0))]

        with jax.enable_x64(True):
            ref = gl(F.modulated_delay, jnp.float64)
        g_g = gl(F.modulated_delay, jnp.float32)
        g_m = gl(lambda *a, **k: F.modulated_delay(*a, **k, max_delay_ms=20.0),
                 jnp.float32)
        for r, a, m in zip(ref, g_g, g_m):
            scale = np.abs(r).max()
            err_g = np.abs(a - r).max() / scale
            err_m = np.abs(m - r).max() / scale
            assert err_m < max(1.5 * err_g, 1e-3), (err_m, err_g)
            assert err_m < 0.1, err_m

    def test_grads_flow_to_lfo_params(self):
        x = _noise(1, 1, 4096)

        def loss(rate, depth, base):
            y = F.modulated_delay(x, SR, rate, depth, base, _b(0.8))
            return jnp.mean(y**2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(_b(1.5), _b(4.0), _b(10.0))
        for gi in g:
            assert np.isfinite(np.asarray(gi)).all()
        assert float(jnp.abs(g[1]).sum()) > 0  # depth definitely matters


class TestTremolo:
    def test_envelope_matches_lfo(self):
        t = 8192
        x = jnp.ones((1, 1, t), jnp.float32)
        rate, depth = 3.0, 0.8
        y = np.asarray(jax.jit(F.tremolo)(x, SR, _b(rate), _b(depth)))[0, 0]
        n = np.arange(t)
        lfo = 0.5 * (1.0 + np.sin(2 * np.pi * rate * n / SR))
        np.testing.assert_allclose(y, 1.0 - depth * lfo, atol=1e-5)

    def test_zero_depth_identity(self):
        x = _noise(2, 2, 2048)
        y = jax.jit(F.tremolo)(x, SR, _b(5.0, 2), _b(0.0, 2))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


class TestLimiter:
    def test_matches_high_ratio_compressor(self):
        # knee=0: the limiter static curve equals the ratio->inf limit of
        # the compressor curve; with shared ballistics the outputs converge
        x = _noise(2, 1, 8192, scale=0.5)
        args = (_b(-15.0, 2), _b(5.0, 2), _b(60.0, 2), _b(0.0, 2), _b(0.0, 2))
        y_lim = jax.jit(lambda x: F.limiter(x, SR, *args, smoother="fsm"))(x)
        y_cmp = jax.jit(
            lambda x: F.compressor(
                x, SR, _b(-15.0, 2), _b(1e6, 2), _b(5.0, 2), _b(60.0, 2),
                _b(0.0, 2), _b(0.0, 2), smoother="fsm",
            )
        )(x)
        np.testing.assert_allclose(np.asarray(y_lim), np.asarray(y_cmp), atol=1e-4)

    def test_enforces_ceiling_at_steady_state(self):
        # constant 0 dB level (|x| = 1 everywhere), -12 dB threshold,
        # hard knee: the detected level is pinned exactly at the ceiling
        # once the attack has settled. (A sine would show release ripple
        # at its zero crossings — the detector is instantaneous dB, as in
        # the Giannoulis compressor this limiter shares machinery with.)
        t = 8192
        x = jnp.ones((1, 1, t), jnp.float32)
        y = np.asarray(
            jax.jit(
                lambda x: F.limiter(
                    x, SR, _b(-12.0), _b(0.5), _b(200.0), _b(0.0), _b(0.0),
                    smoother="fsm",
                )
            )(x)
        )[0, 0]
        out_db = 20 * np.log10(np.abs(y[t // 2 :]))
        assert np.abs(out_db + 12.0).max() < 0.05, out_db

    def test_lookahead_shifts_audio(self):
        x = _noise(1, 1, 2048)
        y0 = jax.jit(lambda x: F.limiter(x, SR, _b(6.0), _b(1.0), _b(50.0), _b(0.0), _b(0.0)))(x)
        y32 = jax.jit(
            lambda x: F.limiter(
                x, SR, _b(6.0), _b(1.0), _b(50.0), _b(0.0), _b(0.0),
                lookahead_samples=32,
            )
        )(x)
        # +6 dB threshold on quiet noise: gain ~ unity, so the lookahead
        # output is the input delayed by 32 samples
        np.testing.assert_allclose(
            np.asarray(y32)[0, 0, 32:], np.asarray(y0)[0, 0, :-32], atol=1e-4
        )


class TestMultibandCompressor:
    def _flat_args(self, bs=1):
        return (
            _b(200.0, bs), _b(2000.0, bs),
            _b(-200.0, bs), _b(1.0, bs), _b(5.0, bs), _b(100.0, bs), _b(0.0, bs),
            _b(-200.0, bs), _b(1.0, bs), _b(5.0, bs), _b(100.0, bs), _b(0.0, bs),
            _b(-200.0, bs), _b(1.0, bs), _b(5.0, bs), _b(100.0, bs), _b(0.0, bs),
            _b(0.01, bs),
        )

    def test_crossover_tree_sums_flat(self):
        # ratio=1 everywhere: the LR4 tree must reconstruct the input
        # magnitude (phase rotates — LR4 legs sum to allpass)
        t = 16384
        x = np.zeros((1, 1, t), np.float32)
        x[0, 0, 100] = 1.0
        y = np.asarray(
            jax.jit(F.multiband_compressor)(jnp.asarray(x), SR, *self._flat_args())
        )[0, 0]
        H = np.abs(np.fft.rfft(y))
        f = np.fft.rfftfreq(t, 1 / SR)
        sel = (f > 20) & (f < 20000)
        dev_db = np.abs(20 * np.log10(np.maximum(H[sel], 1e-12)))
        assert dev_db.max() < 0.1, dev_db.max()

    def test_band_selective_compression(self):
        # compress ONLY the low band; a 100 Hz tone is attenuated, a
        # 5 kHz tone passes through at unity
        t = int(SR // 2)
        n = np.arange(t)
        lo = np.sin(2 * np.pi * 100.0 * n / SR).astype(np.float32)
        hi = np.sin(2 * np.pi * 5000.0 * n / SR).astype(np.float32)
        x = jnp.asarray(np.stack([lo, hi])[:, None])  # (2, 1, t)
        args = (
            _b(500.0, 2), _b(2000.0, 2),
            _b(-30.0, 2), _b(10.0, 2), _b(1.0, 2), _b(100.0, 2), _b(0.0, 2),
            _b(0.0, 2), _b(1.0, 2), _b(5.0, 2), _b(100.0, 2), _b(0.0, 2),
            _b(0.0, 2), _b(1.0, 2), _b(5.0, 2), _b(100.0, 2), _b(0.0, 2),
            _b(0.01, 2),
        )
        y = np.asarray(jax.jit(F.multiband_compressor)(x, SR, *args))
        tail = slice(t // 2, None)
        lo_out = np.abs(y[0, 0, tail]).max()
        hi_out = np.abs(y[1, 0, tail]).max()
        assert lo_out < 0.35, lo_out  # ~ -30 + 3/10*... well below unity
        assert 0.9 < hi_out < 1.1, hi_out

    def test_crossover_ordering_guard(self):
        # high crossover below low crossover: softly floored, stays finite
        x = _noise(1, 1, 4096)
        args = list(self._flat_args())
        args[0], args[1] = _b(2000.0), _b(100.0)
        y = jax.jit(F.multiband_compressor)(x, SR, *args)
        assert np.isfinite(np.asarray(y)).all()

    def test_fsm_split_fused_matches_staged(self):
        # the fsm filter_method composes the whole LR4 tree in ONE FFT
        # round-trip; it must equal running the two crossover stages as
        # separate sosfilt_via_fsm calls (up to the stage-1 crop's
        # re-aliased tail, which is tiny for decaying LR4 IRs)
        bs, chs, t = 2, 2, 8192
        x = _noise(bs, chs, t)
        f_lo, f_hi = _b(250.0, bs), _b(2500.0, bs)
        fused = jax.jit(
            lambda x: F._lr4_three_band_split(x, f_lo, f_hi, SR, "fsm"))(x)

        sos_lp_lo, sos_hp_lo = F.lr4_crossover_sos(f_lo, SR, bs, x.dtype)
        sos_lp_hi, sos_hp_hi = F.lr4_crossover_sos(f_hi, SR, bs, x.dtype)
        low_pre, rest = F._apply_sos_batched(
            [sos_lp_lo, sos_hp_lo], [x, x], "fsm")
        mid, high, lo_lp, lo_hp = F._apply_sos_batched(
            [sos_lp_hi, sos_hp_hi, sos_lp_hi, sos_hp_hi],
            [rest, rest, low_pre, low_pre], "fsm")
        staged = (lo_lp + lo_hp, mid, high)
        for a, b in zip(fused, staged):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5)
        # and gradients flow to both crossover frequencies
        g = jax.grad(lambda f: jnp.sum(
            F._lr4_three_band_split(x, f, f_hi, SR, "fsm")[0] ** 2))(f_lo)
        assert np.isfinite(np.asarray(g)).all() and np.any(np.asarray(g) != 0)


class TestProcessorWrappers:
    @pytest.mark.parametrize(
        "cls,chs",
        [
            (D.Delay, 1),
            (D.Chorus, 2),
            (D.Flanger, 1),
            (D.Tremolo, 2),
            (D.Limiter, 2),
            (D.MultibandCompressor, 1),
            (D.NoiseGate, 2),
            (D.Phaser, 2),
            (D.AutoWah, 1),
            (D.DeEsser, 2),
            (D.Bitcrusher, 1),
        ],
    )
    def test_fuzz_normalized(self, cls, chs):
        proc = cls(int(SR))
        x = _noise(4, chs, 8192, scale=0.25)

        @jax.jit
        def loss(x, p):
            return jnp.mean(proc.process_normalized(x, p, clip_params=True) ** 2)

        grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
        for _ in range(2):
            p = jnp.asarray(
                RNG.uniform(0, 1, (4, proc.num_params)).astype(np.float32)
            )
            assert bool(jnp.isfinite(loss(x, p)))
            gx, gp = grad(x, p)
            assert bool(jnp.isfinite(gx).all()), cls.__name__
            assert bool(jnp.isfinite(gp).all()), cls.__name__
            assert float(jnp.abs(gp).sum()) > 0, cls.__name__

    def test_chain_with_new_effects(self):
        chain = D.Chain(
            [D.ParametricEQ(int(SR)), D.Delay(int(SR)), D.Limiter(int(SR))]
        )
        x = _noise(2, 1, 8192)
        p = jnp.asarray(
            RNG.uniform(0, 1, (2, chain.num_params)).astype(np.float32)
        )
        y = jax.jit(
            lambda x, p: chain.process_normalized(x, p, clip_params=True)
        )(x, p)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()


class TestSidechainCompressor:
    def _params(self, bs=2):
        return dict(
            threshold_db=_b(-30.0, bs), ratio=_b(8.0, bs),
            attack_ms=_b(5.0, bs), release_ms=_b(60.0, bs),
            knee_db=_b(3.0, bs), makeup_gain_db=_b(0.0, bs),
        )

    def test_matches_compressor_when_keyed_by_input(self):
        # with sidechain == program it IS the compressor
        x = _noise(2, 2, 8192, scale=0.5)
        kw = self._params()
        y_sc = jax.jit(lambda x: F.sidechain_compressor(
            x, SR, **kw, smoother="parallel", sidechain=x))(x)
        y_c = jax.jit(lambda x: F.compressor(
            x, SR, **kw, smoother="parallel"))(x)
        np.testing.assert_allclose(np.asarray(y_sc), np.asarray(y_c), atol=1e-6)

    def test_ducks_program_under_loud_key(self):
        # quiet program + loud key in the second half: the program is
        # attenuated exactly where the key is loud (classic ducking)
        t = 44100
        x = _noise(1, 1, t, scale=0.05)
        key = np.zeros((1, 1, t), np.float32)
        key[..., t // 2:] = 0.8
        kw = self._params(1)
        y = np.asarray(jax.jit(lambda x, k: F.sidechain_compressor(
            x, SR, **kw, sidechain=k))(x, jnp.asarray(key)))
        ratio_first = np.abs(y[..., : t // 2 - 2048]).mean() / np.abs(
            np.asarray(x)[..., : t // 2 - 2048]).mean()
        ratio_second = np.abs(y[..., t // 2 + 4096:]).mean() / np.abs(
            np.asarray(x)[..., t // 2 + 4096:]).mean()
        assert ratio_first > 0.95, ratio_first  # key silent: transparent
        assert ratio_second < 0.5, ratio_second  # key loud: ducked hard

    def test_grads_flow_to_program_key_and_params(self):
        x = _noise(1, 1, 4096, scale=0.3)
        k = _noise(1, 2, 4096, scale=0.6)  # stereo key vs mono program

        def loss(x, k, th):
            kw = {**self._params(1), "threshold_db": th}
            return jnp.mean(F.sidechain_compressor(x, SR, **kw, sidechain=k) ** 2)

        gx, gk, gth = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, k, _b(-30.0))
        for g, name in ((gx, "x"), (gk, "key"), (gth, "threshold")):
            assert bool(jnp.isfinite(g).all()), name
            assert float(jnp.abs(g).sum()) > 0, name

    def test_requires_sidechain_and_checks_shape(self):
        x = _noise(1, 1, 1024)
        with pytest.raises(ValueError, match="sidechain"):
            F.sidechain_compressor(x, SR, **self._params(1))
        with pytest.raises(ValueError, match="batch/length"):
            F.sidechain_compressor(
                x, SR, **self._params(1), sidechain=_noise(1, 1, 512))

    def test_module_forwards_sidechain(self):
        proc = D.SidechainCompressor(int(SR))
        x = _noise(2, 1, 4096, scale=0.05)
        k = _noise(2, 1, 4096, scale=0.8)
        p = jnp.full((2, proc.num_params), 0.5)
        y = jax.jit(lambda x, k, p: proc.process_normalized(
            x, p, clip_params=True, sidechain=k))(x, k, p)
        assert y.shape == x.shape and bool(jnp.isfinite(y).all())
        # loud key must reduce the program level
        assert float(jnp.abs(y).mean()) < float(jnp.abs(x).mean())


class TestHoldMax:
    """The van Herk moving-max decomposition vs the windowed definition."""

    @pytest.mark.parametrize("t,hold", [(50, 7), (64, 8), (37, 36),
                                        (37, 40), (128, 1), (9, 3)])
    def test_matches_windowed_definition(self, t, hold):
        g = _noise(2, 1, t, scale=1.0)
        out = np.asarray(jax.jit(
            lambda g: F._hold_max(g, hold))(g))
        gn = np.asarray(g)
        for i in range(t):
            want = gn[..., max(0, i - hold): i + 1].max(axis=-1)
            np.testing.assert_allclose(out[..., i], want, rtol=0, atol=0)

    def test_grad_sum_preserved(self):
        # max routes the subgradient to the argmax; with unique values
        # each window contributes its cotangent to exactly one input, so
        # the total mass of d(sum(out))/dg is the number of windows
        g = _noise(1, 1, 200, scale=1.0)
        gr = jax.jit(jax.grad(lambda g: jnp.sum(F._hold_max(g, 11))))(g)
        assert float(jnp.sum(gr)) == pytest.approx(200.0)
        assert bool(jnp.isfinite(gr).all())


class TestNoiseGate:
    def _params(self, bs=1, **over):
        kw = dict(
            threshold_db=_b(-30.0, bs), ratio=_b(10.0, bs),
            range_db=_b(60.0, bs), attack_ms=_b(0.5, bs),
            release_ms=_b(20.0, bs), knee_db=_b(1.0, bs),
        )
        kw.update(over)
        return kw

    def test_gates_quiet_passes_loud(self):
        # alternating loud / quiet (-60 dB) tone bursts
        t = 32768
        n = np.arange(t, dtype=np.float32)
        tone = np.sin(2 * np.pi * 1000.0 * n / SR).astype(np.float32)
        env = np.where((n // 8192) % 2 == 0, 0.5, 0.0005).astype(np.float32)
        x = jnp.asarray((tone * env)[None, None])
        y = np.asarray(jax.jit(lambda x: F.noise_gate(
            x, SR, **self._params()))(x))[0, 0]
        # steady-state loud region: transparent
        loud = slice(4096, 8192)
        np.testing.assert_allclose(y[loud], np.asarray(x)[0, 0][loud], atol=5e-3)
        # steady-state quiet region: attenuated by ~range (>= 40 dB down)
        quiet = np.abs(y[12288:16384]).max()
        assert quiet < 0.0005 * 10 ** (-40 / 20) * 10, quiet

    def test_range_limits_attenuation(self):
        # with a 12 dB range, quiet material drops ~12 dB, not to silence
        x = _noise(1, 1, 16384, scale=0.001)
        y = np.asarray(jax.jit(lambda x: F.noise_gate(
            x, SR, **self._params(range_db=_b(12.0)),
            smoother="exact"))(x))
        att_db = 20 * np.log10(
            np.abs(y[..., 8192:]).mean() / np.abs(np.asarray(x)[..., 8192:]).mean()
        )
        assert -14.0 < att_db < -9.0, att_db

    def test_hold_keeps_gate_open_across_gap(self):
        # loud burst, short gap, loud burst: with hold >= gap the gate
        # never closes in the gap; without hold it does
        t = 24576
        x = np.zeros((1, 1, t), np.float32)
        x[..., :8192] = 0.5
        x[..., 8192 + 2048: 16384] = 0.5
        x = jnp.asarray(x * np.sign(RNG.standard_normal((1, 1, t))).astype(np.float32))
        def run(hold_ms):
            return np.asarray(jax.jit(lambda x: F.noise_gate(
                x, SR, **self._params(release_ms=_b(2.0)), hold_ms=hold_ms))(x))

        y_hold = run(100.0)  # 100 ms hold >> 2048-sample (46 ms) gap
        y_none = run(0.0)
        # the signal in the gap is 0 either way, so compare the next
        # burst's first samples: with hold the gate is still open ->
        # instant full level; without hold it must re-attack from closed
        reopen = slice(8192 + 2048, 8192 + 2048 + 8)
        lvl_hold = np.abs(y_hold[0, 0][reopen]).mean()
        lvl_none = np.abs(y_none[0, 0][reopen]).mean()
        assert lvl_hold > lvl_none * 1.5, (lvl_hold, lvl_none)

    def test_grads_finite_and_nonzero(self):
        # quiet enough that every 5 ms hold window's max gain sits BELOW
        # threshold: the hold max routes the subgradient to its argmax,
        # and above threshold+knee/2 the gain curve is flat (dg/dth = 0),
        # so louder noise makes the threshold gradient seed-dependent zero
        x = _noise(2, 2, 8192, scale=0.005)

        def loss(x, th, rng):
            kw = self._params(2, threshold_db=th, range_db=rng)
            return jnp.mean(F.noise_gate(x, SR, **kw, hold_ms=5.0) ** 2)

        gx, gth, grng = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
            x, _b(-30.0, 2), _b(40.0, 2))
        for g, name in ((gx, "x"), (gth, "threshold"), (grng, "range")):
            assert bool(jnp.isfinite(g).all()), name
        assert float(jnp.abs(gth).sum()) > 0

    def test_module_and_smoother_guard(self):
        proc = D.NoiseGate(int(SR), hold_ms=10.0)
        x = _noise(2, 1, 8192, scale=0.1)
        p = jnp.asarray(RNG.uniform(0.2, 0.8, (2, proc.num_params)).astype(np.float32))
        y = jax.jit(lambda x, p: proc.process_normalized(x, p))(x, p)
        assert y.shape == x.shape and bool(jnp.isfinite(y).all())
        with pytest.raises(ValueError, match="smoother"):
            F.noise_gate(x, SR, **self._params(2), smoother="fsm")


class TestTvFilter:
    """Direct tests of the WOLA time-varying filter op (ops.tv_filter)."""

    def test_identity_and_static_fir(self):
        from dasp_tpu.ops.tv_filter import tv_frame_count, tv_freq_filter

        bs, chs, t, L, hop, nfft = 2, 2, 5000, 512, 128, 2048
        n = tv_frame_count(t, L, hop)
        x = _noise(bs, chs, t, scale=1.0)
        H1 = jnp.ones((bs, n, nfft // 2 + 1), jnp.complex64)
        y = jax.jit(lambda x, H: tv_freq_filter(x, H, L, hop))(x, H1)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-6)

        h = RNG.standard_normal(64).astype(np.float32) * 0.1
        H = jnp.broadcast_to(
            jnp.asarray(np.fft.rfft(h, nfft).astype(np.complex64)),
            (bs, n, nfft // 2 + 1),
        )
        y2 = jax.jit(lambda x, H: tv_freq_filter(x, H, L, hop))(x, H)
        ref = np.stack([
            [np.convolve(np.asarray(x)[b, c], h)[:t] for c in range(chs)]
            for b in range(bs)
        ])
        np.testing.assert_allclose(np.asarray(y2), ref, atol=2e-5)

    def test_shape_guards(self):
        from dasp_tpu.ops.tv_filter import tv_freq_filter

        x = _noise(1, 1, 1000)
        with pytest.raises(ValueError, match="H has shape"):
            tv_freq_filter(x, jnp.ones((1, 3, 1025), jnp.complex64), 512, 128)

    def test_dft_matmul_path_matches_fft(self):
        # the TPU spectral path (ops.dft matmuls, auto for n_fft <= 2048)
        # must match the rfft path: spectra, roundtrip, and gradients —
        # exercised via the explicit flag since CI runs on CPU
        from dasp_tpu.ops.tv_filter import tv_istft, tv_stft

        bs, chs, t, L, hop, nfft = 2, 1, 4000, 512, 128, 1024
        x = _noise(bs, chs, t, scale=0.5)
        X1 = jax.jit(lambda x: tv_stft(x, L, hop, nfft, use_dft=False))(x)
        X2 = jax.jit(lambda x: tv_stft(x, L, hop, nfft, use_dft=True))(x)
        np.testing.assert_allclose(np.asarray(X1.real), np.asarray(X2.real), atol=1e-4)
        np.testing.assert_allclose(np.asarray(X1.imag), np.asarray(X2.imag), atol=1e-4)
        y1 = jax.jit(lambda X: tv_istft(X, t, L, hop, use_dft=False))(X1)
        y2 = jax.jit(lambda X: tv_istft(X, t, L, hop, use_dft=True))(X1)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(x), atol=1e-4)

        def loss(x, flag):
            X = tv_stft(x, L, hop, nfft, use_dft=flag)
            return jnp.sum(jnp.abs(X) ** 2)

        g1 = jax.jit(jax.grad(lambda x: loss(x, False)))(x)
        g2 = jax.jit(jax.grad(lambda x: loss(x, True)))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)


class TestPhaser:
    def _p(self, bs=1, **over):
        kw = dict(rate_hz=_b(0.5, bs), depth=_b(0.7, bs),
                  centre_frequency_hz=_b(800.0, bs), feedback=_b(0.3, bs),
                  mix=_b(0.5, bs))
        kw.update(over)
        return kw

    def test_static_notches_match_closed_form(self):
        # rate=0, depth=0 -> a time-invariant allpass cascade; the
        # impulse response's spectrum must match _phaser_response
        t, L, hop = 16384, 512, 128
        x = np.zeros((1, 1, t), np.float32)
        x[0, 0, t // 2] = 1.0
        kw = self._p(rate_hz=_b(0.0), depth=_b(0.0))
        y = np.asarray(jax.jit(lambda x: F.phaser(jnp.asarray(x), SR, **kw))(x))[0, 0]
        Hm = np.abs(np.fft.rfft(y, t))
        c = np.tan(np.pi * 800.0 / SR)
        cc = (c - 1) / (c + 1)
        w = 2 * np.pi * np.fft.rfftfreq(t)
        e = np.exp(-1j * w)
        ap = ((cc + e) / (1 + cc * e)) ** 6
        Href = np.abs(0.5 + 0.5 * ap / (1 - 0.3 * e * ap))
        np.testing.assert_allclose(Hm, Href, atol=5e-3)

    def test_mix_zero_identity_and_unity_gain(self):
        x = _noise(2, 2, 8192, scale=0.4)
        y0 = jax.jit(lambda x: F.phaser(x, SR, **self._p(2, mix=_b(0.0, 2))))(x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(x), atol=1e-5)
        # full-wet zero-feedback phaser is allpass: energy preserved
        y1 = jax.jit(lambda x: F.phaser(
            x, SR, **self._p(2, mix=_b(1.0, 2), feedback=_b(0.0, 2))))(x)
        e_in = float(jnp.sum(x**2))
        e_out = float(jnp.sum(y1**2))
        assert abs(e_out / e_in - 1.0) < 0.02, e_out / e_in

    def test_sweep_moves_notches(self):
        # with a nonzero rate the short-time spectra at two LFO phases
        # must differ (the notches move)
        t = 32768
        x = jnp.asarray(RNG.standard_normal((1, 1, t)).astype(np.float32))
        y = np.asarray(jax.jit(lambda x: F.phaser(
            x, SR, **self._p(rate_hz=_b(2.0), depth=_b(1.0))))(x))[0, 0]
        a = np.abs(np.fft.rfft(y[:8192]))
        bspec = np.abs(np.fft.rfft(y[8192:16384]))
        rel = np.abs(a - bspec).sum() / a.sum()
        assert rel > 0.1, rel

    def test_grads_flow(self):
        x = _noise(1, 1, 8192, scale=0.3)

        def loss(r, d, c, fb, m):
            return jnp.mean(F.phaser(x, SR, r, d, c, fb, m) ** 2)

        gs = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(
            _b(1.0), _b(0.5), _b(800.0), _b(0.4), _b(0.5))
        for g in gs:
            assert bool(jnp.isfinite(g).all())
        assert any(float(jnp.abs(g).sum()) > 0 for g in gs)


class TestAutoWah:
    def _p(self, bs=1, **over):
        kw = dict(sensitivity=_b(5.0, bs), attack_ms=_b(5.0, bs),
                  release_ms=_b(50.0, bs), min_frequency_hz=_b(200.0, bs),
                  max_frequency_hz=_b(2000.0, bs), q_factor=_b(4.0, bs),
                  mix=_b(1.0, bs))
        kw.update(over)
        return kw

    def test_centroid_follows_level(self):
        # white noise with a quiet and a loud half: the wet signal's
        # spectral centroid must be higher in the loud half (filter
        # swept up by the envelope)
        t = 65536
        env = np.concatenate([
            np.full(t // 2, 0.02, np.float32), np.full(t // 2, 0.8, np.float32)])
        x = jnp.asarray((RNG.standard_normal((1, 1, t)) * env).astype(np.float32))
        y = np.asarray(jax.jit(lambda x: F.auto_wah(x, SR, **self._p()))(x))[0, 0]

        def centroid(seg):
            m = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
            f = np.fft.rfftfreq(len(seg), 1 / SR)
            return float((f * m).sum() / m.sum())

        c_quiet = centroid(y[8192: t // 2 - 8192])
        c_loud = centroid(y[t // 2 + 8192:])
        assert c_loud > 1.3 * c_quiet, (c_quiet, c_loud)

    def test_mix_zero_identity(self):
        x = _noise(2, 2, 8192, scale=0.3)
        y = jax.jit(lambda x: F.auto_wah(x, SR, **self._p(2, mix=_b(0.0, 2))))(x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def test_grads_flow(self):
        x = _noise(2, 1, 8192, scale=0.2)

        def loss(s, q, m):
            kw = self._p(2, sensitivity=s, q_factor=q, mix=m)
            return jnp.mean(F.auto_wah(x, SR, **kw) ** 2)

        gs = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
            _b(5.0, 2), _b(4.0, 2), _b(0.8, 2))
        for g in gs:
            assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(gs[2]).sum()) > 0  # mix always has signal


class TestDeEsser:
    def _p(self, bs=1, **over):
        kw = dict(frequency_hz=_b(5000.0, bs), threshold_db=_b(-40.0, bs),
                  ratio=_b(8.0, bs), attack_ms=_b(1.0, bs),
                  release_ms=_b(50.0, bs), knee_db=_b(3.0, bs))
        kw.update(over)
        return kw

    def _sib(self, t=32768):
        # 300 Hz "voice" + loud 8 kHz "sibilance" in the second half
        n = np.arange(t, dtype=np.float32)
        low = 0.3 * np.sin(2 * np.pi * 300.0 * n / SR)
        hi = 0.4 * np.sin(2 * np.pi * 8000.0 * n / SR) * (n > t // 2)
        return jnp.asarray((low + hi)[None, None].astype(np.float32))

    def test_attenuates_sibilance_keeps_lows(self):
        x = self._sib()
        y = np.asarray(jax.jit(lambda x: F.de_esser(x, SR, **self._p()))(x))[0, 0]
        t = x.shape[-1]
        Y2 = np.abs(np.fft.rfft(y[3 * t // 4:]))
        X2 = np.abs(np.fft.rfft(np.asarray(x)[0, 0, 3 * t // 4:]))
        f = np.fft.rfftfreq(t // 4, 1 / SR)
        bl = (f > 200) & (f < 400)
        bh = (f > 7500) & (f < 8500)
        att_low = Y2[bl].max() / X2[bl].max()
        att_hi = Y2[bh].max() / X2[bh].max()
        assert att_low > 0.9, att_low        # voice band untouched
        assert att_hi < 0.5, att_hi          # sibilance compressed hard

    def test_split_magnitude_transparent_below_threshold(self):
        # quiet signal, nothing above threshold: the split sums to the
        # LR4 allpass — flat MAGNITUDE response (phase rotates, so a
        # sample-wise comparison would be wrong by construction)
        x = _noise(2, 2, 16384, scale=0.001)
        y = jax.jit(lambda x: F.de_esser(
            x, SR, **self._p(2, threshold_db=_b(0.0, 2))))(x)
        X = np.abs(np.fft.rfft(np.asarray(x), axis=-1))[..., :-1]
        Y = np.abs(np.fft.rfft(np.asarray(y), axis=-1))[..., :-1]
        # compare band energies (coarse bins absorb fp noise at tiny X)
        Xb = X.reshape(*X.shape[:-1], 64, -1).sum(-1)
        Yb = Y.reshape(*Y.shape[:-1], 64, -1).sum(-1)
        np.testing.assert_allclose(Yb, Xb, rtol=0.02)
        # and wideband mode IS exactly transparent below threshold
        y_wb = jax.jit(lambda x: F.de_esser(
            x, SR, **self._p(2, threshold_db=_b(0.0, 2)), mode="wideband"))(x)
        np.testing.assert_allclose(np.asarray(y_wb), np.asarray(x), atol=2e-6)

    def test_wideband_mode_and_guard(self):
        x = self._sib(16384)
        y = jax.jit(lambda x: F.de_esser(x, SR, **self._p(), mode="wideband"))(x)
        assert bool(jnp.isfinite(y).all())
        with pytest.raises(ValueError, match="mode"):
            F.de_esser(x, SR, **self._p(), mode="bogus")

    def test_grads_flow(self):
        x = self._sib(16384)

        def loss(fr, th):
            return jnp.mean(F.de_esser(x, SR, **self._p(
                frequency_hz=fr, threshold_db=th)) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))(_b(5000.0), _b(-40.0))
        for gi in g:
            assert bool(jnp.isfinite(gi).all())
            assert float(jnp.abs(gi).sum()) > 0


class TestBitcrusher:
    def test_quantization_levels(self):
        # 3 bits -> at most 2^3 + 1 distinct output levels on a ramp
        t = 8192
        x = jnp.asarray(np.linspace(-1, 1, t, dtype=np.float32))[None, None]
        y = np.asarray(jax.jit(lambda x: F.bitcrusher(
            x, SR, _b(3.0), _b(SR), _b(1.0)))(x))[0, 0]
        lv = np.unique(np.round(y * 4).astype(np.int32))
        assert len(lv) <= 9, lv

    def test_zero_order_hold_length(self):
        # sample_rate/4 hold clock -> values repeat in runs of 4
        x = _noise(1, 1, 4096, scale=0.5)
        y = np.asarray(jax.jit(lambda x: F.bitcrusher(
            x, SR, _b(16.0), _b(SR / 4), _b(1.0)))(x))[0, 0]
        runs = y.reshape(-1, 4)
        assert np.allclose(runs, runs[:, :1], atol=1e-6)

    def test_mix_zero_identity(self):
        x = _noise(2, 2, 2048)
        y = jax.jit(lambda x: F.bitcrusher(x, SR, _b(2.0, 2), _b(2000.0, 2), _b(0.0, 2)))(x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_grads_flow_via_surrogate(self):
        x = _noise(2, 1, 4096, scale=0.5)

        def loss(b, m):
            return jnp.mean(F.bitcrusher(x, SR, b, _b(SR, 2), m) ** 2)

        gb, gm = jax.jit(jax.grad(loss, argnums=(0, 1)))(_b(4.0, 2), _b(0.8, 2))
        assert bool(jnp.isfinite(gb).all()) and bool(jnp.isfinite(gm).all())
        assert float(jnp.abs(gb).sum()) > 0  # surrogate passes bit-depth grads
        assert float(jnp.abs(gm).sum()) > 0


class TestPitchShift:
    def test_zero_shift_is_identity(self):
        t = 8192
        x = _noise(2, 2, t)
        W = F.pitch_shift_window_samples(60.0, SR)
        y = jax.jit(lambda x, st, m: F.pitch_shift(x, SR, st, m))(
            x, _b(0.0, 2), _b(1.0, 2)
        )
        # the tail (W/2 latency compensation) shifts in zeros; the rest
        # must be bit-exact-ish (tap 2 sits at an integer W/2 delay)
        keep = t - W // 2
        np.testing.assert_allclose(
            np.asarray(y)[..., :keep], np.asarray(x)[..., :keep], atol=2e-5
        )

    def test_mix_zero_is_identity(self):
        x = _noise(1, 2, 4096)
        y = jax.jit(lambda x, st, m: F.pitch_shift(x, SR, st, m))(
            x, _b(7.0), _b(0.0)
        )
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-5)

    @pytest.mark.parametrize("st", [7.0, -5.0])
    def test_sine_moves_by_the_equal_tempered_ratio(self, st):
        t = 32768
        f0 = 440.0
        n = np.arange(t) / SR
        x = jnp.asarray(
            np.sin(2 * np.pi * f0 * n).astype(np.float32)[None, None, :]
        )
        y = np.asarray(
            jax.jit(lambda x, s, m: F.pitch_shift(x, SR, s, m))(x, _b(st), _b(1.0))
        )[0, 0]
        seg = y[8192 : 8192 + 16384] * np.hanning(16384)
        spec = np.abs(np.fft.rfft(seg))
        f_peak = spec.argmax() * SR / 16384
        assert abs(f_peak - f0 * 2.0 ** (st / 12.0)) < 8.0, f_peak

    def test_matmul_matches_gather(self):
        x = _noise(2, 1, 4096)
        args = (SR, _b(3.0, 2), _b(0.8, 2))
        ym = jax.jit(lambda x: F.pitch_shift(x, *args, window_ms=20.0))(x)
        yg = jax.jit(
            lambda x: F.pitch_shift(x, *args, window_ms=20.0, matmul=False)
        )(x)
        np.testing.assert_allclose(np.asarray(ym), np.asarray(yg), atol=2e-4)

    def test_grad_flows_to_semitones(self):
        # own seed: the loss landscape on white noise is flat-with-wiggles
        # away from the minimum, so the signal must not depend on suite
        # order (the shared-RNG draw) — and the robust property is the
        # SHARP minimum at the true shift, not monotonicity of the plateau
        x = jnp.asarray(
            np.random.default_rng(11).standard_normal((1, 1, 4096)).astype(np.float32)
            * 0.1
        )
        tgt = jax.jit(lambda x: F.pitch_shift(x, SR, _b(4.0), _b(1.0), window_ms=20.0))(x)

        def loss(st):
            return jnp.mean((F.pitch_shift(x, SR, st, _b(1.0), window_ms=20.0) - tgt) ** 2)

        g = jax.jit(jax.grad(loss))(_b(2.0))
        assert np.isfinite(np.asarray(g)).all() and abs(float(g[0])) > 1e-9
        l2, l35, l4 = (float(jax.jit(loss)(_b(v))) for v in (2.0, 3.5, 4.0))
        assert l4 < 0.01 * min(l2, l35), (l2, l35, l4)

    def test_traced_sample_rate_raises_clearly(self):
        x = _noise(1, 1, 256)
        with pytest.raises(TypeError, match="static.*sample_rate"):
            jax.jit(F.pitch_shift)(x, SR, _b(0.0), _b(1.0))

    def test_module_dispatch(self):
        proc = D.PitchShift(int(SR), window_ms=20.0)
        x = _noise(2, 2, 4096)
        p = jnp.asarray(np.array([[0.5, 1.0], [0.8, 0.5]], np.float32))
        y = proc.process_normalized(x, p)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


def _drum_like(t=32768, hits=(2000, 12000, 22000), decay_ms=120.0):
    """Percussive test signal: tone bursts with exponential decay."""
    n = np.arange(t, dtype=np.float32)
    x = np.zeros(t, np.float32)
    for h in hits:
        env = np.exp(-np.maximum(n - h, 0.0) / (decay_ms / 1e3 * SR))
        x += np.where(n >= h, env * np.sin(2 * np.pi * 180.0 * (n - h) / SR), 0.0).astype(
            np.float32
        )
    return jnp.asarray(x[None, None, :] * 0.5)


class TestTransientShaper:
    ONSET = slice(12000, 12000 + 441)        # 10 ms after the 2nd hit
    TAIL = slice(12000 + 4410, 12000 + 8820)  # 100-200 ms after it (before hit 3)

    def _run(self, x, attack, sustain, **kw):
        bs = x.shape[0]
        return np.asarray(
            jax.jit(
                lambda x, a, s: F.transient_shaper(x, SR, a, s, **kw)
            )(x, _b(attack, bs), _b(sustain, bs))
        )

    @staticmethod
    def _rms_db(y, seg):
        return 20.0 * np.log10(float(np.sqrt(np.mean(y[0, 0, seg] ** 2))))

    def test_attack_control_scales_onsets(self):
        x = _drum_like()
        y0 = self._run(x, 0.0, 0.0)
        yp = self._run(x, 1.0, 0.0)
        ym = self._run(x, -1.0, 0.0)
        up = self._rms_db(yp, self.ONSET) - self._rms_db(y0, self.ONSET)
        dn = self._rms_db(y0, self.ONSET) - self._rms_db(ym, self.ONSET)
        assert up > 6.0 and dn > 6.0, (up, dn)
        # the attack control moves tails far less than onsets
        tail_shift = abs(self._rms_db(yp, self.TAIL) - self._rms_db(y0, self.TAIL))
        assert tail_shift < up / 3.0, (tail_shift, up)

    def test_sustain_control_scales_tails(self):
        x = _drum_like()
        y0 = self._run(x, 0.0, 0.0)
        yp = self._run(x, 0.0, 1.0)
        ym = self._run(x, 0.0, -1.0)
        up = self._rms_db(yp, self.TAIL) - self._rms_db(y0, self.TAIL)
        dn = self._rms_db(y0, self.TAIL) - self._rms_db(ym, self.TAIL)
        assert up > 4.0 and dn > 4.0, (up, dn)
        # ...while barely touching onsets
        onset_shift = abs(self._rms_db(yp, self.ONSET) - self._rms_db(y0, self.ONSET))
        assert onset_shift < up / 3.0, (onset_shift, up)

    def test_neutral_settings_pass_through(self):
        x = _noise(2, 2, 8192)
        y = self._run(x, 0.0, 0.0)
        np.testing.assert_allclose(y, np.asarray(x), atol=1e-6)

    def test_level_independence(self):
        # threshold-free: shaping a 20 dB quieter copy gives the same
        # RELATIVE onset boost (a compressor would not)
        x = _drum_like()
        ratio = lambda x: (
            float(np.sqrt(np.mean(self._run(x, 1.0, 0.0)[0, 0, self.ONSET] ** 2)))
            / float(np.sqrt(np.mean(self._run(x, 0.0, 0.0)[0, 0, self.ONSET] ** 2)))
        )
        np.testing.assert_allclose(ratio(x), ratio(x * 0.1), rtol=0.05)

    def test_steady_state_is_output_gain_only(self):
        t = 32768
        n = np.arange(t) / SR
        x = jnp.asarray(
            (0.3 * np.sin(2 * np.pi * 220.0 * n)).astype(np.float32)[None, None, :]
        )
        y = np.asarray(
            jax.jit(
                lambda x: F.transient_shaper(x, SR, _b(1.0), _b(1.0), _b(6.0))
            )(x)
        )
        seg = slice(t // 2, t)  # after the initial onset settles
        g = np.sqrt(np.mean(y[0, 0, seg] ** 2) / np.mean(np.asarray(x)[0, 0, seg] ** 2))
        np.testing.assert_allclose(20 * np.log10(g), 6.0, atol=1.0)

    def test_grads_flow(self):
        x = _drum_like(8192, hits=(1000, 5000))
        tgt = jax.jit(lambda x: F.transient_shaper(x, SR, _b(0.5), _b(-0.5)))(x)

        def loss(p):
            a, s, g = p
            return jnp.mean(
                (F.transient_shaper(x, SR, a[None], s[None], g[None]) - tgt) ** 2
            )

        gr = jax.jit(jax.grad(loss))(jnp.zeros((3,), jnp.float32))
        assert np.isfinite(np.asarray(gr)).all()
        assert all(abs(float(g)) > 1e-9 for g in gr[:2])

    def test_parallel_smoother_tracks_exact(self):
        x = _drum_like(8192, hits=(1000, 5000))
        yp = self._run(x, 0.8, -0.6, smoother="parallel")
        ye = self._run(x, 0.8, -0.6, smoother="exact")
        assert np.isfinite(yp).all() and np.isfinite(ye).all()
        # the parallel two-pass ballistics approximates the branching
        # recursion; worst-case pointwise deviation is at onsets where
        # the branch decision flips a sample or two earlier/later
        assert float(np.abs(yp - ye).max()) < 0.15 * float(np.abs(ye).max())
        rms = lambda v: float(np.sqrt(np.mean(v**2)))
        assert rms(yp - ye) < 0.06 * rms(ye)

    def test_module_dispatch(self):
        proc = D.TransientShaper(int(SR))
        x = _noise(2, 2, 4096)
        p = jnp.asarray(np.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5]], np.float32))
        y = proc.process_normalized(x, p)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


class TestExciter:
    def test_amount_zero_is_identity(self):
        x = _noise(2, 2, 4096)
        y = jax.jit(lambda x: F.exciter(x, SR, _b(3000.0, 2), _b(12.0, 2), _b(0.0, 2)))(x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_low_content_passes_untouched(self):
        # a 100 Hz tone sits ~60 dB below a 3 kHz 2nd-order corner
        t = 16384
        n = np.arange(t) / SR
        x = jnp.asarray((0.3 * np.sin(2 * np.pi * 100.0 * n)).astype(np.float32)[None, None, :])
        y = jax.jit(lambda x: F.exciter(x, SR, _b(3000.0), _b(18.0), _b(1.0)))(x)
        assert float(jnp.abs(y - x).max()) < 0.01

    def test_generates_harmonics_above_corner(self):
        # a 5 kHz tone through drive=18 dB must grow a 15 kHz 3rd harmonic
        t = 32768
        n = np.arange(t) / SR
        x = jnp.asarray((0.3 * np.sin(2 * np.pi * 5000.0 * n)).astype(np.float32)[None, None, :])
        y = np.asarray(jax.jit(lambda x: F.exciter(x, SR, _b(2000.0), _b(18.0), _b(1.0)))(x))
        w = np.hanning(t)
        bins = lambda sig: np.abs(np.fft.rfft(sig[0, 0] * w))
        k3 = int(round(15000.0 * t / SR))
        before, after = bins(np.asarray(x)), bins(y)
        assert after[k3 - 2 : k3 + 3].max() > 100.0 * max(before[k3 - 2 : k3 + 3].max(), 1e-9)

    def test_drive_is_level_matched(self):
        # tiny signals: the wet branch has unity small-signal gain for ANY
        # drive, so output is drive-independent
        x = _noise(1, 1, 8192, scale=1e-4)
        run = lambda d: np.asarray(
            jax.jit(lambda x: F.exciter(x, SR, _b(3000.0), _b(d), _b(1.0)))(x)
        )
        np.testing.assert_allclose(run(0.0), run(24.0), atol=1e-6)

    def test_grads_flow(self):
        x = _noise(1, 2, 8192)
        tgt = jax.jit(lambda x: F.exciter(x, SR, _b(4000.0), _b(18.0), _b(0.8)))(x)

        def loss(p):
            f, d, a = p
            return jnp.mean((F.exciter(x, SR, f[None], d[None], a[None]) - tgt) ** 2)

        g = jax.jit(jax.grad(loss))(jnp.asarray([2000.0, 6.0, 0.3], jnp.float32))
        assert np.isfinite(np.asarray(g)).all()
        assert all(abs(float(v)) > 1e-12 for v in g)

    def test_module_dispatch(self):
        proc = D.Exciter(int(SR))
        x = _noise(2, 2, 4096)
        p = jnp.asarray(np.array([[0.5, 0.5, 0.7], [0.2, 1.0, 0.3]], np.float32))
        y = proc.process_normalized(x, p)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


class TestSpectralGate:
    def test_stft_istft_roundtrip(self):
        from dasp_tpu.ops.tv_filter import tv_istft, tv_stft

        x = _noise(2, 2, 8192)
        y = jax.jit(
            lambda x: tv_istft(tv_stft(x, 512, 128, 1024), 8192, 512, 128)
        )(x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def _tone_plus_noise(self, t=32768, a_tone=0.3, a_noise=0.01, duty=None):
        """Tone (+optional on/off duty gating) in white noise, plus a
        separate noise-only capture for profile measurement."""
        n = np.arange(t) / SR
        clean = (a_tone * np.sin(2 * np.pi * 1000.0 * n)).astype(np.float32)
        if duty is not None:
            # tone on for `duty` of every 8192-sample cycle
            clean = clean * ((np.arange(t) % 8192) < duty * 8192)
        noise = (a_noise * RNG.standard_normal(t)).astype(np.float32)
        noise_only = (a_noise * RNG.standard_normal(t)).astype(np.float32)
        return (
            jnp.asarray(clean[None, None, :]),
            jnp.asarray((clean + noise)[None, None, :]),
            jnp.asarray(noise_only[None, None, :]),
        )

    def test_improves_snr_with_self_estimated_floor(self):
        # self-estimation needs the program INTERMITTENT per bin (the
        # low-quantile floor must land on clean frames); 1/3-duty tone
        # bursts. Evaluate away from the on/off transitions — a spectral
        # gate cannot be crisper than its analysis frame (46 ms here),
        # so +-1 frame around each edge is inherent smear, not error.
        t = 32768
        clean, noisy, _ = self._tone_plus_noise(t=t, duty=1 / 3)
        y = np.asarray(
            jax.jit(
                lambda x: F.spectral_gate(x, SR, _b(6.0), _b(40.0), _b(5.0), _b(80.0))
            )(noisy)
        )
        keep = np.ones(t, bool)
        keep[:4096] = keep[-4096:] = False  # clip-edge warmup
        for edge in range(0, t, 8192):
            for tr in (edge, edge + int(8192 / 3)):
                keep[max(tr - 2048, 0) : tr + 2048] = False
        err = lambda s: float(np.mean((s[0, 0, keep] - np.asarray(clean)[0, 0, keep]) ** 2))
        assert err(y) < 0.25 * err(np.asarray(noisy)), (err(y), err(np.asarray(noisy)))

    def test_improves_snr_with_measured_profile(self):
        clean, noisy, noise_only = self._tone_plus_noise()
        prof = F.spectral_noise_profile(noise_only)
        y = np.asarray(
            jax.jit(
                lambda x: F.spectral_gate(
                    x, SR, _b(6.0), _b(40.0), _b(5.0), _b(80.0),
                    noise_profile_db=prof,
                )
            )(noisy)
        )
        seg = slice(4096, 28672)
        err = lambda s: float(np.mean((s[0, 0, seg] - np.asarray(clean)[0, 0, seg]) ** 2))
        assert err(y) < 0.25 * err(np.asarray(noisy)), (err(y), err(np.asarray(noisy)))

    def test_tone_itself_passes(self):
        # a CONTINUOUS tone requires the measured profile (it would be
        # absorbed into the self-estimated floor of its own bin)
        clean, noisy, noise_only = self._tone_plus_noise()
        prof = F.spectral_noise_profile(noise_only)
        y = np.asarray(
            jax.jit(
                lambda x: F.spectral_gate(
                    x, SR, _b(6.0), _b(40.0), _b(5.0), _b(80.0),
                    noise_profile_db=prof,
                )
            )(noisy)
        )
        seg = slice(4096, 28672)
        rms = lambda s: float(np.sqrt(np.mean(s[0, 0, seg] ** 2)))
        gain_db = 20 * np.log10(rms(y) / rms(np.asarray(clean)))
        assert abs(gain_db) < 1.0, gain_db

    def test_stationary_noise_attenuated(self):
        x = _noise(1, 1, 32768, scale=0.05)
        y = np.asarray(
            jax.jit(
                lambda x: F.spectral_gate(x, SR, _b(12.0), _b(60.0), _b(5.0), _b(80.0))
            )(x)
        )
        seg = slice(4096, 28672)
        rms = lambda s: float(np.sqrt(np.mean(s[0, 0, seg] ** 2)))
        red_db = 20 * np.log10(rms(np.asarray(x)) / rms(y))
        assert red_db > 15.0, red_db

    def test_measured_profile_matches_self_estimate_result(self):
        # a profile measured from the same stationary noise behaves like
        # the self-estimated quantile floor
        noise = _noise(1, 1, 32768, scale=0.05)
        prof = F.spectral_noise_profile(noise)
        y_self = jax.jit(
            lambda x: F.spectral_gate(x, SR, _b(12.0), _b(60.0), _b(5.0), _b(80.0))
        )(noise)
        y_prof = jax.jit(
            lambda x: F.spectral_gate(
                x, SR, _b(12.0), _b(60.0), _b(5.0), _b(80.0), noise_profile_db=prof
            )
        )(noise)
        rms = lambda s: float(jnp.sqrt(jnp.mean(s**2)))
        assert rms(y_prof) < 0.2 * rms(noise)
        assert rms(y_self) < 0.2 * rms(noise)

    def test_grads_flow(self):
        clean, noisy, _ = self._tone_plus_noise(t=16384, duty=1 / 3)

        def loss(p):
            t_, r_, a_, rl_ = p
            y = F.spectral_gate(noisy, SR, t_[None], r_[None], a_[None], rl_[None])
            return jnp.mean((y - clean) ** 2)

        g = jax.jit(jax.grad(loss))(jnp.asarray([6.0, 40.0, 5.0, 80.0], jnp.float32))
        assert np.isfinite(np.asarray(g)).all()
        assert abs(float(g[0])) > 0  # threshold certainly matters

    def test_module_dispatch(self):
        proc = D.SpectralGate(int(SR))
        x = _noise(2, 2, 8192)
        p = jnp.full((2, 4), 0.5, jnp.float32)
        y = proc.process_normalized(x, p)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


class TestRingModulator:
    def test_sidebands_replace_the_partial(self):
        # a 1 kHz tone ring-modulated at 300 Hz: energy moves to
        # 700/1300 Hz; the original 1 kHz partial vanishes (mix=1)
        t = 32768
        n = np.arange(t) / SR
        x = jnp.asarray(
            (0.5 * np.sin(2 * np.pi * 1000.0 * n)).astype(np.float32)[None, None, :]
        )
        y = np.asarray(jax.jit(F.ring_modulator)(x, SR, _b(300.0), _b(1.0)))[0, 0]
        w = np.hanning(t)
        spec = np.abs(np.fft.rfft(y * w))
        k = lambda f: int(round(f * t / SR))
        peak = lambda f: spec[k(f) - 2 : k(f) + 3].max()
        assert peak(700.0) > 100.0 * peak(1000.0)
        assert peak(1300.0) > 100.0 * peak(1000.0)
        # equal-amplitude sidebands (sin*sin product identity)
        np.testing.assert_allclose(peak(700.0), peak(1300.0), rtol=0.05)

    def test_mix_zero_is_identity(self):
        x = _noise(2, 2, 2048)
        y = jax.jit(F.ring_modulator)(x, SR, _b(440.0, 2), _b(0.0, 2))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_grad_flows_to_frequency(self):
        x = _noise(1, 1, 4096)
        tgt = jax.jit(F.ring_modulator)(x, SR, _b(500.0), _b(1.0))

        def loss(f):
            return jnp.mean((F.ring_modulator(x, SR, f, _b(1.0)) - tgt) ** 2)

        g = jax.jit(jax.grad(loss))(_b(480.0))
        assert np.isfinite(np.asarray(g)).all() and abs(float(g[0])) > 0
        l480, l495, l500 = (float(jax.jit(loss)(_b(v))) for v in (480.0, 495.0, 500.0))
        assert l500 < l495 < l480

    def test_stream_matches_offline(self):
        from dasp_tpu import streaming

        f = _b(777.0, 2)
        mix = _b(0.7, 2)
        x = _noise(2, 2, 8192)
        off = jax.jit(lambda x: F.ring_modulator(x, SR, f, mix))(x)
        step = jax.jit(
            lambda c, s: streaming.ring_modulator_stream(c, SR, f, mix, state=s)
        )
        state = None
        outs = []
        for k in range(0, 8192, 1024):
            yk, state = step(x[..., k : k + 1024], state)
            outs.append(yk)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate(outs, -1)), np.asarray(off), atol=5e-5
        )

    def test_module_dispatch(self):
        proc = D.RingModulator(int(SR))
        x = _noise(2, 2, 2048)
        p = jnp.asarray(np.array([[0.3, 1.0], [0.7, 0.5]], np.float32))
        y = proc.process_normalized(x, p)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


class TestDynamicEQ:
    BANDS = dict(
        frequency_hz=np.array([[300.0, 3000.0]], np.float32),
        q_factor=np.array([[2.0, 2.0]], np.float32),
        threshold_db=np.array([[-20.0, -20.0]], np.float32),
        ratio=np.array([[4.0, 4.0]], np.float32),
        attack_ms=np.array([[5.0, 5.0]], np.float32),
        release_ms=np.array([[60.0, 60.0]], np.float32),
    )

    def _two_tone(self, t=32768):
        n = np.arange(t) / SR
        loud = 0.5 * np.sin(2 * np.pi * 300.0 * n)
        quiet = 0.05 * np.sin(2 * np.pi * 3000.0 * n)
        return jnp.asarray((loud + quiet).astype(np.float32)[None, None, :])

    @staticmethod
    def _peak_db_change(x, y, f, t):
        w = np.hanning(t)
        spec = lambda s: np.abs(np.fft.rfft(s * w))
        k = int(round(f * t / SR))
        pk = lambda s: spec(s)[k - 2 : k + 3].max()
        return 20 * np.log10(pk(y) / pk(x))

    def test_loud_band_cut_by_the_static_curve(self):
        # 0.5 sine -> band level -9 dB, 11 dB over threshold, ratio 4
        # with a 6 dB knee: ~ -8.2 dB reduction expected at 300 Hz
        t = 32768
        x = self._two_tone(t)
        kw = {k: jnp.asarray(v) for k, v in self.BANDS.items()}
        y = np.asarray(jax.jit(lambda x: F.dynamic_eq(x, SR, **kw))(x))
        d300 = self._peak_db_change(np.asarray(x)[0, 0], y[0, 0], 300.0, t)
        d3k = self._peak_db_change(np.asarray(x)[0, 0], y[0, 0], 3000.0, t)
        assert abs(d300 + 8.2) < 1.0, d300      # loud band dipped
        assert abs(d3k) < 0.3, d3k              # quiet band untouched

    def test_transparent_below_threshold(self):
        x = _noise(2, 2, 8192, scale=1e-3)  # far below every threshold
        kw = {k: jnp.asarray(np.tile(v, (2, 1))) for k, v in self.BANDS.items()}
        y = jax.jit(lambda x: F.dynamic_eq(x, SR, **kw))(x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_grads_flow_to_all_band_params(self):
        x = self._two_tone(16384)
        kw0 = {k: jnp.asarray(v) for k, v in self.BANDS.items()}
        tgt = jax.jit(lambda x: F.dynamic_eq(x, SR, **kw0))(x)
        names = list(self.BANDS)

        def loss(flat):
            kw = {k: flat[i].reshape(1, 2) for i, k in enumerate(names)}
            return jnp.mean((F.dynamic_eq(x, SR, **kw) - tgt) ** 2)

        flat0 = jnp.asarray(np.stack([self.BANDS[k][0] * 0.9 for k in names]))
        g = jax.jit(jax.grad(loss))(flat0)
        assert np.isfinite(np.asarray(g)).all()
        # frequency, q, threshold, ratio all carry signal
        for i in (0, 1, 2, 3):
            assert float(jnp.abs(g[i]).sum()) > 0, names[i]

    def test_stream_matches_offline(self):
        from dasp_tpu import streaming

        t = 16384
        x = self._two_tone(t)
        x = jnp.tile(x, (2, 2, 1)) * jnp.asarray([1.0, 0.5])[:, None, None]
        kw = {k: jnp.asarray(np.tile(v, (2, 1))) for k, v in self.BANDS.items()}
        offline = jax.jit(lambda x: F.dynamic_eq(x, SR, **kw))(x)
        step = jax.jit(
            lambda c, s: streaming.dynamic_eq_stream(c, SR, **kw, state=s)
        )
        state = None
        outs = []
        for k in range(0, t, 2048):
            yk, state = step(x[..., k : k + 2048], state)
            outs.append(yk)
        y = jnp.concatenate(outs, -1)
        left = 1024 - 256
        np.testing.assert_allclose(
            np.asarray(y)[..., left:], np.asarray(offline)[..., : t - left],
            atol=5e-5,
        )

    def test_module_dispatch(self):
        proc = D.DynamicEQ(int(SR))
        assert proc.num_params == 18
        x = _noise(2, 2, 8192)
        p = jnp.full((2, 18), 0.5, jnp.float32)
        y = proc.process_normalized(x, p)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


class TestClipper:
    def test_hard_clip_enforces_ceiling(self):
        x = _noise(1, 1, 4096, scale=1.0)
        y = np.asarray(jax.jit(F.clipper)(x, SR, _b(-6.0), _b(1.0)))
        c = 10 ** (-6.0 / 20.0)
        assert np.abs(y).max() <= c + 1e-6
        # below the ceiling the hard clipper is the identity
        inside = np.abs(np.asarray(x)) < c
        np.testing.assert_allclose(y[inside], np.asarray(x)[inside], atol=1e-7)

    def test_soft_clip_is_scaled_tanh(self):
        x = _noise(1, 1, 2048, scale=0.5)
        y = np.asarray(jax.jit(F.clipper)(x, SR, _b(-12.0), _b(0.0)))
        c = 10 ** (-12.0 / 20.0)
        np.testing.assert_allclose(y, c * np.tanh(np.asarray(x) / c), atol=1e-6)

    def test_grads_flow_to_both_params(self):
        x = _noise(1, 1, 4096, scale=0.6)
        tgt = jax.jit(F.clipper)(x, SR, _b(-9.0), _b(0.7))

        def loss(p):
            return jnp.mean((F.clipper(x, SR, p[0:1], p[1:2]) - tgt) ** 2)

        g = jax.jit(jax.grad(loss))(jnp.asarray([-3.0, 0.2], jnp.float32))
        assert np.isfinite(np.asarray(g)).all()
        assert all(abs(float(v)) > 1e-9 for v in g)

    def test_module_dispatch(self):
        proc = D.Clipper(int(SR))
        x = _noise(2, 2, 2048, scale=0.8)
        p = jnp.asarray(np.array([[0.5, 1.0], [0.2, 0.0]], np.float32))
        y = proc.process_normalized(x, p)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


class TestConvolutionReverb:
    def test_identity_ir_with_full_mix_is_identity(self):
        x = _noise(2, 2, 4096)
        ir = np.zeros(64, np.float32)
        ir[0] = 1.0
        y = jax.jit(lambda x: F.convolution_reverb(x, SR, _b(1.0, 2), ir=jnp.asarray(ir)))(x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def test_matches_reference_convolution(self):
        x = _noise(1, 1, 2048)
        ir = RNG.standard_normal(256).astype(np.float32) * 0.1
        y = np.asarray(
            jax.jit(lambda x: F.convolution_reverb(x, SR, _b(1.0), ir=jnp.asarray(ir)))(x)
        )[0, 0]
        ref = np.convolve(np.asarray(x)[0, 0], ir)[:2048]
        np.testing.assert_allclose(y, ref, atol=1e-4)

    def test_ola_block_path_matches(self):
        x = _noise(1, 2, 8192)
        ir = (RNG.standard_normal(512) * np.exp(-np.arange(512) / 128.0)).astype(np.float32)
        a = jax.jit(lambda x: F.convolution_reverb(x, SR, _b(0.7), ir=jnp.asarray(ir)))(x)
        b = jax.jit(
            lambda x: F.convolution_reverb(x, SR, _b(0.7), ir=jnp.asarray(ir), block=1024)
        )(x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_ir_itself_is_trainable(self):
        x = _noise(1, 1, 4096)
        true_ir = jnp.asarray(
            (RNG.standard_normal(128) * np.exp(-np.arange(128) / 32.0)).astype(np.float32) * 0.3
        )
        tgt = jax.jit(lambda x: F.convolution_reverb(x, SR, _b(1.0), ir=true_ir))(x)

        def loss(ir):
            return jnp.mean((F.convolution_reverb(x, SR, _b(1.0), ir=ir) - tgt) ** 2)

        import optax

        ir = jnp.zeros(128, jnp.float32)
        opt = optax.adam(0.02)
        st = opt.init(ir)
        step = jax.jit(
            lambda ir, st: (lambda lg: (
                optax.apply_updates(ir, opt.update(lg[1], st)[0]),
                opt.update(lg[1], st)[1], lg[0],
            ))(jax.value_and_grad(loss)(ir))
        )
        l0 = float(loss(ir))
        for _ in range(150):
            ir, st, l = step(ir, st)
        assert float(l) < 0.01 * l0, (l0, float(l))

    def test_stream_matches_offline(self):
        from dasp_tpu import streaming

        bs, chs, t = 2, 2, 8192
        x = _noise(bs, chs, t)
        ir = jnp.asarray(
            (RNG.standard_normal((bs, chs, 700)) * 0.1).astype(np.float32)
        )
        mix = _b(0.6, 2)
        off = jax.jit(lambda x: F.convolution_reverb(x, SR, mix, ir=ir))(x)
        state0 = streaming.convolution_reverb_stream_init(ir, mix, bs, chs, chunk_len=1024)
        step = jax.jit(streaming.convolution_reverb_stream)
        state = state0
        outs = []
        for k in range(0, t, 1024):
            yk, state = step(x[..., k : k + 1024], state)
            outs.append(yk)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate(outs, -1)), np.asarray(off), atol=2e-5
        )

    def test_module_dispatch_requires_ir(self):
        proc = D.ConvolutionReverb(int(SR))
        x = _noise(2, 2, 2048)
        ir = jnp.asarray(RNG.standard_normal(128).astype(np.float32) * 0.1)
        p = jnp.full((2, 1), 0.5, jnp.float32)
        y = proc.process_normalized(x, p, ir=ir)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()
        with pytest.raises(TypeError):
            proc.process_normalized(x, p)  # no ir


class TestChainSideInputs:
    def test_chain_forwards_declared_side_inputs_only(self):
        # ir reaches ConvolutionReverb inside a Chain; Gain never sees it
        sr = int(SR)
        chain = D.Chain([D.Gain(sr), D.ConvolutionReverb(sr)])
        x = _noise(2, 2, 2048)
        ir = jnp.asarray(RNG.standard_normal(64).astype(np.float32) * 0.1)
        p = jnp.full((2, chain.num_params), 0.5, jnp.float32)
        y = jax.jit(
            lambda x, p: chain.process_normalized(x, p, clip_params=True, ir=ir)
        )(x, p)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()

    def test_sidechain_reaches_ducker_in_chain(self):
        sr = int(SR)
        chain = D.Chain([D.SidechainCompressor(sr), D.Gain(sr)])
        x = _noise(1, 2, 4096)
        key_sig = _noise(1, 1, 4096, scale=0.5)
        p = jnp.full((1, chain.num_params), 0.5, jnp.float32)
        y = chain.process_normalized(x, p, clip_params=True, sidechain=key_sig)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()
        # a hot key must duck harder than a silent one
        y_quiet = chain.process_normalized(
            x, p, clip_params=True, sidechain=key_sig * 1e-6
        )
        assert float(jnp.mean(y**2)) < float(jnp.mean(y_quiet**2))


class TestPhaseVocoder:
    def test_stretch_changes_length_not_pitch(self):
        t = 65536
        f0 = 440.0
        n = np.arange(t) / SR
        x = jnp.asarray(
            (0.5 * np.sin(2 * np.pi * f0 * n)).astype(np.float32)[None, None, :]
        )
        for rate in (0.5, 2.0):
            y = np.asarray(
                jax.jit(lambda x: F.time_stretch(x, SR, rate))(x)
            )[0, 0]
            assert abs(len(y) - round(t / rate)) <= 1
            seg = y[len(y) // 4 : len(y) // 4 + 16384] * np.hanning(16384)
            spec = np.abs(np.fft.rfft(seg))
            f_peak = spec.argmax() * SR / 16384
            assert abs(f_peak - f0) < 5.0, (rate, f_peak)

    def test_unity_rate_roundtrips(self):
        x = _noise(1, 2, 16384)
        y = np.asarray(jax.jit(lambda x: F.time_stretch(x, SR, 1.0))(x))
        # rate 1: integer frame positions, zero phase correction — the
        # PV reduces to stft->istft through reconstructed phases. The
        # expected-advance ramp accumulates EXACTLY (integer mod-n_fft
        # arithmetic, functional._pv_phase_ramp): coherent content
        # roundtrips to ~1e-5 (it was ~2e-3 when the ramp was cumsum'd
        # in fp32). Broadband NOISE still carries ~3e-4: near-null bins
        # take an absolute-FFT-error phase kick that the cumsum then
        # propagates to later frames of that bin.
        np.testing.assert_allclose(
            y[..., 2048:-2048], np.asarray(x)[..., 2048:-2048], atol=1e-3
        )

    def test_pv_pitch_shift_moves_the_tone(self):
        t = 65536
        f0 = 440.0
        n = np.arange(t) / SR
        x = jnp.asarray(
            (0.5 * np.sin(2 * np.pi * f0 * n)).astype(np.float32)[None, None, :]
        )
        for st in (4.0, -7.0):
            y = np.asarray(
                jax.jit(lambda x: F.pitch_shift_pv(x, SR, st))(x)
            )[0, 0]
            assert len(y) == t
            seg = y[16384 : 16384 + 16384] * np.hanning(16384)
            spec = np.abs(np.fft.rfft(seg))
            f_peak = spec.argmax() * SR / 16384
            want = f0 * 2.0 ** (st / 12.0)
            assert abs(f_peak - want) < 8.0, (st, f_peak, want)

    def test_grad_flows_to_audio(self):
        x = _noise(1, 1, 8192)
        g = jax.jit(jax.grad(
            lambda x: jnp.mean(F.time_stretch(x, SR, 1.3) ** 2)
        ))(x)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    # ---- differentiable fixed-output-length mode (VERDICT r2 #6) ----

    def test_fixed_mode_unity_rate_identity(self):
        x = _noise(2, 2, 16384)
        y = jax.jit(lambda x: F.time_stretch(
            x, SR, jnp.array([1.0, 1.0]), out_len=16384))(x)
        np.testing.assert_allclose(
            np.asarray(y)[..., 2048:-4096], np.asarray(x)[..., 2048:-4096],
            atol=1e-3)  # noise floor — see test_unity_rate_roundtrips

    def test_fixed_mode_matches_static_at_integer_rate(self):
        x = _noise(1, 1, 16384)
        ys = jax.jit(lambda x: F.time_stretch(x, SR, 2.0))(x)
        yf = jax.jit(lambda x: F.time_stretch(
            x, SR, jnp.array([2.0]), out_len=16384 // 2))(x)
        m = ys.shape[-1] - 2048
        np.testing.assert_allclose(
            np.asarray(yf)[..., 1024:m], np.asarray(ys)[..., 1024:m], atol=1e-6)

    def test_fixed_mode_preserves_pitch_per_item(self):
        t = 32768
        n = np.arange(t) / SR
        x = jnp.asarray(np.stack([
            0.5 * np.sin(2 * np.pi * 440.0 * n),
            0.5 * np.sin(2 * np.pi * 660.0 * n),
        ])[:, None, :].astype(np.float32))  # (2, 1, t)
        y = np.asarray(jax.jit(lambda x: F.time_stretch(
            x, SR, jnp.array([1.3, 0.7]), out_len=t))(x))
        for item, f0 in ((0, 440.0), (1, 660.0)):
            seg = y[item, 0, 4096:4096 + 16384] * np.hanning(16384)
            f_peak = np.abs(np.fft.rfft(seg)).argmax() * SR / 16384
            assert abs(f_peak - f0) < 5.0, (item, f_peak)

    def test_rate_gradient_finite_nonzero(self):
        x = _noise(2, 1, 8192)
        target = _noise(2, 1, 8192)
        g = jax.jit(jax.grad(lambda r: jnp.mean(
            (F.time_stretch(x, SR, r, out_len=8192) - target) ** 2
        )))(jnp.array([1.2, 0.9]))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).min()) > 0

    def test_differentiable_pitch_shift_moves_per_item(self):
        t = 32768
        n = np.arange(t) / SR
        x = jnp.asarray((0.5 * np.sin(2 * np.pi * 440.0 * n))
                        .astype(np.float32))[None, None, :].repeat(2, 0)
        semis = jnp.array([4.0, -3.0])
        y = np.asarray(jax.jit(lambda x, s: F.pitch_shift_pv(
            x, SR, s, max_semitones=7.0))(x, semis))
        assert y.shape == (2, 1, t)
        for item, st in ((0, 4.0), (1, -3.0)):
            seg = y[item, 0, 4096:4096 + 16384] * np.hanning(16384)
            f_peak = np.abs(np.fft.rfft(seg)).argmax() * SR / 16384
            want = 440.0 * 2.0 ** (st / 12.0)
            assert abs(f_peak - want) < 8.0, (item, f_peak, want)
        g = jax.jit(jax.grad(lambda s: jnp.mean(F.pitch_shift_pv(
            x, SR, s, max_semitones=7.0) ** 2)))(semis)
        assert np.isfinite(np.asarray(g)).all()

    def test_warp_resample_tiles_matches_gather(self):
        # the tiled dynamic-window resampler (scatter-free backward)
        # must reproduce the plain linear-interp gather bit-for-bit on
        # the forward pass, and give a close, finite rate gradient
        bs, chs, L, T = 2, 2, 12288, 8192
        # dedicated seed: the module-level RNG makes the draw depend on
        # suite ordering, and the rate-gradient comparison below is
        # conditioning-limited, so the margin must be measured on FIXED
        # data (it flaked at 9% on one suite-ordering draw)
        s = jnp.asarray(np.random.default_rng(1234)
                        .standard_normal((bs, chs, L)).astype(np.float32) * 0.1)
        r = jnp.array([1.31, 0.62], jnp.float32)

        def gather_ref(s, r):
            t = jnp.arange(T, dtype=s.dtype)
            pos = jnp.clip(t[None, :] * r[:, None], 0.0, L - 1.001)
            p0 = jnp.floor(pos)
            frac = (pos - p0)[:, None, :]
            i0 = jnp.broadcast_to(
                p0.astype(jnp.int32)[:, None, :], (bs, chs, T))
            s0 = jnp.take_along_axis(s, i0, axis=-1)
            s1 = jnp.take_along_axis(s, jnp.minimum(i0 + 1, L - 1), axis=-1)
            return (1.0 - frac) * s0 + frac * s1

        y_t = jax.jit(lambda s, r: F._warp_resample_tiles(s, r, T, 1.5))(s, r)
        y_g = jax.jit(gather_ref)(s, r)
        np.testing.assert_allclose(
            np.asarray(y_t), np.asarray(y_g), atol=1e-6)
        g_t = jax.grad(lambda r: jnp.sum(
            F._warp_resample_tiles(s, r, T, 1.5) ** 2))(r)
        g_g = jax.grad(lambda r: jnp.sum(gather_ref(s, r) ** 2))(r)
        # the rate gradient sums T heavily-cancelling t-weighted terms,
        # so per-element relative comparison is conditioning-limited (a
        # component can cancel to near zero while the other is ~1e4 —
        # both fp32 paths then sit far from the f64 value in the SAME
        # way). Assert agreement relative to the gradient's norm: on the
        # fixed seed the two formulations agree to 1.6%/3.3% of max|g|.
        gt, gg = np.asarray(g_t), np.asarray(g_g)
        assert np.all(np.abs(gt - gg) <= 0.1 * np.max(np.abs(gg)))
        # gradient to the source flows through the tile transpose
        gs = jax.grad(lambda s: jnp.sum(
            F._warp_resample_tiles(s, r, T, 1.5) ** 2))(s)
        assert np.isfinite(np.asarray(gs)).all()

    def test_time_stretch_module_learns_rate(self):
        """TimeStretch recovers a hidden rate by Adam — the 'full
        stack' trainability contract every other effect meets."""
        import optax

        t = 16384
        x = _noise(1, 1, t)
        proc = D.TimeStretch(SR, frame_size=1024, hop=256)
        p_true = 0.62
        target = proc.process_normalized(
            x, jnp.full((1, 1), p_true, jnp.float32), clip_params=True)

        @jax.jit
        def loss_fn(p):
            y = proc.process_normalized(x, jax.nn.sigmoid(p), clip_params=True)
            return jnp.mean((y - target) ** 2)

        p = jnp.zeros((1, 1), jnp.float32)
        opt = optax.adam(0.1)
        st = opt.init(p)
        grad = jax.jit(jax.grad(loss_fn))
        l0 = float(loss_fn(p))
        for _ in range(60):
            u, st = opt.update(grad(p), st)
            p = optax.apply_updates(p, u)
        l1 = float(loss_fn(p))
        assert l1 < 0.25 * l0, (l0, l1)
        got = float(jax.nn.sigmoid(p)[0, 0])
        assert abs(got - p_true) < 0.12, (got, p_true)

    def test_pitch_shift_pv_module_local_minimum(self):
        """PitchShiftPV's loss is locally minimized at the true shift
        with finite nonzero gradients on both sides (the MSE landscape
        for pitch is too multi-modal for a blind Adam run, but the
        parameter is trainable near the optimum — the module contract)."""
        t = 16384
        n = np.arange(t) / SR
        # harmonic-rich tone: pitch mismatch is visible to plain MSE
        x = jnp.asarray(sum(
            0.3 / k * np.sin(2 * np.pi * 220.0 * k * n) for k in (1, 2, 3)
        ).astype(np.float32))[None, None, :]
        proc = D.PitchShiftPV(SR, min_semitones=-5.0, max_semitones=5.0,
                              frame_size=1024, hop=256)
        p_true = 0.70
        target = proc.process_normalized(
            x, jnp.full((1, 1), p_true, jnp.float32), clip_params=True)

        @jax.jit
        def loss_fn(p):
            y = proc.process_normalized(
                x, jnp.full((1, 1), 1.0, jnp.float32) * p, clip_params=True)
            return jnp.mean((y - target) ** 2)

        l_true = float(loss_fn(jnp.asarray(p_true)))
        l_lo = float(loss_fn(jnp.asarray(p_true - 0.04)))
        l_hi = float(loss_fn(jnp.asarray(p_true + 0.04)))
        assert l_true < l_lo and l_true < l_hi, (l_lo, l_true, l_hi)
        g = jax.jit(jax.grad(lambda p: loss_fn(p)))(jnp.asarray(p_true + 0.04))
        assert np.isfinite(float(g)) and abs(float(g)) > 0


class TestStereoImager:
    def _stereo(self, t=16384):
        return _noise(2, 2, t, scale=0.3)

    def test_neutral_widths_magnitude_transparent(self):
        # the phase-compensated LR4 tree sums to an ALLPASS of the
        # input (magnitude-flat, not waveform-identical): at the
        # widener-neutral width 0.5 the impulse response's magnitude
        # spectrum is flat to ~0.1 dB
        t = 16384
        x = np.zeros((1, 2, t), np.float32)
        x[:, :, 256] = 1.0
        y = jax.jit(
            lambda x: F.stereo_imager(
                x, SR, _b(250.0), _b(2500.0),
                _b(0.5), _b(0.5), _b(0.5),
            )
        )(jnp.asarray(x))
        H = np.abs(np.fft.rfft(np.asarray(y)[0, 0]))
        mag_db = 20 * np.log10(H[4:-4] + 1e-12)
        assert np.abs(mag_db).max() < 0.15, np.abs(mag_db).max()

    def test_zero_low_width_monos_the_lows(self):
        # an antiphase 100 Hz tone (pure side) with low_width=0 vanishes;
        # an antiphase 6 kHz tone with high_width=0.5 (neutral) survives
        t = 32768
        n = np.arange(t) / SR
        low = 0.4 * np.sin(2 * np.pi * 100.0 * n)
        high = 0.4 * np.sin(2 * np.pi * 6000.0 * n)
        x = jnp.asarray(
            np.stack([low + high, -(low + high)])[None].astype(np.float32)
        )  # (1, 2, t), all side, no mid
        y = np.asarray(
            jax.jit(
                lambda x: F.stereo_imager(
                    x, SR, _b(300.0), _b(2000.0), _b(0.0), _b(0.5), _b(0.5)
                )
            )(x)
        )[0, 0]
        w = np.hanning(t)
        spec = np.abs(np.fft.rfft(y * w))
        k = lambda f: int(round(f * t / SR))
        pk = lambda f: spec[k(f) - 2 : k(f) + 3].max()
        assert pk(100.0) < 0.02 * pk(6000.0), (pk(100.0), pk(6000.0))

    def test_grads_and_module(self):
        x = self._stereo(8192)
        proc = D.StereoImager(int(SR))
        p = jnp.full((2, proc.num_params), 0.5, jnp.float32)
        g = jax.jit(jax.grad(
            lambda p: jnp.mean(proc.process_normalized(x, p, clip_params=True) ** 2)
        ))(p)
        assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0

    def test_rejects_mono(self):
        with pytest.raises(ValueError, match="stereo"):
            F.stereo_imager(
                jnp.zeros((1, 1, 1024)), SR, _b(250.0), _b(2500.0),
                _b(1.0), _b(1.0), _b(1.0),
            )


class TestWowFlutter:
    def test_zero_depth_is_pure_base_delay(self):
        t = 8192
        x = _noise(1, 1, t)
        base_samp = 200  # integer-sample base so the read is exact
        base_ms = base_samp / SR * 1e3
        y = jax.jit(
            lambda x, k: F.wow_flutter(
                x, SR, _b(0.0), _b(0.0), key=k, base_ms=base_ms
            )
        )(x, jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            np.asarray(y)[0, 0, base_samp + 1 :],
            np.asarray(x)[0, 0, 1 : t - base_samp],
            atol=1e-4,
        )

    def test_wow_spreads_a_tone(self):
        # a pure tone through pitch instability loses spectral
        # concentration: the peak bin's share of total energy drops
        t = 65536
        n = np.arange(t) / SR
        x = jnp.asarray(
            (0.5 * np.sin(2 * np.pi * 1000.0 * n)).astype(np.float32)[None, None, :]
        )
        run = lambda d: np.asarray(jax.jit(
            lambda x, k: F.wow_flutter(x, SR, _b(d), _b(d * 0.3), key=k)
        )(x, jax.random.PRNGKey(1)))[0, 0]
        w = np.hanning(t)
        conc = lambda y: (lambda s: float(s.max() / s.sum()))(
            np.abs(np.fft.rfft(y[8192:] * w[8192:]))
        )
        assert conc(run(1.0)) < 0.5 * conc(run(0.0))

    def test_requires_key_or_noise(self):
        with pytest.raises(ValueError, match="stochastic"):
            F.wow_flutter(jnp.zeros((1, 1, 1024)), SR, _b(0.5), _b(0.1))

    def test_noise_injection_is_deterministic(self):
        x = _noise(1, 2, 4096)
        nz = jnp.asarray(RNG.standard_normal((1, 2, 4096)).astype(np.float32))
        f = jax.jit(lambda x, nz: F.wow_flutter(x, SR, _b(0.8), _b(0.2), noise=nz))
        np.testing.assert_allclose(
            np.asarray(f(x, nz)), np.asarray(f(x, nz)), atol=0.0
        )

    def test_grads_flow_to_depths(self):
        x = _noise(1, 1, 8192)
        nz = jnp.asarray(RNG.standard_normal((1, 2, 8192)).astype(np.float32))

        def loss(p):
            return jnp.mean(
                F.wow_flutter(x, SR, p[0:1], p[1:2], noise=nz) ** 2
            )

        g = jax.jit(jax.grad(loss))(jnp.asarray([0.8, 0.2], jnp.float32))
        assert np.isfinite(np.asarray(g)).all()

    def test_module_dispatch(self):
        proc = D.WowFlutter(int(SR))
        x = _noise(2, 2, 4096)
        p = jnp.full((2, proc.num_params), 0.5, jnp.float32)
        y = proc.process_normalized(x, p, key=jax.random.PRNGKey(3))
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()
