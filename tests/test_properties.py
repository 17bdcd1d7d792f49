"""Property tests: jit/no-jit equality, vmap batch-independence, shape and
dtype contracts, Processor round-trips, gradient health (SURVEY.md §4)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dasp_tpu as D

SR = 44100
BS, T = 2, 4096
RNG = np.random.default_rng(3)


def mono(bs=BS, t=T):
    return jnp.asarray(RNG.standard_normal((bs, 1, t)).astype(np.float32) * 0.25)


def stereo(bs=BS, t=T):
    return jnp.asarray(RNG.standard_normal((bs, 2, t)).astype(np.float32) * 0.25)


# (effect fn, input builder, params dict) for uniform property testing
def effect_cases():
    key = jax.random.PRNGKey(0)
    noise = jax.random.normal(key, (BS * 2, 12, 2048 + 1022), dtype=jnp.float32)
    return [
        ("gain", D.gain, stereo(), {"gain_db": jnp.array([3.0, -4.5])}, {}),
        ("distortion", D.distortion, stereo(), {"drive_db": jnp.array([12.0, 6.0])}, {}),
        (
            "parametric_eq",
            D.parametric_eq,
            stereo(),
            {
                k: jnp.array(v)
                for k, v in {
                    "low_shelf_gain_db": [2.0, -2.0], "low_shelf_cutoff_freq": [100.0, 200.0],
                    "low_shelf_q_factor": [0.7, 1.0], "band0_gain_db": [-3.0, 3.0],
                    "band0_cutoff_freq": [500.0, 700.0], "band0_q_factor": [1.0, 2.0],
                    "band1_gain_db": [2.0, -2.0], "band1_cutoff_freq": [3000.0, 2500.0],
                    "band1_q_factor": [2.0, 0.5], "band2_gain_db": [-2.0, 4.0],
                    "band2_cutoff_freq": [9000.0, 10000.0], "band2_q_factor": [1.5, 3.0],
                    "band3_gain_db": [1.0, -1.0], "band3_cutoff_freq": [14000.0, 13000.0],
                    "band3_q_factor": [1.0, 0.8], "high_shelf_gain_db": [-2.0, 3.0],
                    "high_shelf_cutoff_freq": [8000.0, 6000.0], "high_shelf_q_factor": [0.7, 1.2],
                }.items()
            },
            {},
        ),
        (
            "compressor",
            D.compressor,
            stereo(),
            {
                "threshold_db": jnp.array([-24.0, -30.0]), "ratio": jnp.array([4.0, 6.0]),
                "attack_ms": jnp.array([10.0, 20.0]), "release_ms": jnp.array([60.0, 80.0]),
                "knee_db": jnp.array([6.0, 3.0]), "makeup_gain_db": jnp.array([2.0, 0.0]),
            },
            {"smoother": "fsm"},
        ),
        (
            "expander",
            D.expander,
            stereo(),
            {
                "threshold_db": jnp.array([-30.0, -40.0]), "ratio": jnp.array([2.0, 3.0]),
                "attack_ms": jnp.array([10.0, 20.0]), "release_ms": jnp.array([60.0, 80.0]),
                "knee_db": jnp.array([6.0, 3.0]), "makeup_gain_db": jnp.array([0.0, 0.0]),
            },
            {"smoother": "parallel"},
        ),
        (
            "reverb",
            D.noise_shaped_reverberation,
            stereo(),
            {
                **{f"band{i}_gain": jnp.array([0.5, 0.6]) for i in range(12)},
                **{f"band{i}_decay": jnp.array([0.3, 0.7]) for i in range(12)},
                "mix": jnp.array([0.5, 0.3]),
            },
            {"num_samples": 2048, "num_bandpass_taps": 1023, "noise": noise},
        ),
        ("widener", D.stereo_widener, stereo(), {"width": jnp.array([0.7, 0.2])}, {}),
        (
            "graphic_eq",
            D.graphic_eq,
            stereo(),
            {"band_gains_db": jnp.asarray(RNG.uniform(-6, 6, (BS, 10)).astype(np.float32))},
            {},
        ),
        (
            "advanced_distortion",
            D.advanced_distortion,
            stereo(),
            {
                "input_gain_db": jnp.array([12.0, 6.0]), "output_gain_db": jnp.array([-3.0, 0.0]),
                "tone": jnp.array([0.3, 0.7]), "dc_offset": jnp.array([0.01, -0.02]),
            },
            {},
        ),
    ]


@pytest.mark.parametrize("name,fn,x,params,kw", effect_cases(), ids=lambda c: c if isinstance(c, str) else "")
class TestUniformProperties:
    def test_jit_matches_eager(self, name, fn, x, params, kw):
        y_eager = fn(x, SR, **params, **kw)
        y_jit = jax.jit(lambda x, p: fn(x, SR, **p, **kw))(x, params)
        # jit may reassociate fp32 math (FFT fusion order), so compare to the
        # same absolute budget as reference parity, not bitwise
        np.testing.assert_allclose(np.asarray(y_eager), np.asarray(y_jit), atol=1e-4)

    def test_shape_and_dtype(self, name, fn, x, params, kw):
        y = fn(x, SR, **params, **kw)
        assert y.dtype == x.dtype
        assert y.shape[0] == x.shape[0]
        assert y.shape[-1] == x.shape[-1]

    def test_output_finite(self, name, fn, x, params, kw):
        y = fn(x, SR, **params, **kw)
        assert bool(jnp.isfinite(y).all())

    def test_grads_finite_and_nonzero(self, name, fn, x, params, kw):
        def loss(p):
            return jnp.mean(fn(x, SR, **p, **kw) ** 2)

        grads = jax.jit(jax.grad(loss))(params)
        flat, _ = jax.tree.flatten(grads)
        for g in flat:
            assert bool(jnp.isfinite(g).all()), f"{name}: non-finite grad"
        total = sum(float(jnp.abs(g).sum()) for g in flat)
        assert total > 0, f"{name}: all-zero gradients"


class TestBatchIndependence:
    def test_compressor_batch_independent(self):
        """Item 0's output must not depend on item 1's audio."""
        x = stereo()
        params = dict(
            threshold_db=jnp.array([-24.0, -24.0]), ratio=jnp.array([4.0, 4.0]),
            attack_ms=jnp.array([10.0, 10.0]), release_ms=jnp.array([60.0, 60.0]),
            knee_db=jnp.array([6.0, 6.0]), makeup_gain_db=jnp.array([0.0, 0.0]),
        )
        y_full = D.compressor(x, SR, **params, smoother="fsm")
        x_mod = x.at[1].multiply(3.0)
        y_mod = D.compressor(x_mod, SR, **params, smoother="fsm")
        np.testing.assert_allclose(np.asarray(y_full)[0], np.asarray(y_mod)[0], atol=1e-6)

    def test_vmap_consistency_eq(self):
        x = stereo()
        gains = jnp.array([3.0, -3.0])

        def single(xi, g):
            return D.gain(xi[None], SR, g[None])[0]

        y_vmap = jax.vmap(single)(x, gains)
        y_batch = D.gain(x, SR, gains)
        np.testing.assert_allclose(np.asarray(y_vmap), np.asarray(y_batch), atol=1e-7)


class TestProcessorLayer:
    @pytest.mark.parametrize(
        "cls,chs",
        [
            (D.Gain, 2), (D.Distortion, 1), (D.ParametricEQ, 2), (D.GraphicEQ, 2),
            (D.Compressor, 2), (D.Expander, 2), (D.AdvancedDistortion, 2),
            (D.StereoWidener, 2),
        ],
    )
    def test_process_normalized_runs(self, cls, chs):
        proc = cls(SR)
        x = stereo() if chs == 2 else mono()
        p = jnp.full((BS, proc.num_params), 0.5)
        y = proc.process_normalized(x, p)
        assert y.shape[0] == BS and y.shape[-1] == T
        assert bool(jnp.isfinite(y).all())

    def test_reverb_processor_with_key(self):
        proc = D.NoiseShapedReverb(SR, num_samples=2048)
        x = stereo()
        p = jnp.full((BS, proc.num_params), 0.5)
        y = proc.process_normalized(x, p, key=jax.random.PRNGKey(0))
        assert y.shape == (BS, 2, T)
        # same key -> deterministic
        y2 = proc.process_normalized(x, p, key=jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=0)
        # different key -> different render
        y3 = proc.process_normalized(x, p, key=jax.random.PRNGKey(1))
        assert float(jnp.abs(y - y3).max()) > 1e-6

    def test_panner_processor(self):
        proc = D.StereoPanner(SR)
        x = mono()  # (bs, 1 track, T)
        y = proc.process_normalized(x, jnp.full((BS, 1), 0.25))
        assert y.shape == (BS, 2, 1, T)

    def test_bus_processor(self):
        proc = D.StereoBus(SR, num_tracks=3)
        x = jnp.asarray(RNG.standard_normal((BS, 2, 3, T)).astype(np.float32))
        y = proc.process_normalized(x, jnp.full((BS, 3), 0.9))
        assert y.shape == (BS, 2, T)

    def test_param_count_mismatch_raises(self):
        with pytest.raises(ValueError, match="parameters"):
            D.Compressor(SR).process_normalized(stereo(), jnp.full((BS, 3), 0.5))

    def test_out_of_range_raises_eagerly(self):
        with pytest.raises(ValueError, match="out of range"):
            D.Gain(SR).process_normalized(stereo(), jnp.full((BS, 1), 1.2))

    def test_clip_params_under_jit(self):
        proc = D.Gain(SR)
        x = stereo()
        f = jax.jit(lambda p: proc.process_normalized(x, p, clip_params=True))
        y = f(jnp.full((BS, 1), 1.2))  # would raise eagerly; clips under jit
        y_ref = proc.process_normalized(x, jnp.ones((BS, 1)))
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)

    def test_normalize_denormalize_roundtrip(self):
        from dasp_tpu.modules import denormalize, normalize

        v = jnp.linspace(0.0, 1.0, 11)
        lo, hi = -24.0, 24.0
        np.testing.assert_allclose(
            np.asarray(normalize(denormalize(v, hi, lo), lo, hi)), np.asarray(v), atol=1e-6
        )


class TestChain:
    def test_chain_matches_manual_composition(self):
        sr = SR
        eq, comp, g = D.ParametricEQ(sr), D.Compressor(sr), D.Gain(sr)
        chain = D.Chain([eq, comp, g])
        assert chain.num_params == 18 + 6 + 1
        x = stereo()
        p = jnp.asarray(RNG.uniform(0.2, 0.8, (BS, chain.num_params)).astype(np.float32))
        y_chain = chain.process_normalized(x, p)
        y_manual = eq.process_normalized(x, p[:, :18])
        y_manual = comp.process_normalized(y_manual, p[:, 18:24])
        y_manual = g.process_normalized(y_manual, p[:, 24:25])
        np.testing.assert_allclose(np.asarray(y_chain), np.asarray(y_manual), atol=1e-6)

    def test_chain_stochastic_requires_key(self):
        chain = D.Chain([D.Gain(SR), D.NoiseShapedReverb(SR, num_samples=2048)])
        assert chain.stochastic
        p = jnp.full((BS, chain.num_params), 0.5)
        with pytest.raises(ValueError, match="key"):
            chain.process_normalized(stereo(), p)
        y1 = chain.process_normalized(stereo(), p, key=jax.random.PRNGKey(0))
        assert y1.shape == (BS, 2, T) and bool(jnp.isfinite(y1).all())

    def test_chain_param_count_mismatch(self):
        chain = D.Chain([D.Gain(SR), D.Distortion(SR)])
        with pytest.raises(ValueError, match="parameters"):
            chain.process_normalized(stereo(), jnp.full((BS, 3), 0.5))

    def test_chain_jit_and_grad(self):
        chain = D.Chain([D.ParametricEQ(SR, filter_method="exact"), D.Gain(SR)])
        x = stereo()

        @jax.jit
        def loss(p):
            return jnp.mean(chain.process_normalized(x, p, clip_params=True) ** 2)

        p = jnp.full((BS, chain.num_params), 0.5)
        g = jax.grad(loss)(p)
        assert g.shape == p.shape and bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).sum()) > 0

    def test_chain_empty_raises(self):
        with pytest.raises(ValueError, match="at least one"):
            D.Chain([])

    def test_chain_noise_injection(self):
        # noise= must reach the stochastic member (deterministic eval path)
        rev = D.NoiseShapedReverb(SR, num_samples=2048)
        chain = D.Chain([D.Gain(SR), rev])
        x = stereo()
        p = jnp.full((BS, chain.num_params), 0.5)
        noise = jax.random.normal(jax.random.PRNGKey(5), (BS * 2, 12, 2048 + 1022))
        y1 = chain.process_normalized(x, p, noise=noise)
        y2 = chain.process_normalized(x, p, noise=noise)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=0)


class TestProcessPassthrough:
    """Processor.process(x, *args, **kwargs) is the documented raw
    positional passthrough — must keep working for the wrapped classes."""

    def test_compressor_positional(self):
        x = stereo()
        y = D.Compressor(SR).process(
            x, SR, jnp.array([-24.0, -30.0]), jnp.array([4.0, 6.0]),
            jnp.array([10.0, 20.0]), jnp.array([60.0, 80.0]),
            jnp.array([6.0, 3.0]), jnp.array([0.0, 0.0]))
        assert y.shape == x.shape and bool(jnp.isfinite(y).all())

    def test_advanced_distortion_positional_and_override(self):
        x = stereo()
        proc = D.AdvancedDistortion(SR)  # constructor default: block (exact)
        args = (jnp.array([12.0, 6.0]), jnp.array([-3.0, 0.0]),
                jnp.array([0.3, 0.7]), jnp.array([0.01, -0.02]))
        y_default = proc.process(x, SR, *args)
        y_fsm = proc.process(x, SR, *args, filter_method="fsm")  # per-call override
        assert bool(jnp.isfinite(y_default).all()) and bool(jnp.isfinite(y_fsm).all())
        assert float(jnp.abs(y_default - y_fsm).max()) > 0

    def test_graphic_eq_positional(self):
        x = stereo()
        gains = jnp.asarray(RNG.uniform(-6, 6, (BS, 10)).astype(np.float32))
        y = D.GraphicEQ(SR).process(x, SR, gains)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(D.graphic_eq(x, SR, gains)), atol=1e-6)

    def test_graphic_eq_low_sample_rate(self):
        """Regression: at sample rates below 32 kHz the fixed 16 kHz band
        put w0 > pi — an unstable biquad that diverged on the exact paths
        and aliased on fsm. Band centres are now clamped below Nyquist."""
        x = stereo()
        gains = jnp.asarray(RNG.uniform(-6, 6, (BS, 10)).astype(np.float32))
        for method in ("fsm", "exact", "block", "coupled", "pallas"):
            y = D.graphic_eq(x, 22050, gains, filter_method=method)
            assert bool(jnp.isfinite(y).all()), method
            # near-transparent bands must not blow the signal up
            assert float(jnp.abs(y).max()) < 40.0 * float(jnp.abs(x).max()), method

    def test_stereo_bus_positional(self):
        x = jnp.asarray(RNG.standard_normal((BS, 2, 3, T)).astype(np.float32))
        sends = jnp.full((BS, 3), -3.0)
        y = D.StereoBus(SR, num_tracks=3).process(x, SR, sends)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(D.stereo_bus(x, SR, sends)), atol=0)

    def test_reverb_positional(self):
        x = stereo()
        p = [jnp.full((BS,), 0.5)] * 25
        proc = D.NoiseShapedReverb(SR, num_samples=2048)
        y = proc.process(x, SR, *p, key=jax.random.PRNGKey(0))
        assert y.shape == (BS, 2, T) and bool(jnp.isfinite(y).all())


class TestFilterMethodPlumbing:
    """The fast exact paths must agree with each other (and with the FSM
    approximation loosely) wherever a filter_method knob is exposed."""

    def test_advanced_distortion_methods_agree(self):
        x = stereo()
        params = dict(
            input_gain_db=jnp.array([12.0, 6.0]), output_gain_db=jnp.array([-3.0, 0.0]),
            tone=jnp.array([0.3, 0.7]), dc_offset=jnp.array([0.01, -0.02]),
        )
        y_exact = D.advanced_distortion(x, SR, **params, filter_method="exact")
        y_block = D.advanced_distortion(x, SR, **params, filter_method="block")
        y_fsm = D.advanced_distortion(x, SR, **params, filter_method="fsm")
        np.testing.assert_allclose(np.asarray(y_exact), np.asarray(y_block), atol=1e-4)
        # the one-pole tone filters decay in tens of samples, so the FSM
        # approximation is tight at these lengths
        np.testing.assert_allclose(np.asarray(y_exact), np.asarray(y_fsm), atol=1e-3)

    def test_advanced_distortion_module_filter_method(self):
        x = stereo()
        p = jnp.full((BS, 4), 0.5)
        # module default is the exact block path; fsm stays routable
        y_default = D.AdvancedDistortion(SR).process_normalized(x, p)
        y_block = D.AdvancedDistortion(SR, filter_method="block").process_normalized(x, p)
        y_fsm = D.AdvancedDistortion(SR, filter_method="fsm").process_normalized(x, p)
        np.testing.assert_allclose(np.asarray(y_default), np.asarray(y_block), atol=1e-6)
        np.testing.assert_allclose(np.asarray(y_fsm), np.asarray(y_block), atol=1e-3)

    def test_graphic_eq_module_filter_method(self):
        # the module must route filter_method through to the functional
        # effect. (Cross-method closeness is NOT asserted here: a 31.5 Hz
        # peaking biquad at 44.1 kHz has poles so close to the unit circle
        # that fp32 coefficient rounding alone moves the response — exact,
        # block and f64 scipy all legitimately differ by ~0.1 at T=4096.)
        x = stereo()
        proc = D.GraphicEQ(SR, filter_method="block")
        p = jnp.asarray(RNG.uniform(0.3, 0.7, (BS, proc.num_params)).astype(np.float32))
        y_module = proc.process_normalized(x, p)
        gains = jnp.stack(
            [
                proc.denormalize_param_dict(proc.extract_param_dict(p))[f"band{i}_gain_db"]
                for i in range(10)
            ],
            axis=-1,
        )
        y_direct = D.graphic_eq(x, SR, gains, filter_method="block")
        np.testing.assert_allclose(np.asarray(y_module), np.asarray(y_direct), atol=1e-6)
        # and the routing must actually change the path vs the fsm method
        y_fsm = D.GraphicEQ(SR, filter_method="fsm").process_normalized(x, p)
        assert float(jnp.abs(y_module - y_fsm).max()) > 1e-6
        # the module default (coupled) matches the functional default
        y_default = D.GraphicEQ(SR).process_normalized(x, p)
        np.testing.assert_allclose(
            np.asarray(y_default), np.asarray(D.graphic_eq(x, SR, gains)), atol=1e-6)

    def test_advanced_distortion_grads_block(self):
        x = stereo()
        params = dict(
            input_gain_db=jnp.array([12.0, 6.0]), output_gain_db=jnp.array([-3.0, 0.0]),
            tone=jnp.array([0.3, 0.7]), dc_offset=jnp.array([0.01, -0.02]),
        )

        def loss(p):
            return jnp.mean(D.advanced_distortion(x, SR, **p, filter_method="block") ** 2)

        grads = jax.jit(jax.grad(loss))(params)
        for g in jax.tree.leaves(grads):
            assert bool(jnp.isfinite(g).all())
        assert sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)) > 0


class TestDtypePolicy:
    def test_bfloat16_supported(self):
        x = stereo().astype(jnp.bfloat16)
        y = D.gain(x, SR, jnp.array([3.0, -3.0]))
        assert y.dtype == jnp.bfloat16

    def test_mono_reverb_upmixes(self):
        x = mono()
        p = [jnp.full((BS,), 0.5)] * 25
        y = D.noise_shaped_reverberation(
            x, SR, *p, num_samples=2048, key=jax.random.PRNGKey(0)
        )
        assert y.shape == (BS, 2, T)
