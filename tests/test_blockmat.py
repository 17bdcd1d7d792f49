"""Block-state batched-matmul IIR (`ops.iir.sosfilt_blockmat`) tests.

The formulation splits the recursion into an intra-block Toeplitz matmul
(one batched MXU dot_general) plus a 2x2 cross-block associative scan —
see the docstring. Exactness class matches `sosfilt_exact`; on a real
v5e it measured MORE accurate than the associative-scan cascade against
scipy float64 (3.1e-4 vs 6.7e-4 max error on a 6-section high-Q EQ over
3000 samples) and ~1.5x faster forward than the Pallas sweep.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from dasp_tpu.ops import sosfilt_blockmat, sosfilt_exact
from dasp_tpu.ops.biquad import biquad
from dasp_tpu.ops.iir import sosfilt_coupled, stabilize_sos

SR = 44100
RNG = np.random.default_rng(11)


def make_sos(bs):
    secs = []
    for g, fc, q, ft in [
        (4.0, 200.0, 0.7, "low_shelf"),
        (-6.0, 1000.0, 2.0, "peaking"),
        (3.0, 8000.0, 0.7, "high_shelf"),
    ]:
        b, a = biquad(jnp.full((bs,), g), jnp.full((bs,), fc), jnp.full((bs,), q), SR, ft)
        secs.append(jnp.concatenate([b, a], axis=-1))
    return jnp.stack(secs, axis=1)


class TestSosfiltBlockmat:
    def test_matches_scipy_f64(self):
        bs, T = 2, 2000
        x = jnp.asarray(RNG.standard_normal((bs, 1, T)).astype(np.float32) * 0.3)
        sos = make_sos(bs)
        y = sosfilt_blockmat(sos, x)
        for i in range(bs):
            ref = scipy.signal.sosfilt(
                np.asarray(sos, np.float64)[i], np.asarray(x, np.float64)[i, 0]
            )
            np.testing.assert_allclose(np.asarray(y)[i, 0], ref, atol=5e-4)

    def test_matches_scan_unaligned(self):
        # length not a multiple of the block, channels folded into rows
        bs, ch, T = 3, 2, 777
        x = jnp.asarray(RNG.standard_normal((bs, ch, T)).astype(np.float32) * 0.3)
        sos = make_sos(bs)
        y_b = sosfilt_blockmat(sos, x)
        y_s = sosfilt_exact(sos, x)
        assert y_b.shape == x.shape
        # both are fp32-exact algorithms; near-unity poles (200 Hz shelf)
        # make their rounding paths diverge — same tolerance as the
        # pallas-vs-scan tests
        np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_s), atol=2e-3)

    def test_gradients_match_scan(self):
        bs, T = 2, 640
        x = jnp.asarray(RNG.standard_normal((bs, 1, T)).astype(np.float32) * 0.3)
        sos = make_sos(bs)

        g_b = jax.grad(lambda s, z: jnp.mean(sosfilt_blockmat(s, z) ** 2), argnums=(0, 1))(sos, x)
        g_s = jax.grad(lambda s, z: jnp.mean(sosfilt_exact(s, z) ** 2), argnums=(0, 1))(sos, x)
        np.testing.assert_allclose(np.asarray(g_b[1]), np.asarray(g_s[1]), atol=1e-3)
        # coefficient grads of near-unity-pole sections are fp32-noisy in
        # BOTH methods: measured 0.21% (blockmat) vs 0.29% (scan) relative
        # error against a float64 reference on this exact case
        scale = np.abs(np.asarray(g_s[0])).max()
        np.testing.assert_allclose(
            np.asarray(g_b[0]) / scale, np.asarray(g_s[0]) / scale, atol=1e-2
        )

    def test_parametric_eq_block_method(self):
        import dasp_tpu as D

        bs, T = 2, 1024
        x = jnp.asarray(RNG.standard_normal((bs, 2, T)).astype(np.float32) * 0.3)
        p = [jnp.full((bs,), v) for v in
             [2.0, 200.0, 0.7, 3.0, 400.0, 1.0, -2.0, 3000.0, 2.0,
              1.0, 9000.0, 1.0, 2.0, 13000.0, 1.0, -3.0, 8000.0, 0.7]]
        y_b = D.parametric_eq(x, SR, *p, filter_method="block")
        y_e = D.parametric_eq(x, SR, *p, filter_method="exact")
        np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_e), atol=2e-3)

    def test_long_length_high_q_stays_finite(self):
        # regression guard for the training-scale failure mode: a high-Q
        # low-frequency cascade over many cross-block scan products (the
        # TPU incident was bf16 default-precision 2x2 products compounding
        # over nb=1024 blocks into inf; the combines now force HIGHEST)
        bs, T = 2, 65536
        x = jnp.asarray(RNG.standard_normal((bs, 1, T)).astype(np.float32) * 0.25)
        secs = []
        for g, fc, q, ft in [(12.0, 60.0, 5.0, "peaking"), (-10.0, 120.0, 6.0, "peaking")]:
            b, a = biquad(jnp.full((bs,), g), jnp.full((bs,), fc), jnp.full((bs,), q), SR, ft)
            secs.append(jnp.concatenate([b, a], axis=-1))
        sos = jnp.stack(secs, axis=1)
        loss = lambda s, z: jnp.mean(sosfilt_blockmat(s, z) ** 2)  # noqa: E731
        l, (gs, gx) = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))(sos, x)
        assert bool(jnp.isfinite(l)) and bool(jnp.isfinite(gs).all()) and bool(jnp.isfinite(gx).all())


class TestSosfiltCoupled:
    """Gold-Rader coupled-form block-state path: exactness on every pole
    configuration, and the headline ~1000x fp32 conditioning win on
    near-unit-circle cascades that break the direct formulations."""

    def _graphic_sos(self, gains):
        from dasp_tpu.functional import GRAPHIC_EQ_BANDS

        Q = np.sqrt(2.0)
        secs = []
        for g, fc in zip(gains, GRAPHIC_EQ_BANDS):
            A = 10 ** (g / 40)
            w0 = 2 * np.pi * fc / SR
            al = np.sin(w0) / (2 * Q)
            b = np.array([1 + al * A, -2 * np.cos(w0), 1 - al * A])
            a = np.array([1 + al / A, -2 * np.cos(w0), 1 - al / A])
            secs.append(np.concatenate([b / a[0], a / a[0]]))
        return np.stack(secs)

    def test_low_band_cascade_beats_blockmat(self):
        # the full 10-band graphic EQ cascade at 44.1 kHz: poles at
        # |r| ~ 0.9999 where the direct-form AR impulse response (O(1/im)
        # entries) catastrophically cancels in fp32
        gains = RNG.uniform(-6, 6, 10)
        sos64 = self._graphic_sos(gains)
        T = 2048
        x = RNG.standard_normal((1, 1, T)).astype(np.float32)
        y_ref = scipy.signal.sosfilt(sos64, x[0, 0].astype(np.float64))
        scale = np.abs(y_ref).max()
        sos32 = jnp.asarray(sos64.astype(np.float32))[None]
        xj = jnp.asarray(x)
        err_c = np.abs(np.asarray(sosfilt_coupled(sos32, xj))[0, 0] - y_ref).max() / scale
        err_b = np.abs(np.asarray(sosfilt_blockmat(sos32, xj))[0, 0] - y_ref).max() / scale
        assert err_c < 1e-3, err_c
        assert err_c < err_b / 50, (err_c, err_b)

    def test_real_and_repeated_poles(self):
        # disc >= 0 sections route to the controller-canonical branch;
        # the coupled formulas must not contaminate them (safe-where)
        x = RNG.standard_normal((1, 1, 3000)).astype(np.float32)
        xj = jnp.asarray(x)
        for poles, zeros in [([0.9, 0.3], [0.5, -0.2]),
                             ([0.707, 0.7071], [0.1, 0.0]),
                             ([0.6, 0.6], [0.2, 0.1])]:
            a = np.poly(poles)
            b = 0.7 * np.poly(zeros)
            y_ref = scipy.signal.lfilter(b, a, x[0, 0].astype(np.float64))
            sosj = jnp.asarray(np.concatenate([b, a])[None, None, :].astype(np.float32))
            y = np.asarray(sosfilt_coupled(sosj, xj))[0, 0]
            np.testing.assert_allclose(y, y_ref, atol=2e-5)

    def test_matches_scipy_mixed_cascade(self):
        # complex-pole + real-pole sections in one cascade, channels folded
        bs, ch, T = 2, 2, 777
        x = jnp.asarray(RNG.standard_normal((bs, ch, T)).astype(np.float32) * 0.3)
        sos = make_sos(bs)
        y = sosfilt_coupled(sos, x)
        assert y.shape == x.shape
        for i in range(bs):
            ref = scipy.signal.sosfilt(
                np.asarray(sos, np.float64)[i], np.asarray(x, np.float64)[i]
            )
            np.testing.assert_allclose(np.asarray(y)[i], ref, atol=5e-4)

    def test_gradients_finite_and_match_scan(self):
        bs, T = 2, 640
        x = jnp.asarray(RNG.standard_normal((bs, 1, T)).astype(np.float32) * 0.3)
        sos = make_sos(bs)
        g_c = jax.grad(lambda s, z: jnp.mean(sosfilt_coupled(s, z) ** 2), argnums=(0, 1))(sos, x)
        g_s = jax.grad(lambda s, z: jnp.mean(sosfilt_exact(s, z) ** 2), argnums=(0, 1))(sos, x)
        assert all(bool(jnp.isfinite(g).all()) for g in g_c)
        np.testing.assert_allclose(np.asarray(g_c[1]), np.asarray(g_s[1]), atol=1e-3)
        scale = np.abs(np.asarray(g_s[0])).max()
        np.testing.assert_allclose(
            np.asarray(g_c[0]) / scale, np.asarray(g_s[0]) / scale, atol=1e-2
        )

    def test_effect_layer_plumbing(self):
        import dasp_tpu as D

        bs, T = 2, 1024
        x = jnp.asarray(RNG.standard_normal((bs, 2, T)).astype(np.float32) * 0.3)
        gains = jnp.asarray(RNG.uniform(-6, 6, (bs, 10)).astype(np.float32))
        y_c = jax.jit(
            lambda x, g: D.graphic_eq(x, SR, g, filter_method="coupled")
        )(x, gains)
        y_f = D.graphic_eq(x, SR, gains, filter_method="fsm")
        assert bool(jnp.isfinite(y_c).all())
        # fsm and coupled are both tight here -> must agree closely
        np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_f), atol=5e-3)

    def test_unstable_section_stabilized(self):
        sec = jnp.array([[[1.0, 0.0, 0.0, 1.0, -2.1, 1.05]]])
        x = jnp.asarray(RNG.standard_normal((1, 1, 4096)).astype(np.float32) * 0.25)
        assert bool(jnp.isfinite(sosfilt_coupled(sec, x)).all())


class TestScanCombinePrecision:
    def test_no_default_precision_dots_in_lowering(self):
        # the CPU backend computes fp32 dots regardless of the precision
        # attribute, so a numeric test cannot catch someone dropping
        # precision=HIGHEST from the scan combines (the TPU NaN-at-training-
        # scale regression). Assert on the lowered HLO instead: every
        # dot_general in the blockmat/exact paths (forward AND backward)
        # must carry HIGHEST precision.
        import re

        sos = make_sos(2)
        x = jnp.zeros((2, 1, 1024))

        def grad_fn(fn):
            return jax.grad(lambda s, z: jnp.mean(fn(s, z) ** 2), argnums=(0, 1))

        for fn in (sosfilt_blockmat, sosfilt_exact, sosfilt_coupled,
                   grad_fn(sosfilt_blockmat), grad_fn(sosfilt_exact),
                   grad_fn(sosfilt_coupled)):
            txt = jax.jit(fn).lower(sos, x).as_text()
            dots = re.findall(r"stablehlo\.dot_general.*", txt)
            offender = [d for d in dots if "precision = [HIGHEST, HIGHEST]" not in d]
            assert not offender, f"{fn}: non-HIGHEST dot_general:\n{offender[0][:200]}"


class TestCoupledFuzz:
    """Property-fuzz the coupled realization (and its sequence-sharded
    path) against float64 scipy over random stable cascades including
    near-unit-circle poles (VERDICT r1 #5). Calibrated worst-case
    relative error over poles up to r=0.9995 is ~3e-5; assert 2e-4."""

    def _random_sos(self, rng, n_sec):
        secs = []
        for _ in range(n_sec):
            r = rng.uniform(0.9, 0.9995)
            th = rng.uniform(0.01, np.pi - 0.01)
            rz = rng.uniform(0.3, 1.0)
            tz = rng.uniform(0, np.pi)
            b0 = rng.uniform(0.1, 2.0)
            secs.append([b0, -2 * rz * np.cos(tz) * b0, rz * rz * b0,
                         1.0, -2 * r * np.cos(th), r * r])
        return np.asarray(secs, np.float32)[None]

    @pytest.mark.parametrize("n_sec", [1, 3, 5])
    def test_coupled_vs_scipy_f64(self, n_sec):
        rng = np.random.default_rng(100 + n_sec)
        T = 8192
        fn = jax.jit(sosfilt_coupled)
        for _ in range(3):
            sos = self._random_sos(rng, n_sec)
            x = rng.standard_normal((1, 1, T)).astype(np.float32) * 0.25
            y_ref = scipy.signal.sosfilt(
                sos[0].astype(np.float64), x[0, 0].astype(np.float64))
            scale = max(np.abs(y_ref).max(), 1e-3)
            y = np.asarray(fn(jnp.asarray(sos), jnp.asarray(x)))[0, 0]
            assert np.abs(y - y_ref).max() / scale < 2e-4

    def test_sharded_coupled_vs_scipy_f64(self):
        """The seq_axis_name path: recurrence split over an 8-device mesh
        still matches float64 scipy at the same tolerance."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from dasp_tpu.parallel import make_mesh, sharded_sosfilt_coupled

        mesh = make_mesh((1, 8))
        rng = np.random.default_rng(77)
        T = 8192
        fn = jax.jit(lambda s, x: sharded_sosfilt_coupled(s, x, mesh))
        for _ in range(3):
            sos = self._random_sos(rng, 4)
            x = rng.standard_normal((1, 1, T)).astype(np.float32) * 0.25
            y_ref = scipy.signal.sosfilt(
                sos[0].astype(np.float64), x[0, 0].astype(np.float64))
            scale = max(np.abs(y_ref).max(), 1e-3)
            y = np.asarray(fn(jnp.asarray(sos), jnp.asarray(x)))[0, 0]
            assert np.abs(y - y_ref).max() / scale < 2e-4


class TestStabilizeSos:
    def test_stable_sections_untouched(self):
        sos = make_sos(2)
        np.testing.assert_array_equal(np.asarray(stabilize_sos(sos)), np.asarray(sos))

    def test_unstable_section_clamped_and_finite(self):
        # hand-built unstable denominator (pole outside the unit circle)
        bs, T = 1, 8192
        sec = jnp.array([[[1.0, 0.0, 0.0, 1.0, -2.1, 1.05]]])  # |a1| > 1 + a2
        out = stabilize_sos(sec)
        a1, a2 = float(out[0, 0, 4]), float(out[0, 0, 5])
        assert abs(a2) < 1.0 and abs(a1) <= 1.0 + a2
        x = jnp.asarray(RNG.standard_normal((bs, 1, T)).astype(np.float32) * 0.25)
        for fn in (sosfilt_blockmat, sosfilt_exact):
            y = fn(sec, x)  # stabilize=True default
            assert bool(jnp.isfinite(y).all()), fn.__name__
        # and without stabilization the exact recursion genuinely diverges
        y_raw = sosfilt_exact(sec, x, stabilize=False)
        assert not bool(jnp.isfinite(y_raw).all())


class TestCompressorBlockSmoother:
    def test_compressor_block_smoother(self):
        import dasp_tpu as D

        bs, T = 2, 4096
        x = jnp.asarray(RNG.standard_normal((bs, 2, T)).astype(np.float32) * 0.5)
        f = lambda v: jnp.full((bs,), v)  # noqa: E731
        kw = dict(threshold_db=f(-24.0), ratio=f(4.0), attack_ms=f(10.0),
                  release_ms=f(60.0), knee_db=f(6.0), makeup_gain_db=f(0.0))
        y_b = D.compressor(x, SR, **kw, smoother="block")
        y_e = D.compressor(x, SR, **kw, smoother="attack_only")
        np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_e), atol=1e-4)


class TestLtiAffineScan:
    """Direct tests of the custom-VJP cross-block LTI scan (ops.iir).

    The custom backward (adjoint recurrence with A^T) must reproduce the
    gradients generic reverse-mode AD computes through the raw
    associative scan — see ops/iir.py:lti_affine_scan.
    """

    def _naive(self, A, u):
        vs, v = [], np.zeros((u.shape[0], 2))
        for i in range(u.shape[1]):
            v = np.einsum("rij,rj->ri", A, v) + u[:, i]
            vs.append(v)
        return np.stack(vs, axis=1)

    def test_forward_matches_naive_loop(self):
        from dasp_tpu.ops.iir import lti_affine_scan

        R, n = 3, 17
        A = 0.9 * np.linalg.qr(RNG.standard_normal((R, 2, 2)))[0]  # stable rotations
        u = RNG.standard_normal((R, n, 2)).astype(np.float32)
        v = lti_affine_scan(jnp.asarray(A, jnp.float32), jnp.asarray(u))
        np.testing.assert_allclose(
            np.asarray(v), self._naive(A.astype(np.float64), u), atol=1e-5
        )

    def test_vjp_matches_generic_ad(self):
        from dasp_tpu.ops.iir import _lti_scan_value, lti_affine_scan

        R, n = 4, 33
        A = jnp.asarray(
            0.85 * np.linalg.qr(RNG.standard_normal((R, 2, 2)))[0], jnp.float32
        )
        u = jnp.asarray(RNG.standard_normal((R, n, 2)).astype(np.float32))
        # scalarize with fixed weights so grads cover every output index
        w = jnp.asarray(RNG.standard_normal((R, n, 2)).astype(np.float32))

        def loss(fn):
            return lambda A, u: jnp.sum(w * fn(A, u))

        gA, gu = jax.grad(loss(lti_affine_scan), argnums=(0, 1))(A, u)
        rA, ru = jax.grad(loss(_lti_scan_value), argnums=(0, 1))(A, u)
        np.testing.assert_allclose(np.asarray(gA), np.asarray(rA), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gu), np.asarray(ru), atol=1e-5)
