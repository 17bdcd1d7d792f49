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
import scipy.signal

from dasp_tpu.ops import sosfilt_blockmat, sosfilt_exact
from dasp_tpu.ops.biquad import biquad
from dasp_tpu.ops.iir import stabilize_sos

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

        for fn in (sosfilt_blockmat, sosfilt_exact, grad_fn(sosfilt_blockmat),
                   grad_fn(sosfilt_exact)):
            txt = jax.jit(fn).lower(sos, x).as_text()
            dots = re.findall(r"stablehlo\.dot_general.*", txt)
            offender = [d for d in dots if "precision = [HIGHEST, HIGHEST]" not in d]
            assert not offender, f"{fn}: non-HIGHEST dot_general:\n{offender[0][:200]}"


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
