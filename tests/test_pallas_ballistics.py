"""Pallas true-ballistics kernel tests (interpreter mode; on real TPU the
kernel runs (8, 131072) in 5.3 ms fwd / 7.2 ms fwd+bwd — the lax.scan
'exact' mode is latency-bound sample-by-sample)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dasp_tpu as D
from dasp_tpu.ops import ballistics_pallas
from dasp_tpu.ops.iir import ballistics_smooth

RNG = np.random.default_rng(9)
SR = 44100


def make_g(bs=2, T=700):
    return jnp.asarray(-np.abs(RNG.standard_normal((bs, 1, T))).astype(np.float32))


class TestBallisticsPallas:
    def test_bitwise_matches_exact_scan(self):
        g = make_g()
        aa = jnp.full((2, 1, 1), 0.9)
        ar = jnp.full((2, 1, 1), 0.99)
        y_p = ballistics_pallas(g, aa, ar, time_block=256, interpret=True)
        y_e = ballistics_smooth(g, aa, ar, mode="exact")
        np.testing.assert_array_equal(np.asarray(y_p), np.asarray(y_e))

    def test_gradients_match_scan_autodiff(self):
        g = make_g()
        aa = jnp.full((2,), 0.9)
        ar = jnp.full((2,), 0.99)

        def loss(fn):
            def inner(g, aa, ar):
                return jnp.mean(fn(g, aa.reshape(2, 1, 1), ar.reshape(2, 1, 1)) ** 2)
            return inner

        f_p = loss(lambda g, a, r: ballistics_pallas(g, a, r, time_block=256, interpret=True))
        f_e = loss(lambda g, a, r: ballistics_smooth(g, a, r, mode="exact"))
        gp = jax.grad(f_p, argnums=(0, 1, 2))(g, aa, ar)
        ge = jax.grad(f_e, argnums=(0, 1, 2))(g, aa, ar)
        for a, b in zip(gp, ge):
            np.testing.assert_allclose(
                np.asarray(a).ravel(), np.asarray(b).ravel(), atol=1e-5
            )

    def test_unaligned_rows_and_time(self):
        g = make_g(bs=3, T=1000)  # 3 rows (pad to 128 lanes), 1000 samples
        aa = jnp.full((3, 1, 1), 0.85)
        ar = jnp.full((3, 1, 1), 0.995)
        y_p = ballistics_pallas(g, aa, ar, time_block=256, interpret=True)
        y_e = ballistics_smooth(g, aa, ar, mode="exact")
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_e), atol=1e-7)

    def test_compressor_exact_pallas_smoother(self):
        x = jnp.asarray(RNG.standard_normal((2, 2, 2048)).astype(np.float32) * 0.3)
        kw = dict(
            threshold_db=jnp.full((2,), -24.0), ratio=jnp.full((2,), 4.0),
            attack_ms=jnp.full((2,), 10.0), release_ms=jnp.full((2,), 60.0),
            knee_db=jnp.full((2,), 6.0), makeup_gain_db=jnp.full((2,), 0.0),
        )
        y_p = D.compressor(x, SR, **kw, smoother="exact_pallas")
        y_e = D.compressor(x, SR, **kw, smoother="exact")
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_e), atol=1e-6)

    def test_release_actually_matters(self):
        """Unlike the reference (attack-only), release_ms changes the output."""
        x = jnp.asarray(RNG.standard_normal((1, 1, 4096)).astype(np.float32) * 0.5)
        kw = dict(
            threshold_db=jnp.full((1,), -24.0), ratio=jnp.full((1,), 8.0),
            attack_ms=jnp.full((1,), 5.0), knee_db=jnp.full((1,), 3.0),
            makeup_gain_db=jnp.full((1,), 0.0),
        )
        y_fast = D.compressor(x, SR, **kw, release_ms=jnp.full((1,), 10.0),
                              smoother="exact_pallas")
        y_slow = D.compressor(x, SR, **kw, release_ms=jnp.full((1,), 100.0),
                              smoother="exact_pallas")
        assert float(jnp.abs(y_fast - y_slow).max()) > 1e-4
