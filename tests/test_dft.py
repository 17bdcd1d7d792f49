"""Unit tests for ops.dft — the MXU DFT-as-matmul spectral path.

The module is the TPU fast path for every small transform in the
framework (MR-STFT loss, WOLA tv_stft/tv_istft, sp-sharded loss); these
tests pin it against numpy's FFT ground truth on CPU, including the
zero-pad-free framing (frame_len < n_fft) and the odd-length inverse.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasp_tpu.ops.dft import DFT_MATMUL_MAX_N, irdft, prefer_dft, rdft

RNG = np.random.default_rng(11)


class TestRdft:
    @pytest.mark.parametrize("frame_len,n_fft", [(64, 64), (64, 128), (240, 512), (1024, 1024)])
    def test_matches_numpy_rfft(self, frame_len, n_fft):
        x = RNG.standard_normal((3, frame_len)).astype(np.float32)
        re, im = jax.jit(lambda x: rdft(x, n_fft))(jnp.asarray(x))
        ref = np.fft.rfft(x, n_fft, axis=-1)
        np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-4)
        np.testing.assert_allclose(np.asarray(im), ref.imag, atol=1e-4)

    def test_leading_batch_dims(self):
        x = RNG.standard_normal((2, 3, 4, 96)).astype(np.float32)
        re, im = jax.jit(lambda x: rdft(x, 128))(jnp.asarray(x))
        assert re.shape == im.shape == (2, 3, 4, 65)
        ref = np.fft.rfft(x, 128, axis=-1)
        np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-4)


class TestIrdft:
    @pytest.mark.parametrize("n_fft", [64, 128, 129, 255])  # odd n: Nyquist-less inverse
    def test_matches_numpy_irfft(self, n_fft):
        X = (RNG.standard_normal((2, n_fft // 2 + 1))
             + 1j * RNG.standard_normal((2, n_fft // 2 + 1))).astype(np.complex64)
        y = jax.jit(lambda re, im: irdft(re, im, n_fft))(
            jnp.asarray(X.real), jnp.asarray(X.imag))
        ref = np.fft.irfft(X, n_fft, axis=-1)
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)

    def test_default_n_infers_even(self):
        X = np.fft.rfft(RNG.standard_normal((2, 128)).astype(np.float32), axis=-1)
        y = irdft(jnp.asarray(X.real.astype(np.float32)),
                  jnp.asarray(X.imag.astype(np.float32)))
        assert y.shape == (2, 128)

    def test_roundtrip(self):
        x = RNG.standard_normal((4, 200)).astype(np.float32)
        re, im = rdft(jnp.asarray(x), 256)
        y = irdft(re, im, 256)
        np.testing.assert_allclose(np.asarray(y[:, :200]), x, atol=1e-4)
        np.testing.assert_allclose(np.asarray(y[:, 200:]), 0.0, atol=1e-4)


class TestGradsAndPolicy:
    def test_grad_matches_fft_path(self):
        x = jnp.asarray(RNG.standard_normal((2, 300)).astype(np.float32))

        def mag_dft(x):
            re, im = rdft(x, 512)
            return jnp.sum(jnp.sqrt(re**2 + im**2 + 1e-8))

        def mag_fft(x):
            X = jnp.fft.rfft(x, 512, axis=-1)
            return jnp.sum(jnp.sqrt(X.real**2 + X.imag**2 + 1e-8))

        g1 = jax.jit(jax.grad(mag_dft))(x)
        g2 = jax.jit(jax.grad(mag_fft))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)

    def test_prefer_dft_cpu_policy(self):
        # CI runs on CPU: matmuls only on explicit fallback request there
        assert jax.default_backend() == "cpu"
        assert not prefer_dft(1024)
        assert prefer_dft(1024, cpu_fallback=True)
        assert DFT_MATMUL_MAX_N >= 2048
