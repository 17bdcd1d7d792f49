"""FFT-based FIR convolution primitives.

The reference applies its 65536-tap reverb impulse responses with a
*direct* ``conv1d`` (dasp_pytorch/functional.py:570-572) — O(T*K) work.
On TPU the right primitive is frequency-domain convolution: O((T+K)log(T+K))
with the FFT mapped onto XLA's native TPU FFT. At the reference's scales
(T=131072, K=65536) this is the single biggest speedup in the library.

All functions operate along the last axis, broadcast over leading axes,
and are jit/vmap/grad compatible with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

from .fft_filter import next_pow2

__all__ = ["fft_conv_full", "fft_conv_causal", "fft_correlate_valid"]


def _fft_mul(x: jnp.ndarray, h: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    X = jnp.fft.rfft(x, n_fft, axis=-1)
    H = jnp.fft.rfft(h, n_fft, axis=-1)
    return jnp.fft.irfft(X * H, n_fft, axis=-1)


def fft_conv_full(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Full linear convolution of ``x`` and ``h`` along the last axis.

    Output length is ``x.shape[-1] + h.shape[-1] - 1``. Leading axes
    broadcast (e.g. x (bs, ch, T) with h (ch, K)).
    """
    T, K = x.shape[-1], h.shape[-1]
    n_fft = next_pow2(T + K - 1)
    return _fft_mul(x, h, n_fft)[..., : T + K - 1]


def fft_conv_causal(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Causal convolution: the first ``T`` samples of the full convolution.

    Equivalent to the reference's left-pad + direct-conv pattern
    (dasp_pytorch/functional.py:570-572): y[n] = sum_k h[k] * x[n-k].
    """
    T = x.shape[-1]
    n_fft = next_pow2(T + h.shape[-1] - 1)
    return _fft_mul(x, h, n_fft)[..., :T]


def fft_correlate_valid(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """'Valid' cross-correlation: y[n] = sum_k h[k] * x[n+k].

    This is torch/lax ``conv1d`` semantics with no padding — the operation
    the reference uses to band-limit the reverb noise
    (dasp_pytorch/functional.py:551-556). Output length ``T - K + 1``.
    """
    T, K = x.shape[-1], h.shape[-1]
    n_fft = next_pow2(T + K - 1)
    # correlation with h == convolution with reversed h
    y = _fft_mul(x, jnp.flip(h, axis=-1), n_fft)
    return y[..., K - 1 : T]
