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

import jax
import jax.numpy as jnp

from .fft4step import fft_mul_mxu, prefer_fft4
from .fft_filter import next_fast_len, next_pow2

__all__ = ["fft_conv_full", "fft_conv_causal", "fft_correlate_valid", "ola_conv_causal"]


def _fft_mul(x: jnp.ndarray, h: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    if prefer_fft4(n_fft):
        # long transforms on TPU: 4-step Cooley-Tukey with MXU matmul
        # stages beats the XLA fft lowering (see ops/fft4step.py)
        return fft_mul_mxu(x, h, n_fft)
    X = jnp.fft.rfft(x, n_fft, axis=-1)
    H = jnp.fft.rfft(h, n_fft, axis=-1)
    return jnp.fft.irfft(X * H, n_fft, axis=-1)


def fft_conv_full(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Full linear convolution of ``x`` and ``h`` along the last axis.

    Output length is ``x.shape[-1] + h.shape[-1] - 1``. Leading axes
    broadcast (e.g. x (bs, ch, T) with h (ch, K)).
    """
    T, K = x.shape[-1], h.shape[-1]
    n_fft = next_fast_len(T + K - 1)
    return _fft_mul(x, h, n_fft)[..., : T + K - 1]


def fft_conv_causal(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Causal convolution: the first ``T`` samples of the full convolution.

    Equivalent to the reference's left-pad + direct-conv pattern
    (dasp_pytorch/functional.py:570-572): y[n] = sum_k h[k] * x[n-k].
    """
    T = x.shape[-1]
    n_fft = next_fast_len(T + h.shape[-1] - 1)
    return _fft_mul(x, h, n_fft)[..., :T]


def ola_conv_causal(x: jnp.ndarray, h: jnp.ndarray, block: int | None = None) -> jnp.ndarray:
    """Overlap-save causal convolution: bounded FFT size regardless of T.

    The single-FFT path (:func:`fft_conv_causal`) allocates a
    next_pow2(T + K) complex spectrum — ~2x the signal in memory. For very
    long audio this blocks the time axis: each block of ``block`` samples
    is convolved with an FFT of next_pow2(block + K - 1) using the K-1
    trailing samples of the previous block as history (classic
    overlap-save). Memory is O(block + K) independent of T, and the block
    loop is a ``lax.scan`` (sequential in T/block, parallel within).

    Equivalent to ``fft_conv_causal`` to fp32 roundoff. T must not be
    smaller than ``block`` (it is padded up to a multiple).

    Args:
        x: signal (..., T).
        h: impulse response (..., K), broadcastable against x.
        block: samples per block (default: 2 * next_pow2(K), a good
            efficiency point).

    Returns:
        Causal convolution, shape of x.
    """
    T, K = x.shape[-1], h.shape[-1]
    if block is None:
        block = 2 * next_pow2(K)
    n_fft = next_pow2(block + K - 1)

    pad_t = (-T) % block
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad_t)])
    n_blocks = xp.shape[-1] // block

    H = jnp.fft.rfft(h, n_fft, axis=-1)
    lead = x.shape[:-1]
    hist0 = jnp.zeros(lead + (K - 1,), x.dtype)

    # blocks-first layout for the scan
    xb = jnp.moveaxis(xp.reshape(lead + (n_blocks, block)), -2, 0)

    def step(hist, blk):
        seg = jnp.concatenate([hist, blk], axis=-1)  # (..., K-1+block)
        y = jnp.fft.irfft(jnp.fft.rfft(seg, n_fft, axis=-1) * H, n_fft, axis=-1)
        out = y[..., K - 1 : K - 1 + block]
        # explicit start index: -(K-1) with K == 1 is -0 and would select
        # the WHOLE segment instead of an empty history
        new_hist = seg[..., seg.shape[-1] - (K - 1):]
        return new_hist, out

    _, yb = jax.lax.scan(step, hist0, xb)
    y = jnp.moveaxis(yb, 0, -2).reshape(lead + (n_blocks * block,))
    return y[..., :T]


def fft_correlate_valid(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """'Valid' cross-correlation: y[n] = sum_k h[k] * x[n+k].

    This is torch/lax ``conv1d`` semantics with no padding — the operation
    the reference uses to band-limit the reverb noise
    (dasp_pytorch/functional.py:551-556). Output length ``T - K + 1``.
    """
    T, K = x.shape[-1], h.shape[-1]
    n_fft = next_fast_len(T + K - 1)
    # correlation with h == convolution with reversed h
    y = _fft_mul(x, jnp.flip(h, axis=-1), n_fft)
    return y[..., K - 1 : T]
