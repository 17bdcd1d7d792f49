"""Frequency-sampling-method (FSM) filtering primitives.

TPU-native reimplementation of the reference's FSM machinery
(reference: dasp_pytorch/signal.py:7-166). The FSM approximates an IIR
filter by sampling its rational transfer function on the rFFT grid and
applying it as a (long) FIR filter in the frequency domain. Everything
here is pure jax.numpy: static shapes, no host work, fully
jit/vmap/grad compatible, and the FFTs map directly onto XLA's TPU FFT.

Design differences vs the reference (deliberate, TPU-first):
  * ``fft_sosfreqz`` evaluates all biquad sections with ONE batched rFFT
    and a product-reduction over the section axis instead of a Python
    loop of per-section FFTs (reference signal.py:25-31). Same math,
    one fused XLA op.
  * n_fft is computed from static trace-time shapes, so it constant
    folds under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "next_pow2",
    "fsm_fft_size",
    "fft_freqz",
    "fft_sosfreqz",
    "freqdomain_fir",
    "lfilter_via_fsm",
    "sosfilt_via_fsm",
    "fsm_onepole_step_response",
]


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (n must be a static Python int)."""
    n = int(n)
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def next_fast_len(n: int) -> int:
    """Smallest 2^k or 3*2^k >= n — FFT sizes XLA-TPU decomposes without
    Bluestein. At the reverb conv's shapes (T+K-1 = 196607) this is 25%
    fewer transform points than next_pow2 (196608 vs 262144)."""
    n = int(n)
    p2 = next_pow2(n)
    p3 = 3 * next_pow2(-(-n // 3))
    return min(p2, p3) if p3 >= n else p2


def fsm_fft_size(seq_len: int) -> int:
    """FFT size used by the FSM: 2**ceil(log2(2*T - 1)).

    Matches reference signal.py:109,150 so FSM outputs are bit-comparable.
    """
    return next_pow2(2 * int(seq_len) - 1)


def fft_freqz(b: jnp.ndarray, a: jnp.ndarray, n_fft: int = 512) -> jnp.ndarray:
    """Complex frequency response H = rfft(b) / rfft(a) of a rational filter.

    Reference: dasp_pytorch/signal.py:7-11.

    Args:
        b: numerator coefficients, shape (..., N).
        a: denominator coefficients, shape (..., N).
        n_fft: FFT size (static).

    Returns:
        H with shape (..., n_fft // 2 + 1), complex.
    """
    B = jnp.fft.rfft(b, n_fft, axis=-1)
    A = jnp.fft.rfft(a, n_fft, axis=-1)
    return B / A


def fft_sosfreqz(sos: jnp.ndarray, n_fft: int = 512) -> jnp.ndarray:
    """Overall response of a cascade of second-order sections.

    Reference: dasp_pytorch/signal.py:14-32 (which loops over sections in
    Python). Here the `(bs, n_sections, 6)` tensor is transformed with a
    single batched rFFT and reduced with a product over the section axis —
    one XLA kernel instead of `n_sections` FFT dispatches.

    Args:
        sos: second-order sections, shape (bs, n_sections, 6) laid out as
            [b0, b1, b2, a0, a1, a2].
        n_fft: FFT size (static).

    Returns:
        H with shape (bs, n_fft // 2 + 1), complex.
    """
    assert sos.shape[-1] == 6, "second-order sections must have 6 coefficients"
    B = jnp.fft.rfft(sos[..., :3], n_fft, axis=-1)  # (bs, n_sections, n_bins)
    A = jnp.fft.rfft(sos[..., 3:], n_fft, axis=-1)
    return jnp.prod(B / A, axis=-2)


def freqdomain_fir(x: jnp.ndarray, H: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Apply a frequency-domain FIR filter: irfft(rfft(x) * H).

    Reference: dasp_pytorch/signal.py:35-39.
    """
    X = jnp.fft.rfft(x, n_fft, axis=-1)
    Y = X * H.astype(X.dtype)
    return jnp.fft.irfft(Y, n_fft, axis=-1)


def lfilter_via_fsm(x: jnp.ndarray, b: jnp.ndarray, a: jnp.ndarray | None = None) -> jnp.ndarray:
    """Approximate an IIR filter via the frequency sampling method.

    The filter is applied along the final dimension of ``x``.
    Reference: dasp_pytorch/signal.py:95-133.

    Args:
        x: time-domain signal, shape (bs, 1, T) (or generally (bs, ..., T)).
        b: numerator coefficients, shape (bs, N).
        a: optional denominator coefficients, shape (bs, N). When ``None``
           the numerator spectrum is used directly (pure FIR).

    Returns:
        Filtered signal with the same shape as ``x``.
    """
    seq_len = x.shape[-1]
    n_fft = fsm_fft_size(seq_len)

    b = b.astype(x.dtype)
    if a is None:
        H = jnp.fft.rfft(b, n_fft, axis=-1)
    else:
        H = fft_freqz(b, a.astype(x.dtype), n_fft=n_fft)

    # insert broadcast dims so H (bs, n_bins) lines up with x (bs, ..., T)
    H = H.reshape(H.shape[0], *([1] * (x.ndim - 2)), H.shape[-1])

    y = freqdomain_fir(x, H, n_fft)
    return y[..., :seq_len]


def fsm_onepole_step_response(alpha: jnp.ndarray, seq_len: int) -> jnp.ndarray:
    """Exact FSM response of the attack one-pole to a length-T ones block.

    ``lfilter_via_fsm`` with b=[1-a, 0], a=[1, -a] is circular convolution
    with the time-aliased impulse response h[n] = (1-a) a^n / (1-a^N)
    (frequency sampling <=> time aliasing), so its output for the input
    u = [1]*T ++ [0]*(N-T) has the closed form (ratio of geometric sums)

        y[n] = (1 - a^(n+1) + a^(N-T+1+n) - a^N) / (1 - a^N),  n in [0, T)

    with N the FSM FFT size for T. Used to DC-split the compressor's
    gain-curve smoothing: filtering ``g_c - mean`` through the (fp32) FFT
    and adding back ``mean * step`` removes the large-DC rounding term of
    the big FFT while being mathematically identical (FSM is linear).

    Args:
        alpha: one-pole coefficient, any shape broadcastable against a
            trailing time axis (e.g. (bs, 1, 1)).
        seq_len: T, the cropped output length (static).

    Returns:
        Step response of shape ``alpha.shape[:-1] + (seq_len,)`` (alpha's
        trailing singleton axis broadcast over time).
    """
    n_fft = fsm_fft_size(seq_len)
    n = jnp.arange(seq_len, dtype=alpha.dtype)
    a_n1 = alpha ** (n + 1.0)
    a_tail = alpha ** (n_fft - seq_len + 1.0 + n)
    a_N = alpha ** float(n_fft)
    return (1.0 - a_n1 + a_tail - a_N) / (1.0 - a_N)


def sosfilt_via_fsm(sos: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Approximate a biquad cascade via the frequency sampling method.

    The filter is applied along the final dimension of ``x``.
    Reference: dasp_pytorch/signal.py:136-166.

    Args:
        sos: coefficients with shape (bs, n_sections, 6).
        x: time-domain signal with shape (bs, ..., T).

    Returns:
        Filtered signal with the same shape as ``x``.
    """
    seq_len = x.shape[-1]
    n_fft = fsm_fft_size(seq_len)

    H = fft_sosfreqz(sos.astype(x.dtype), n_fft=n_fft)
    H = H.reshape(H.shape[0], *([1] * (x.ndim - 2)), H.shape[-1])

    y = freqdomain_fir(x, H, n_fft)
    return y[..., :seq_len]
