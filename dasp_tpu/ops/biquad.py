"""Differentiable filter coefficient design (Audio EQ Cookbook biquads).

TPU-native reimplementation of the reference's coefficient designers
(reference: dasp_pytorch/signal.py:169-306). Pure pointwise jnp math —
jit/vmap/grad friendly; the string ``filter_type`` is a static argument
(it selects a code path at trace time, exactly like the reference).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = [
    "biquad",
    "one_pole_butter_lowpass",
    "one_pole_butter_highpass",
    "one_pole_filter",
]

_BIQUAD_TYPES = (
    "high_shelf", "low_shelf", "peaking", "low_pass", "high_pass", "band_pass"
)


def biquad(
    gain_db: jnp.ndarray,
    cutoff_freq: jnp.ndarray,
    q_factor: jnp.ndarray,
    sample_rate: float,
    filter_type: str = "peaking",
):
    """Design an Audio-EQ-Cookbook biquad, batched.

    Reference: dasp_pytorch/signal.py:242-306. Same math: A = 10^(g/40),
    w0 = 2*pi*f/fs, alpha = sin(w0)/(2Q); coefficients normalized by a0.

    Args:
        gain_db: gain in dB, shape (bs,) or (bs, ...) — flattened to (bs, 1).
        cutoff_freq: cutoff/centre frequency in Hz, same shape rules.
        q_factor: quality factor, same shape rules.
        sample_rate: audio sample rate (Hz), static or traced scalar.
        filter_type: one of "high_shelf", "low_shelf", "peaking",
            "low_pass", "high_pass", "band_pass" (static; band_pass is
            the cookbook constant-0dB-peak form with ``gain_db``
            scaling the peak — not in the reference's five).

    Returns:
        (b, a): numerator / denominator coefficients, each shape (bs, 3).
    """
    bs = gain_db.shape[0]
    gain_db = gain_db.reshape(bs, -1)
    cutoff_freq = cutoff_freq.reshape(bs, -1)
    q_factor = q_factor.reshape(bs, -1)

    A = 10.0 ** (gain_db / 40.0)
    w0 = 2.0 * math.pi * (cutoff_freq / sample_rate)
    alpha = jnp.sin(w0) / (2.0 * q_factor)
    cos_w0 = jnp.cos(w0)
    sqrt_A = jnp.sqrt(A)

    if filter_type == "high_shelf":
        b0 = A * ((A + 1) + (A - 1) * cos_w0 + 2 * sqrt_A * alpha)
        b1 = -2 * A * ((A - 1) + (A + 1) * cos_w0)
        b2 = A * ((A + 1) + (A - 1) * cos_w0 - 2 * sqrt_A * alpha)
        a0 = (A + 1) - (A - 1) * cos_w0 + 2 * sqrt_A * alpha
        a1 = 2 * ((A - 1) - (A + 1) * cos_w0)
        a2 = (A + 1) - (A - 1) * cos_w0 - 2 * sqrt_A * alpha
    elif filter_type == "low_shelf":
        b0 = A * ((A + 1) - (A - 1) * cos_w0 + 2 * sqrt_A * alpha)
        b1 = 2 * A * ((A - 1) - (A + 1) * cos_w0)
        b2 = A * ((A + 1) - (A - 1) * cos_w0 - 2 * sqrt_A * alpha)
        a0 = (A + 1) + (A - 1) * cos_w0 + 2 * sqrt_A * alpha
        a1 = -2 * ((A - 1) + (A + 1) * cos_w0)
        a2 = (A + 1) + (A - 1) * cos_w0 - 2 * sqrt_A * alpha
    elif filter_type == "peaking":
        b0 = 1 + alpha * A
        b1 = -2 * cos_w0
        b2 = 1 - alpha * A
        a0 = 1 + (alpha / A)
        a1 = -2 * cos_w0
        a2 = 1 - (alpha / A)
    elif filter_type == "low_pass":
        b0 = (1 - cos_w0) / 2
        b1 = 1 - cos_w0
        b2 = (1 - cos_w0) / 2
        a0 = 1 + alpha
        a1 = -2 * cos_w0
        a2 = 1 - alpha
    elif filter_type == "high_pass":
        b0 = (1 + cos_w0) / 2
        b1 = -(1 + cos_w0)
        b2 = (1 + cos_w0) / 2
        a0 = 1 + alpha
        a1 = -2 * cos_w0
        a2 = 1 - alpha
    elif filter_type == "band_pass":
        # constant 0 dB peak gain (cookbook); gain_db scales the peak on
        # top so the auto-wah can push resonance hot
        b0 = A * alpha
        b1 = jnp.zeros_like(alpha)
        b2 = -A * alpha
        a0 = 1 + alpha
        a1 = -2 * cos_w0
        a2 = 1 - alpha
    else:
        raise ValueError(
            f"Invalid filter_type: {filter_type!r}. Expected one of {_BIQUAD_TYPES}."
        )

    b = jnp.stack([b0, b1, b2], axis=1).reshape(bs, -1)
    a = jnp.stack([a0, a1, a2], axis=1).reshape(bs, -1)

    # normalize so a0 == 1
    b = b.astype(gain_db.dtype) / a0
    a = a.astype(gain_db.dtype) / a0
    return b, a


def one_pole_butter_lowpass(f_c: jnp.ndarray, sample_rate: float):
    """Bilinear-transform design of a 1-pole Butterworth lowpass.

    Reference: dasp_pytorch/signal.py:169-196 (minus its debug print).

    Args:
        f_c: cutoff frequency in Hz, shape (bs,) or (bs, 1).
        sample_rate: audio sample rate (Hz).

    Returns:
        (b, a): coefficient arrays, each of shape (bs, 2).
    """
    f_c = f_c.reshape(-1, 1)
    w_d = 2.0 * math.pi * (f_c / sample_rate)  # digital frequency (rad)
    w_c = jnp.tan(w_d / 2.0)  # pre-warped analog frequency

    a0 = 1.0 + w_c
    a1 = w_c - 1.0
    b0 = w_c
    b1 = w_c

    b = jnp.concatenate([b0, b1], axis=-1)
    a = jnp.concatenate([a0, a1], axis=-1)
    return b / a0, a / a0


def one_pole_butter_highpass(f_c: jnp.ndarray, sample_rate: float):
    """Bilinear-transform design of a 1-pole Butterworth highpass.

    Companion to :func:`one_pole_butter_lowpass` (the reference never
    shipped a highpass; needed for the tone control of
    ``advanced_distortion`` described at dasp_pytorch/functional.py:99-102).

    H(s) = s / (s + wc)  →  bilinear  →  b = [1, -1]/(1+wc), a = [1, (wc-1)/(1+wc)].
    """
    f_c = f_c.reshape(-1, 1)
    w_d = 2.0 * math.pi * (f_c / sample_rate)
    w_c = jnp.tan(w_d / 2.0)

    a0 = 1.0 + w_c
    a1 = w_c - 1.0
    b0 = jnp.ones_like(w_c)
    b1 = -jnp.ones_like(w_c)

    b = jnp.concatenate([b0, b1], axis=-1)
    a = jnp.concatenate([a0, a1], axis=-1)
    return b / a0, a / a0


def one_pole_filter(cutoff_hz: jnp.ndarray, filter_type: str, sample_rate: float = 2.0):
    """Design a simple 1-pole highpass or lowpass IIR filter.

    Reference: dasp_pytorch/signal.py:199-239 (minus its debug print).

    Args:
        cutoff_hz: cutoff (normalized 0..nyquist), shape (bs,).
        filter_type: "highpass" or "lowpass" (static).
        sample_rate: sample rate of the input signal.

    Returns:
        (b, a): coefficient arrays with shape (bs, 2).
    """
    bs = cutoff_hz.shape[0]
    cutoff_hz = cutoff_hz.reshape(bs, 1)
    nyquist = sample_rate // 2

    if filter_type == "highpass":
        a1 = cutoff_hz / nyquist
    elif filter_type == "lowpass":
        a1 = -1.0 + (cutoff_hz / nyquist)
    else:
        raise ValueError(f"Invalid filter_type = {filter_type}.")

    a0 = jnp.ones((bs, 1), dtype=a1.dtype)
    b0 = 1.0 - jnp.abs(a1)
    b1 = jnp.zeros((bs, 1), dtype=a1.dtype)

    b = jnp.concatenate([b0, b1], axis=1)
    a = jnp.concatenate([a0, a1], axis=1)
    return b, a
