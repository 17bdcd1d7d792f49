"""Frequency-domain audio losses (auraloss-equivalent, pure JAX).

The reference's examples depend on ``auraloss.freq.STFTLoss`` and
``auraloss.freq.MultiResolutionSTFTLoss`` (blind_estimation.py:141,
style_transfer.py:341, auto_eq.py:252-262, virtual_analog.py:288-300).
This module provides the same losses as pure functions over
``(batch, channels, samples)`` arrays: spectral convergence + log/linear
magnitude terms over one or many STFT resolutions, with optional
A-weighted perceptual weighting.

Design note: auraloss implements ``perceptual_weighting`` as a
time-domain A-weighting FIR prefilter; here the default applies the
A-weighting curve directly to the magnitude spectrograms per rFFT bin —
the same weighting where it matters (the magnitude terms) with no extra
convolution. Pass ``auraloss_compat=True`` for auraloss's exact
semantics: the 101-tap FIR prefilter (bilinear analog A-weighting ->
freqz -> least-squares FIR fit), per-item spectral convergence, and the
(120, 240, 50) default hops. Golden-tested against an independent torch
reimplementation of the auraloss pipeline (tests/make_fixtures.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "stft_magnitude",
    "stft_loss",
    "multi_resolution_stft_loss",
    "a_weighting",
    "a_weighting_fir_taps",
    "fir_prefilter",
]


def _mag_from_power(power: jnp.ndarray, eps: float, smooth_floor: bool) -> jnp.ndarray:
    """|S| from |S|^2 with a log-safety floor.

    ``smooth_floor=True`` uses sqrt(power + eps): continuous everywhere,
    so fp-level input differences (e.g. the sequence-sharded framing in
    parallel.sharded) give fp-level gradient differences. The hard
    clamp sqrt(clip(power, eps)) — auraloss's exact semantics, kept for
    ``auraloss_compat`` — has a gradient knife-edge at power == eps
    where one side is 0 and the other 0.5/sqrt(eps).
    """
    if smooth_floor:
        return jnp.sqrt(power + eps)
    return jnp.sqrt(jnp.clip(power, eps))


def _rdft_mag(frames: jnp.ndarray, n: int, eps: float,
              smooth_floor: bool = False) -> jnp.ndarray:
    """rfft magnitude via explicit DFT matmuls (ops.dft; no XLA fft ops).

    Two reasons to prefer matmuls over the fft op:

    * TPU: XLA lowers small batched FFTs to a long chain of
      reshape/fusion sub-ops well off the hardware roofline, while the
      MXU eats a dense fp32 (frames x basis) matmul — measured FASTER
      than the fft path for the loss's transform sizes (+3.7% whole
      training step on a v5e; see ops.dft.DFT_MATMUL_MAX_N).
    * XLA-CPU's fft thunk RET_CHECKs row-major operands, but near
      shard_map regions (sp-sharded training on the virtual CPU mesh)
      layout assignment feeds the loss FFTs transposed layouts from sp
      all-gathers — and `with_layout_constraint` cannot force interior
      op layouts. Matmuls are layout-agnostic.

    fp32 (Precision.HIGHEST) throughout — bf16 accumulation would poison
    log-magnitudes of quiet bins.
    """
    from ..ops.dft import rdft

    re, im = rdft(frames, n)
    return _mag_from_power(re**2 + im**2, eps, smooth_floor)


def _prefer_dft(fft_size: int, cpu_fft_workaround: bool) -> bool:
    """Backend-aware default for the DFT-matmul spectral path."""
    from ..ops.dft import prefer_dft

    return prefer_dft(fft_size, cpu_fallback=cpu_fft_workaround)


def _hann(win_length: int, dtype) -> jnp.ndarray:
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)  # periodic Hann
    # cast from f64 once (not through f32): f64 losses keep full precision
    return jnp.asarray(w, dtype=dtype)


def _frame(x: jnp.ndarray, frame_size: int, hop: int) -> jnp.ndarray:
    """Overlapping frames of (..., T) -> (..., n_frames, frame_size).

    Gather-free: view the signal as contiguous blocks of
    g = gcd(frame_size, hop) samples, then assemble frames from
    ``frame_size // g`` static strided slices of the block array. Static
    slices + concatenate lower to plain copies on TPU — an index-array
    gather here runs on the scalar core (~50x slower), and
    conv_general_dilated_patches does O(frame_size^2) work.
    """
    import math as _math

    T = x.shape[-1]
    n_frames = 1 + (T - frame_size) // hop
    g = _math.gcd(frame_size, hop)
    hop_b = hop // g
    len_b = frame_size // g

    n_blocks = T // g
    xb = x[..., : n_blocks * g].reshape(x.shape[:-1] + (n_blocks, g))

    # frame i = blocks [i*hop_b, i*hop_b + len_b); slice k gives block
    # i*hop_b + k for all i at once with stride hop_b
    parts = [
        jax.lax.slice_in_dim(xb, k, k + (n_frames - 1) * hop_b + 1, stride=hop_b, axis=-2)
        for k in range(len_b)
    ]
    frames = jnp.concatenate(parts, axis=-1)  # (..., n_frames, frame_size)
    return frames


def stft_magnitude(
    x: jnp.ndarray,
    fft_size: int,
    hop_size: int,
    win_length: int,
    eps: float = 1e-8,
    cpu_fft_workaround: bool = False,
    smooth_floor: bool = False,
    use_dft: Optional[bool] = None,
) -> jnp.ndarray:
    """Magnitude STFT of (..., T) along the last axis.

    Centre-padded (reflect), periodic Hann window, magnitude floored at
    sqrt(eps) for log safety (``smooth_floor`` picks the continuous
    sqrt(power + eps) form over auraloss's hard clamp — see
    :func:`_mag_from_power`). ``use_dft=None`` picks the spectral path
    per backend: DFT matmuls on the MXU for TPU at sizes <=
    ``_DFT_MATMUL_MAX_N`` (measurably faster than XLA's TPU fft), rfft
    otherwise. Returns (..., n_frames, fft_size // 2 + 1).
    """
    pad = fft_size // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = _frame(x, fft_size, hop_size)

    win = _hann(win_length, x.dtype)
    if win_length < fft_size:
        lpad = (fft_size - win_length) // 2
        win = jnp.pad(win, (lpad, fft_size - win_length - lpad))
    frames = frames * win

    if use_dft is None:
        use_dft = _prefer_dft(fft_size, cpu_fft_workaround)
    if use_dft:
        return _rdft_mag(frames, fft_size, eps, smooth_floor)
    spec = jnp.fft.rfft(frames, fft_size, axis=-1)
    return _mag_from_power(spec.real**2 + spec.imag**2, eps, smooth_floor)


def a_weighting_fir_taps(sample_rate: float, ntaps: int = 101) -> np.ndarray:
    """A-weighting FIR prefilter taps, designed the way auraloss designs
    them (auraloss/perceptual.py FIRFilter(filter_type="aw")): the IEC
    61672 analog A-weighting transfer function is discretized with the
    bilinear transform, its response sampled with freqz at 512 points,
    and a linear-phase ``ntaps``-tap FIR is least-squares fit to it.

    Host-side design (scipy), cached per (sample_rate, ntaps). Taps are
    symmetric, so correlation == convolution.
    """
    return _a_weighting_fir_taps_cached(float(sample_rate), int(ntaps))


def _a_weighting_fir_taps_impl(sample_rate: float, ntaps: int) -> np.ndarray:
    import scipy.signal

    f1, f2, f3, f4 = 20.598997, 107.65265, 737.86223, 12194.217
    a1000 = 1.9997
    num = [(2 * np.pi * f4) ** 2 * (10 ** (a1000 / 20)), 0, 0, 0, 0]
    den = np.polymul(
        [1, 4 * np.pi * f4, (2 * np.pi * f4) ** 2],
        [1, 4 * np.pi * f1, (2 * np.pi * f1) ** 2],
    )
    den = np.polymul(np.polymul(den, [1, 2 * np.pi * f3]), [1, 2 * np.pi * f2])
    b, a = scipy.signal.bilinear(num, den, fs=sample_rate)
    w_iir, h_iir = scipy.signal.freqz(b, a, worN=512, fs=sample_rate)
    taps = scipy.signal.firls(ntaps, w_iir, abs(h_iir), fs=sample_rate)
    return taps.astype(np.float32)


_AW_TAP_CACHE: dict = {}


def _a_weighting_fir_taps_cached(sample_rate: float, ntaps: int) -> np.ndarray:
    key = (sample_rate, ntaps)
    if key not in _AW_TAP_CACHE:
        _AW_TAP_CACHE[key] = _a_weighting_fir_taps_impl(sample_rate, ntaps)
    return _AW_TAP_CACHE[key]


def fir_prefilter(x: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """'Same'-padded FIR prefilter of (..., T) along the last axis —
    torch ``conv1d(padding=ntaps//2)`` semantics (cross-correlation; the
    A-weighting taps are symmetric so it equals convolution)."""
    from jax import lax

    ntaps = len(taps)
    lead = x.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    lhs = x.reshape(n, 1, x.shape[-1])
    rhs = jnp.asarray(taps, x.dtype).reshape(1, 1, ntaps)
    out = lax.conv_general_dilated(
        lhs, rhs, (1,), [(ntaps // 2, ntaps // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        # TPU convs default to bf16; the prefiltered signal feeds
        # 1/mag-amplified log-magnitude terms, so the advertised 1e-4
        # auraloss parity needs full-precision accumulation
        precision=lax.Precision.HIGHEST,
    )
    return out.reshape(x.shape)


def a_weighting(freqs_hz: np.ndarray) -> np.ndarray:
    """A-weighting curve (linear amplitude) per frequency (IEC 61672)."""
    f = np.maximum(np.asarray(freqs_hz, dtype=np.float64), 1e-6)
    f2 = f**2
    ra = (12194.0**2 * f2**2) / (
        (f2 + 20.6**2)
        * np.sqrt((f2 + 107.7**2) * (f2 + 737.9**2))
        * (f2 + 12194.0**2)
    )
    a_db = 20.0 * np.log10(ra) + 2.0
    return (10.0 ** (a_db / 20.0)).astype(np.float32)


def stft_loss(
    y_hat: jnp.ndarray,
    y: jnp.ndarray,
    fft_size: int = 1024,
    hop_size: int = 256,
    win_length: int = 1024,
    w_sc: float = 1.0,
    w_log_mag: float = 1.0,
    w_lin_mag: float = 0.0,
    perceptual_weighting: bool = False,
    sample_rate: Optional[float] = None,
    eps: float = 1e-8,
    cpu_fft_workaround: bool = False,
    auraloss_compat: bool = False,
) -> jnp.ndarray:
    """Single-resolution STFT loss (auraloss ``STFTLoss`` defaults).

    loss = w_sc * spectral_convergence + w_log_mag * L1(log|S|)
         + w_lin_mag * L1(|S|)

    ``auraloss_compat=True`` reproduces auraloss exactly: perceptual
    weighting as the time-domain A-weighting FIR prefilter (not per-bin
    magnitude weighting) and spectral convergence computed per item
    (Frobenius over the last two axes, no denominator eps, mean over
    items) instead of one global norm ratio.
    """
    if perceptual_weighting and auraloss_compat:
        assert sample_rate is not None, "perceptual_weighting requires sample_rate"
        taps = a_weighting_fir_taps(sample_rate)
        y_hat = fir_prefilter(y_hat, taps)
        y = fir_prefilter(y, taps)

    # native mode uses the continuous magnitude floor; compat keeps
    # auraloss's exact hard clamp (golden-pinned)
    smooth = not auraloss_compat
    mag_hat = stft_magnitude(y_hat, fft_size, hop_size, win_length, eps,
                             cpu_fft_workaround, smooth_floor=smooth)
    mag = stft_magnitude(y, fft_size, hop_size, win_length, eps,
                         cpu_fft_workaround, smooth_floor=smooth)

    if perceptual_weighting and not auraloss_compat:
        assert sample_rate is not None, "perceptual_weighting requires sample_rate"
        freqs = np.fft.rfftfreq(fft_size, 1.0 / sample_rate)
        w = jnp.asarray(a_weighting(freqs))
        mag_hat = mag_hat * w
        mag = mag * w

    loss = jnp.asarray(0.0, y.dtype)
    if w_sc:
        if auraloss_compat:
            num = jnp.sqrt(jnp.sum((mag - mag_hat) ** 2, axis=(-2, -1)))
            den = jnp.sqrt(jnp.sum(mag**2, axis=(-2, -1)))
            sc = jnp.mean(num / den)
        else:
            sc = jnp.sqrt(jnp.sum((mag - mag_hat) ** 2)) / (jnp.sqrt(jnp.sum(mag**2)) + eps)
        loss = loss + w_sc * sc
    if w_log_mag:
        loss = loss + w_log_mag * jnp.mean(jnp.abs(jnp.log(mag) - jnp.log(mag_hat)))
    if w_lin_mag:
        loss = loss + w_lin_mag * jnp.mean(jnp.abs(mag - mag_hat))
    return loss


def multi_resolution_stft_loss(
    y_hat: jnp.ndarray,
    y: jnp.ndarray,
    fft_sizes: Sequence[int] = (1024, 2048, 512),
    hop_sizes: Optional[Sequence[int]] = None,
    win_lengths: Sequence[int] = (600, 1200, 240),
    w_sc: float = 1.0,
    w_log_mag: float = 1.0,
    w_lin_mag: float = 0.0,
    perceptual_weighting: bool = False,
    sample_rate: Optional[float] = None,
    cpu_fft_workaround: bool = False,
    auraloss_compat: bool = False,
) -> jnp.ndarray:
    """Multi-resolution STFT loss; average of :func:`stft_loss` over the
    resolutions.

    Default hops are fft/4 (the torch.stft convention) because
    power-of-two hops let the gather-free TPU framing use gcd-sized
    blocks — fft/hop static slices instead of hundreds.
    ``auraloss_compat=True`` switches the default hops to auraloss's
    (120, 240, 50) and uses auraloss's exact per-term semantics (see
    :func:`stft_loss`) — bit-matching the loss the reference's examples
    train with (ref style_transfer.py:341, auto_eq.py:252-262), at the
    cost of a slower-to-compile framing.
    """
    if hop_sizes is None:
        hop_sizes = (120, 240, 50) if auraloss_compat else tuple(n // 4 for n in fft_sizes)
    total = jnp.asarray(0.0, y.dtype)
    for n_fft, hop, win in zip(fft_sizes, hop_sizes, win_lengths):
        total = total + stft_loss(
            y_hat, y, n_fft, hop, win,
            w_sc=w_sc, w_log_mag=w_log_mag, w_lin_mag=w_lin_mag,
            perceptual_weighting=perceptual_weighting, sample_rate=sample_rate,
            cpu_fft_workaround=cpu_fft_workaround, auraloss_compat=auraloss_compat,
        )
    return total / len(fft_sizes)


# the configuration used by auto_eq.py:252-262 and virtual_analog.py:288-300
auto_eq_mrstft = partial(
    multi_resolution_stft_loss,
    fft_sizes=(128, 256, 512, 1024, 2048, 4096, 8192),
    hop_sizes=(64, 128, 256, 512, 1024, 2048, 4096),
    win_lengths=(128, 256, 512, 1024, 2048, 4096, 8192),
    w_sc=0.0,
    w_log_mag=1.0,
    w_lin_mag=1.0,
    perceptual_weighting=True,
    sample_rate=44100,
)
