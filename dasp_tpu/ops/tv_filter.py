"""Time-varying linear filtering in the frequency domain (WOLA).

The reference framework has no time-varying filters at all (every
dasp_pytorch effect is LTI per call); this op class enables the
modulation-filter family — phaser, auto-wah — the same way the FSM
(frequency-sampling method, dasp_pytorch/functional.py:372-380) enables
its static filters: evaluate the filter as a frequency response and
apply it by FFT, never running a sample-serial recursion.

Design (TPU-first):

  * The signal is cut into Hann-windowed frames (gather-free strided
    framing — the same trick as ``utils.loss._frame``: static slices of
    a block-reshaped array; an index gather would run on the scalar
    core).
  * Each frame is zero-padded to ``n_fft`` and multiplied by THAT
    frame's complex response ``H[i]`` — one batched rFFT/irFFT pair
    over (bs*chs*n_frames, n_fft), dense vector work XLA fuses well.
  * Frames are overlap-added at ``hop``. Because ``hop | n_fft``, the
    OLA is ``n_fft/hop`` static pad-and-add shifts of a block-reshaped
    array — pure copies, no scatter (TPU scatters serialize).

With the analysis window satisfying COLA at ``hop`` this is EXACT
linear convolution per frame (the response's impulse response must
decay within ``n_fft - frame_size`` samples — same truncation contract
as the FSM), crossfaded between frames by the window. A constant
``H[i] = H`` reproduces time-invariant FIR filtering to roundoff; a
per-frame ``H[i]`` gives a smoothly interpolated time-varying filter,
which is the textbook WOLA implementation of LFO-modulated effects.

Everything is jit/vmap/grad compatible; gradients flow to ``H`` (and
through it to whatever parameters designed the response) and to ``x``.
"""

from __future__ import annotations

import math

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from . import dft

__all__ = [
    "tv_frame_count",
    "tv_frame_centers",
    "tv_freq_filter",
    "tv_stft",
    "tv_istft",
    "tv_analysis_window",
]


def tv_analysis_window(frame_size: int, hop: int) -> np.ndarray:
    """The COLA-normalized periodic Hann window :func:`tv_stft` applies
    (float32 numpy). ``sum(w**2)`` is the Parseval normalizer for power
    measurements on the frame spectra (see ``functional.dynamic_eq``)."""
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame_size) / frame_size)
    cola = frame_size / (2.0 * hop)
    return (win / cola).astype(np.float32)


def tv_frame_count(seq_len: int, frame_size: int, hop: int) -> int:
    """Number of frames :func:`tv_freq_filter` uses for a length-T signal.

    Frames start at ``i*hop - (frame_size - hop)`` (the first frames hang
    off the left edge so every sample gets full COLA window coverage) and
    the last frame must reach the final sample.
    """
    return math.ceil((seq_len + frame_size - hop) / hop)


def tv_frame_centers(seq_len: int, frame_size: int, hop: int) -> np.ndarray:
    """Center time (in samples, float64 numpy) of each frame.

    These are the times at which a modulation effect should sample its
    LFO / envelope when building the per-frame responses, expressed in
    the coordinates of the input signal (frame 0's center is *negative*
    when ``frame_size > 2*hop`` — it hangs off the left edge).
    """
    n = tv_frame_count(seq_len, frame_size, hop)
    starts = np.arange(n, dtype=np.float64) * hop - (frame_size - hop)
    return starts + frame_size / 2.0


def tv_freq_filter(
    x: jnp.ndarray,
    H: jnp.ndarray,
    frame_size: int,
    hop: int,
) -> jnp.ndarray:
    """Apply a per-frame frequency response to overlapping frames of x.

    Args:
        x: input audio, shape (bs, chs, T).
        H: complex frequency response per frame, shape
            (bs, n_frames, n_bins) with ``n_bins = n_fft // 2 + 1`` and
            ``n_frames = tv_frame_count(T, frame_size, hop)``. The FFT
            size ``n_fft = 2 * (n_bins - 1)`` must be a multiple of
            ``hop`` and at least ``2 * frame_size`` (room for the
            response's impulse tail — same truncation contract as the
            FSM static filters).
        frame_size: analysis frame length (static). Must be a multiple
            of ``2 * hop`` so the periodic Hann window is COLA at hop.
        hop: frame hop (static).

    Returns:
        Filtered audio, shape (bs, chs, T).
    """
    n_bins = H.shape[-1]
    n_fft = 2 * (n_bins - 1)
    n_frames = tv_frame_count(x.shape[-1], frame_size, hop)
    if H.shape[0] != x.shape[0] or H.shape[1] != n_frames:
        raise ValueError(
            f"H has shape {H.shape}; expected ({x.shape[0]}, {n_frames}, "
            f"n_bins) for seq_len={x.shape[-1]}, frame_size={frame_size}, "
            f"hop={hop}."
        )
    X = tv_stft(x, frame_size, hop, n_fft)
    Y = X * H[:, None].astype(X.dtype)
    return tv_istft(Y, x.shape[-1], frame_size, hop)


def tv_stft(x: jnp.ndarray, frame_size: int, hop: int, n_fft: int,
            use_dft=None) -> jnp.ndarray:
    """Windowed analysis frames of ``x``, transformed: the first half of
    :func:`tv_freq_filter` (see its contract for the framing/COLA rules).

    Args:
        x: input audio, shape (bs, chs, T).
        frame_size: analysis frame length (static), multiple of ``2*hop``.
        hop: frame hop (static).
        n_fft: FFT size — ``>= 2*frame_size`` (impulse-tail room when the
            spectrum will be multiplied by a response) and a multiple of
            ``hop`` (so :func:`tv_istft`'s overlap-add stays gather-free).

    Returns:
        Complex spectra, shape (bs, chs, n_frames, n_fft//2 + 1), with
        ``n_frames = tv_frame_count(T, frame_size, hop)``. The frames
        carry the COLA-normalized periodic Hann window:
        ``tv_istft(tv_stft(x, ...), T, ...) == x`` to roundoff.
    """
    bs, chs, T = x.shape
    n_frames = tv_frame_count(T, frame_size, hop)
    if frame_size % (2 * hop) != 0:
        raise ValueError(
            f"frame_size ({frame_size}) must be a multiple of 2*hop "
            f"({2 * hop}) for COLA."
        )
    if n_fft < 2 * frame_size or n_fft % hop != 0:
        raise ValueError(
            f"n_fft ({n_fft}) must be >= 2*frame_size ({2 * frame_size}) "
            f"and a multiple of hop ({hop})."
        )

    left = frame_size - hop
    pad_right = (n_frames - 1) * hop + frame_size - (T + left)
    xp = jnp.pad(x, ((0, 0), (0, 0), (left, pad_right)))

    # gather-free strided framing (see utils.loss._frame)
    g = math.gcd(frame_size, hop)
    hop_b, len_b = hop // g, frame_size // g
    n_blocks = xp.shape[-1] // g
    xb = xp.reshape(bs, chs, n_blocks, g)
    parts = [
        lax.slice_in_dim(
            xb, k, k + (n_frames - 1) * hop_b + 1, stride=hop_b, axis=-2
        )
        for k in range(len_b)
    ]
    frames = jnp.concatenate(parts, axis=-1)  # (bs, chs, n_frames, L)

    # periodic Hann: COLA with constant frame_size / (2*hop) at this hop
    frames = frames * jnp.asarray(tv_analysis_window(frame_size, hop))

    if dft.prefer_dft(n_fft) if use_dft is None else use_dft:
        # small transform on TPU: two MXU matmuls beat the fft lowering,
        # and the matmul framing skips the zero-pad to n_fft entirely
        re, im = dft.rdft(frames, n_fft)
        return jax.lax.complex(re, im)
    return jnp.fft.rfft(frames, n_fft, axis=-1)  # (bs, chs, n_frames, n_bins)


def tv_istft(Y: jnp.ndarray, seq_len: int, frame_size: int, hop: int,
             use_dft=None) -> jnp.ndarray:
    """Inverse of :func:`tv_stft`: irFFT + overlap-add at ``hop`` — the
    second half of :func:`tv_freq_filter`.

    Args:
        Y: complex spectra, shape (bs, chs, n_frames, n_bins).
        seq_len: output length T (the analysis input's length).
        frame_size / hop: as passed to :func:`tv_stft`.

    Returns:
        Audio, shape (bs, chs, T).
    """
    bs, chs, n_frames, n_bins = Y.shape
    n_fft = 2 * (n_bins - 1)
    if dft.prefer_dft(n_fft) if use_dft is None else use_dft:
        yf = dft.irdft(jnp.real(Y), jnp.imag(Y), n_fft)
    else:
        yf = jnp.fft.irfft(Y, n_fft, axis=-1)  # (bs, chs, n_frames, n_fft)

    # overlap-add at hop: n_fft/hop static diagonal shifts of the
    # block-reshaped frames — pads + adds, no scatter (TPU scatters
    # serialize; static pads lower to copies)
    nchunks = n_fft // hop
    yc = yf.reshape(bs, chs, n_frames, nchunks, hop)
    out = sum(
        jnp.pad(yc[:, :, :, k], ((0, 0), (0, 0), (k, nchunks - 1 - k), (0, 0)))
        for k in range(nchunks)
    )
    y = out.reshape(bs, chs, (n_frames + nchunks - 1) * hop)
    left = frame_size - hop
    return y[..., left : left + seq_len]
