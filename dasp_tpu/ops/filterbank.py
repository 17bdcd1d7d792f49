"""Octave-band FIR filterbank design.

Reference: dasp_pytorch/signal.py:42-92 (``octave_band_filterbank``). The
reference re-runs scipy's ``firwin`` on the host on EVERY reverb call —
a per-call host round-trip. Filter design depends only on two static
values (num_taps, sample_rate), so here the bank is designed once on the
host, cached, and handed to JAX as a constant that folds into the jaxpr.
Inside jit there is zero host work.

The taps are time-flipped like the reference (signal.py:66,:80,:86) so a
correlation-style convolution applies the filter as true convolution.
(firwin taps are symmetric, so the flip is numerically a no-op, but it is
kept for exact layout parity.)
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

__all__ = ["octave_band_filterbank", "OCTAVE_BAND_CENTERS", "NUM_OCTAVE_BANDS"]

# Octave band centre frequencies (Hz) — reference signal.py:44-55.
OCTAVE_BAND_CENTERS = (31.5, 63.0, 125.0, 250.0, 500.0, 1000.0, 2000.0, 4000.0, 8000.0, 16000.0)
NUM_OCTAVE_BANDS = len(OCTAVE_BAND_CENTERS) + 2  # + lowpass @12 Hz + highpass @18 kHz


@lru_cache(maxsize=8)
def _design_filterbank(num_taps: int, sample_rate: float) -> np.ndarray:
    """Host-side windowed-sinc design of the 12-band filterbank.

    Matches scipy.signal.firwin defaults (Hamming window, scaled) as used
    by the reference. Returns float32 ndarray of shape (12, 1, num_taps).
    """
    import scipy.signal  # host-only, design-time

    filts = []

    # lowest band: lowpass at 12 Hz (reference signal.py:60-64)
    filt = scipy.signal.firwin(num_taps, 12, fs=sample_rate)
    filts.append(filt[::-1])

    # octave bandpass bands (reference signal.py:69-81)
    for fc in OCTAVE_BAND_CENTERS:
        f_min = fc / np.sqrt(2)
        f_max = fc * np.sqrt(2)
        f_max = np.clip(f_max, a_min=0, a_max=(sample_rate / 2) * 0.999)
        filt = scipy.signal.firwin(num_taps, [f_min, f_max], fs=sample_rate, pass_zero=False)
        filts.append(filt[::-1])

    # highest band: highpass at 18 kHz (reference signal.py:84-87)
    filt = scipy.signal.firwin(num_taps, 18000, fs=sample_rate, pass_zero=False)
    filts.append(filt[::-1])

    bank = np.stack(filts, axis=0).astype(np.float32)  # (12, num_taps)
    return np.ascontiguousarray(bank[:, None, :])  # (12, 1, num_taps)


def octave_band_filterbank(num_taps: int, sample_rate: float) -> jnp.ndarray:
    """12-band FIR filterbank: lowpass@12Hz, 10 octave bands 31.5 Hz–16 kHz,
    highpass@18kHz.

    Args:
        num_taps: number of FIR taps (must be odd; static).
        sample_rate: audio sample rate in Hz (static).

    Returns:
        jnp array of shape (12, 1, num_taps), float32, taps time-flipped.
    """
    assert num_taps % 2 == 1, "num_taps must be odd"
    return jnp.asarray(_design_filterbank(int(num_taps), float(sample_rate)))
