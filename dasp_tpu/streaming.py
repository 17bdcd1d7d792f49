"""Stateful chunk-by-chunk processing for low-latency serving.

The offline effects (:mod:`dasp_tpu.functional`) render whole clips.
Production/serving instead pushes fixed-size chunks through a jitted
step function with carried state — this module provides that layer for
every stateful effect, built on the block-state IIR machinery
(``ops.iir.sosfilt_blockmat`` / ``sosfilt_coupled`` ``zi``/``zf``
support) and FFT-convolution history. The reference has no streaming
story at all (its effects are offline tensor functions); this is a
TPU-serving addition, not a port.

Every ``*_stream`` function is pure: ``(x_chunk, state) -> (y_chunk,
state)`` — jit/vmap/lax.scan compatible, and processing a signal chunk
by chunk reproduces the offline effect to fp32 roundoff
(tests/test_streaming.py asserts it per effect). ``state=None`` starts
from rest; chunk lengths must be multiples of the IIR block length
(128 by default — 2.9 ms at 44.1 kHz).

Example (streaming EQ + compressor chain)::

    step = jax.jit(functools.partial(
        streaming.parametric_eq_stream, sample_rate=sr, params=p))
    state = None
    for chunk in chunks:
        y, state = step(chunk, state=state)

Memoryless effects (gain, distortion, panner, widener, bus) need no
state — call the offline functions on each chunk directly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from . import functional as F
from .ops.fft_filter import next_pow2
from .ops.fir import fft_conv_causal
from .ops.iir import (
    embed_first_order_sos,
    onepole_ba,
    sosfilt_blockmat,
    sosfilt_coupled,
)

__all__ = [
    "sosfilt_stream",
    "parametric_eq_stream",
    "graphic_eq_stream",
    "compressor_stream",
    "expander_stream",
    "reverb_stream_init",
    "reverb_stream",
]


def sosfilt_stream(
    sos: jnp.ndarray,
    x: jnp.ndarray,
    zi: Optional[jnp.ndarray] = None,
    filter_method: str = "coupled",
    block: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One streaming step of an exact biquad cascade.

    Args:
        sos: (bs, n_sections, 6), a0 normalized to 1. Must stay fixed
            for the lifetime of a stream (state is realization-specific).
        x: chunk (bs, ..., T); T must be a multiple of ``block``.
        zi: carried state from the previous step (None = from rest).
        filter_method: "coupled" (default — tightest fp32 accuracy, see
            ops.iir.sosfilt_coupled) or "block".
        block: intra-block length of the underlying formulation.

    Returns:
        (y, zf): filtered chunk and the state to pass to the next step.
    """
    if filter_method == "coupled":
        return sosfilt_coupled(sos, x, block=block, zi=zi, return_zf=True)
    if filter_method == "block":
        return sosfilt_blockmat(sos, x, block=block, zi=zi, return_zf=True)
    raise ValueError(
        f"Unknown filter_method: {filter_method!r}. Expected 'coupled' or 'block'."
    )


def parametric_eq_stream(
    x: jnp.ndarray,
    sample_rate: float,
    *params,
    zi: Optional[jnp.ndarray] = None,
    filter_method: str = "coupled",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming 6-band parametric EQ (same 18 params as the offline
    :func:`dasp_tpu.functional.parametric_eq`)."""
    sos = F.parametric_eq_sos(x.shape[0], x.dtype, sample_rate, *params)
    return sosfilt_stream(sos, x, zi=zi, filter_method=filter_method)


def graphic_eq_stream(
    x: jnp.ndarray,
    sample_rate: float,
    band_gains_db,
    zi: Optional[jnp.ndarray] = None,
    filter_method: str = "coupled",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming 10-band octave graphic EQ. The sub-100 Hz bands are the
    coupled realization's sweet spot — keep the default method."""
    sos = F.graphic_eq_sos(x.shape[0], x.dtype, sample_rate, band_gains_db)
    return sosfilt_stream(sos, x, zi=zi, filter_method=filter_method)


def _dynamics_stream(
    x, sample_rate, threshold_db, ratio, attack_ms, release_ms,
    knee_db, makeup_gain_db, eps, zi, mode,
):
    bs = x.shape[0]
    dtype = x.dtype
    threshold_db = F._param(threshold_db, bs, dtype)
    ratio = F._param(ratio, bs, dtype)
    attack_ms = F._param(attack_ms, bs, dtype)
    release_ms = F._param(release_ms, bs, dtype)
    knee_db = F._param(knee_db, bs, dtype)
    makeup_gain_db = F._param(makeup_gain_db, bs, dtype)

    _, x_db, alpha_a, _ = F._dynamics_common(
        x, sample_rate, attack_ms, release_ms, eps
    )
    g_c = F.static_gain_computer(x_db, threshold_db, ratio, knee_db, mode)

    # exact attack-only one-pole smoother (the offline smoother="block"
    # path) with carried state
    b, a = onepole_ba(alpha_a.reshape(bs, 1).astype(dtype))
    sec = embed_first_order_sos(b, a)[:, None, :]
    g_smooth, zf = sosfilt_blockmat(sec, g_c, zi=zi, return_zf=True)

    y = x * F.db_to_linear(g_smooth + makeup_gain_db)
    return y, zf


def compressor_stream(
    x: jnp.ndarray,
    sample_rate: float,
    threshold_db,
    ratio,
    attack_ms,
    release_ms,
    knee_db,
    makeup_gain_db,
    eps: float = 1e-8,
    zi: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming feed-forward compressor.

    Matches the offline :func:`dasp_tpu.functional.compressor` with
    ``smoother="block"`` (exact attack-only one-pole — the recursion the
    reference's FSM approximates) and ``lookahead_samples=0``; the
    sidechain/static curve are memoryless, so only the smoother's
    one-pole state is carried. State shape: (bs, 1, 1, 4).
    """
    return _dynamics_stream(
        x, sample_rate, threshold_db, ratio, attack_ms, release_ms,
        knee_db, makeup_gain_db, eps, zi, "compressor",
    )


def expander_stream(
    x: jnp.ndarray,
    sample_rate: float,
    threshold_db,
    ratio,
    attack_ms,
    release_ms,
    knee_db,
    makeup_gain_db,
    eps: float = 1e-8,
    zi: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming downward expander (see :func:`compressor_stream`)."""
    return _dynamics_stream(
        x, sample_rate, threshold_db, ratio, attack_ms, release_ms,
        knee_db, makeup_gain_db, eps, zi, "expander",
    )


def reverb_stream_init(
    sample_rate: float,
    band_gains: jnp.ndarray,
    band_decays: jnp.ndarray,
    mix,
    key,
    *,
    num_samples: int = 65536,
    num_bandpass_taps: int = 1023,
    noise_mode: str = "frequency",
    chunk_len: Optional[int] = None,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Start a reverberation stream: draw the stereo filtered-noise IR
    ONCE (explicit PRNG key), transform it ONCE, and allocate the
    convolution history.

    Args:
        band_gains / band_decays: (bs, 12) arrays of (0, 1) values (the
            offline effect's 24 band parameters, stacked).
        mix: wet/dry mix on (0, 1), shape (bs,) or scalar.
        key: PRNG key for the noise draw.
        chunk_len: expected per-step chunk length T. Sizes the
            overlap-save FFT at next_pow2(K - 1 + T); default supports
            any T up to ~K with the same spectrum.

    Returns:
        Opaque state dict for :func:`reverb_stream`.
    """
    bs = band_gains.shape[0]
    ir = F.noise_shaped_ir(
        sample_rate, band_gains, band_decays,
        num_samples=num_samples, num_bandpass_taps=num_bandpass_taps,
        key=key, noise_mode=noise_mode, dtype=dtype,
    )
    n_fft = next_pow2(num_samples - 1 + (chunk_len or num_samples))
    return {
        "ir": ir,
        "ir_rfft": jnp.fft.rfft(ir, n_fft, axis=-1),
        "hist": jnp.zeros((bs, 2, num_samples - 1), dtype),
        "mix": F._param(mix, bs, dtype),
    }


def reverb_stream(
    x: jnp.ndarray, state: Dict[str, Any]
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """One streaming step of the filtered-noise reverberation.

    Args:
        x: chunk (bs, 1 or 2, T). Mono is duplicated to stereo like the
            offline effect.
        state: from :func:`reverb_stream_init` / the previous step.

    Returns:
        (y, state): wet/dry-mixed stereo chunk (bs, 2, T) and new state.
    """
    if x.shape[1] == 1:
        x = jnp.tile(x, (1, 2, 1))
    hist = state["hist"]
    K = state["ir"].shape[-1]
    seg = jnp.concatenate([hist, x], axis=-1)
    ir_rfft = state.get("ir_rfft")
    n_fft = 2 * (ir_rfft.shape[-1] - 1) if ir_rfft is not None else 0
    if n_fft >= seg.shape[-1]:
        # overlap-save with the spectrum transformed once at init:
        # alias-free for outputs >= K-1 as long as n_fft >= K-1+T
        wet_full = jnp.fft.irfft(
            jnp.fft.rfft(seg, n_fft, axis=-1) * ir_rfft, n_fft, axis=-1)
        wet = wet_full[..., K - 1 : K - 1 + x.shape[-1]]
    else:  # oversized chunk for the precomputed spectrum: exact fallback
        wet = fft_conv_causal(seg, state["ir"])[..., hist.shape[-1]:]
    new_hist = seg[..., seg.shape[-1] - (K - 1):]
    y = (1.0 - state["mix"]) * x + state["mix"] * wet
    return y, {**state, "hist": new_hist}
