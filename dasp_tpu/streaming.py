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
    ballistics_smooth,
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
    "sidechain_compressor_stream",
    "noise_gate_stream",
    "de_esser_stream",
    "bitcrusher_stream",
    "transient_shaper_stream",
    "exciter_stream",
    "spectral_gate_stream",
    "dynamic_eq_stream",
    "limiter_stream",
    "reverb_stream_init",
    "reverb_stream",
    "convolution_reverb_stream_init",
    "convolution_reverb_stream",
    "delay_stream",
    "modulated_delay_stream",
    "pitch_shift_stream",
    "time_stretch_stream",
    "pitch_shift_pv_stream",
    "tremolo_stream",
    "ring_modulator_stream",
    "phaser_stream",
    "auto_wah_stream",
    "multiband_compressor_stream",
    "StreamChain",
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
    knee_db, makeup_gain_db, eps, zi, mode, smoother="block",
    detector=None,
):
    bs = x.shape[0]
    dtype = x.dtype
    threshold_db = F._param(threshold_db, bs, dtype)
    if ratio is not None:  # the limiter curve has no ratio
        ratio = F._param(ratio, bs, dtype)
    attack_ms = F._param(attack_ms, bs, dtype)
    release_ms = F._param(release_ms, bs, dtype)
    knee_db = F._param(knee_db, bs, dtype)
    makeup_gain_db = F._param(makeup_gain_db, bs, dtype)

    _, x_db, alpha_a, alpha_r = F._dynamics_common(
        x if detector is None else detector, sample_rate, attack_ms, release_ms, eps
    )
    g_c = F.static_gain_computer(x_db, threshold_db, ratio, knee_db, mode)

    if smoother == "block":
        # exact attack-only one-pole smoother (the offline
        # smoother="block" path) with carried state
        b, a = onepole_ba(alpha_a.reshape(bs, 1).astype(dtype))
        sec = embed_first_order_sos(b, a)[:, None, :]
        g_smooth, zf = sosfilt_blockmat(sec, g_c, zi=zi, return_zf=True)
    elif smoother in ("parallel", "exact"):
        # true attack/release ballistics (the offline smoother="parallel"
        # / "exact" paths) with the carried (ya, ym) envelope state
        g_smooth, zf = ballistics_smooth(
            g_c, alpha_a, alpha_r, mode=smoother, y0=zi, return_yf=True
        )
    else:
        raise ValueError(
            f"Unknown streaming smoother: {smoother!r}. "
            "Expected 'block', 'parallel' or 'exact'."
        )

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
    zi=None,
    smoother: str = "block",
) -> Tuple[jnp.ndarray, Any]:
    """Streaming feed-forward compressor.

    Matches the offline :func:`dasp_tpu.functional.compressor` at the
    same ``smoother``: ``"block"`` (default — exact attack-only
    one-pole, the recursion the reference's FSM approximates; carried
    state (bs, 1, 1, 4)), or ``"parallel"`` / ``"exact"`` (true
    attack+release ballistics; carried state is the ``(ya, ym)``
    envelope tuple — see ``ops.iir.ballistics_smooth``). Always
    ``lookahead_samples=0``; the sidechain/static curve are memoryless.
    """
    return _dynamics_stream(
        x, sample_rate, threshold_db, ratio, attack_ms, release_ms,
        knee_db, makeup_gain_db, eps, zi, "compressor", smoother,
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
    zi=None,
    smoother: str = "block",
) -> Tuple[jnp.ndarray, Any]:
    """Streaming downward expander (see :func:`compressor_stream`)."""
    return _dynamics_stream(
        x, sample_rate, threshold_db, ratio, attack_ms, release_ms,
        knee_db, makeup_gain_db, eps, zi, "expander", smoother,
    )


def sidechain_compressor_stream(
    x: jnp.ndarray,
    sample_rate: float,
    threshold_db,
    ratio,
    attack_ms,
    release_ms,
    knee_db,
    makeup_gain_db,
    eps: float = 1e-8,
    zi=None,
    smoother: str = "parallel",
    sidechain: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, Any]:
    """Streaming sidechain compressor (ducker).

    Matches the offline :func:`dasp_tpu.functional.sidechain_compressor`
    at the same ``smoother`` (see :func:`compressor_stream` for the state
    carried by each). Pass the key signal chunk as ``sidechain=`` — same
    batch/length as ``x``, channel count free.
    """
    if sidechain is None:
        raise ValueError(
            "sidechain_compressor_stream requires `sidechain` (the key "
            "signal chunk); pass it as a keyword argument."
        )
    return _dynamics_stream(
        x, sample_rate, threshold_db, ratio, attack_ms, release_ms,
        knee_db, makeup_gain_db, eps, zi, "compressor", smoother,
        detector=sidechain,
    )


def noise_gate_stream(
    x: jnp.ndarray,
    sample_rate: float,
    threshold_db,
    ratio,
    range_db,
    attack_ms,
    release_ms,
    knee_db,
    eps: float = 1e-8,
    hold_ms: float = 0.0,
    state=None,
    smoother: str = "parallel",
) -> Tuple[jnp.ndarray, Any]:
    """Streaming noise gate.

    Matches the offline :func:`dasp_tpu.functional.noise_gate` with the
    same ``smoother`` ("parallel" or "exact" — the streaming ballistics
    modes) and ``hold_ms``. Carried state is the ballistics envelope
    tuple plus the trailing ``hold`` window of the pre-smoothing gain
    curve, so the causal moving-maximum hold is seamless across chunks.
    """
    if smoother not in ("parallel", "exact"):
        raise ValueError(
            f"noise_gate_stream smoother must be 'parallel' or 'exact', "
            f"got {smoother!r}."
        )
    bs = x.shape[0]
    dtype = x.dtype
    threshold_db = F._param(threshold_db, bs, dtype)
    ratio = F._param(ratio, bs, dtype)
    range_db = F._param(range_db, bs, dtype)
    attack_ms = F._param(attack_ms, bs, dtype)
    release_ms = F._param(release_ms, bs, dtype)
    knee_db = F._param(knee_db, bs, dtype)

    if state is None:
        state = {"env": None, "hold": None}

    _, x_db, alpha_a, alpha_r = F._dynamics_common(
        x, sample_rate, attack_ms, release_ms, eps
    )
    g_c = F.static_gain_computer(x_db, threshold_db, ratio, knee_db, "expander")
    g_c = jnp.maximum(g_c, -range_db)  # F._param gave (bs, 1, 1)

    hold_samples = int(round(sample_rate * hold_ms / 1e3))
    new_state: Dict[str, Any] = {"hold": None}
    if hold_samples > 0:
        # prepend the carried tail so the causal max window sees across
        # the chunk boundary; a cold start pads with -range (gate shut,
        # matching the offline render's implicit left edge of -inf —
        # identical after flooring because g_c >= -range everywhere)
        tail = state.get("hold")
        if tail is None:
            tail = jnp.broadcast_to(-range_db, (bs, 1, hold_samples)).astype(dtype)
        g_ext = jnp.concatenate([tail, g_c], axis=-1)
        new_state["hold"] = g_ext[..., -hold_samples:]
        g_c = F._hold_max(g_ext, hold_samples)[..., hold_samples:]

    # ballistics swap — see functional.noise_gate
    g_smooth, env_f = ballistics_smooth(
        g_c, alpha_r, alpha_a, mode=smoother, y0=state.get("env"), return_yf=True
    )
    new_state["env"] = env_f
    return x * F.db_to_linear(g_smooth), new_state


def de_esser_stream(
    x: jnp.ndarray,
    sample_rate: float,
    frequency_hz,
    threshold_db,
    ratio,
    attack_ms,
    release_ms,
    knee_db,
    eps: float = 1e-8,
    mode: str = "split",
    state=None,
    smoother: str = "parallel",
    filter_method: str = "coupled",
) -> Tuple[jnp.ndarray, Any]:
    """Streaming de-esser (offline :func:`dasp_tpu.functional.de_esser`).

    Carried state: the LR4 crossover filter state (both legs batched
    into one sosfilt call, like the multiband compressor) plus the
    dynamics ballistics envelope.
    """
    if mode not in ("split", "wideband"):
        raise ValueError(f"de_esser mode must be 'split' or 'wideband', got {mode!r}.")
    bs = x.shape[0]
    dtype = x.dtype
    frequency_hz = F._param(frequency_hz, bs, dtype).reshape(bs)
    threshold_db = F._param(threshold_db, bs, dtype)
    ratio = F._param(ratio, bs, dtype)
    attack_ms = F._param(attack_ms, bs, dtype)
    release_ms = F._param(release_ms, bs, dtype)
    knee_db = F._param(knee_db, bs, dtype)

    if state is None:
        state = {"xo": None, "env": None}
    new_state: Dict[str, Any] = {}

    sos_lp, sos_hp = F.lr4_crossover_sos(frequency_hz, sample_rate, bs, dtype)
    if mode == "split":
        y2, new_state["xo"] = sosfilt_stream(
            jnp.concatenate([sos_lp, sos_hp], axis=0),
            jnp.concatenate([x, x], axis=0),
            zi=state.get("xo"), filter_method=filter_method,
        )
        low, high = y2[:bs], y2[bs:]
    else:
        high, new_state["xo"] = sosfilt_stream(
            sos_hp, x, zi=state.get("xo"), filter_method=filter_method
        )
        low = None

    _, det_db, alpha_a, alpha_r = F._dynamics_common(
        high, sample_rate, attack_ms, release_ms, eps
    )
    g_c = F.static_gain_computer(det_db, threshold_db, ratio, knee_db, "compressor")
    if smoother not in ("parallel", "exact"):
        raise ValueError(
            f"de_esser_stream smoother must be 'parallel' or 'exact', "
            f"got {smoother!r}."
        )
    g_smooth, env_f = ballistics_smooth(
        g_c, alpha_a, alpha_r, mode=smoother, y0=state.get("env"), return_yf=True
    )
    new_state["env"] = env_f
    g_lin = F.db_to_linear(g_smooth)
    y = low + high * g_lin if mode == "split" else x * g_lin
    return y, new_state


def bitcrusher_stream(
    x: jnp.ndarray,
    sample_rate: float,
    bit_depth,
    sample_rate_hz,
    mix,
    state=None,
) -> Tuple[jnp.ndarray, Any]:
    """Streaming bitcrusher (offline :func:`dasp_tpu.functional.bitcrusher`).

    Carried state: the reduced hold clock's WRAPPED fractional phase
    (``floor(n*r)`` on a float32 absolute counter would miss/duplicate
    ticks after ~2^24 samples; the fractional part carries exactly the
    information tick detection needs and never grows) and the
    currently-held sample value, so zero-order holds that span a chunk
    boundary are seamless.
    """
    import numpy as np

    bs, chs, Tc = x.shape
    dtype = x.dtype
    bit_depth = F._param(bit_depth, bs, dtype)
    sample_rate_hz = F._param(sample_rate_hz, bs, dtype)
    mix = F._param(mix, bs, dtype)

    if state is None:
        state = {"c0": jnp.zeros((bs, 1, 1), dtype),
                 "held": jnp.zeros((bs, chs, 1), dtype)}

    # same multiply-and-floor tick logic as the offline render (see
    # functional.bitcrusher), on the carried clock phase: with
    # c0 = frac(n0 * r), floor((n0+k)r + eps) - floor((n0+k-1)r + eps)
    # equals floor(c0 + k*r + eps) - floor(c0 + (k-1)*r + eps)
    from jax import lax

    r = jnp.clip(sample_rate_hz / sample_rate, 0.0, 1.0)
    k = jnp.asarray(np.arange(Tc, dtype=np.float32))[None, None, :]
    tick = jnp.floor(state["c0"] + k * r + 1e-6)
    tick_prev = jnp.concatenate(
        [jnp.floor(state["c0"] - r + 1e-6), tick[..., :-1]], axis=-1
    )
    is_tick = tick > tick_prev
    n_loc = jnp.asarray(np.arange(Tc, dtype=np.int32))[None, None, :]
    idx_local = lax.cummax(jnp.where(is_tick, n_loc, -1), axis=2)
    in_chunk = idx_local >= 0
    held = jnp.take_along_axis(
        x, jnp.broadcast_to(jnp.maximum(idx_local, 0), x.shape), axis=-1
    )
    held = jnp.where(in_chunk, held, state["held"])

    scale = 2.0 ** (bit_depth - 1.0)
    u = held * scale
    q = jnp.round(u) / scale
    y = (1.0 - mix) * x + mix * q
    c0 = state["c0"] + Tc * r
    c0 = c0 - jnp.floor(c0)
    new_state = {"c0": c0, "held": held[..., -1:]}
    return y.astype(dtype), new_state


def exciter_stream(
    x: jnp.ndarray,
    sample_rate: float,
    frequency_hz,
    drive_db,
    amount,
    zi=None,
    filter_method: str = "coupled",
) -> Tuple[jnp.ndarray, Any]:
    """One streaming step of the harmonic exciter (offline
    :func:`dasp_tpu.functional.exciter`). Carried state: the high-pass
    biquad's filter state (the waveshaper and blend are memoryless)."""
    bs = x.shape[0]
    dtype = x.dtype
    frequency_hz = F._param(frequency_hz, bs, dtype)
    drive_db = F._param(drive_db, bs, dtype)
    amount = F._param(amount, bs, dtype)

    sos = F.exciter_sos(bs, dtype, frequency_hz, sample_rate)
    high, zf = sosfilt_stream(sos, x, zi=zi, filter_method=filter_method)
    g = F.db_to_linear(drive_db)
    y = (x + amount * jnp.tanh(high * g) / g).astype(dtype)
    return y, zf


def transient_shaper_stream(
    x: jnp.ndarray,
    sample_rate: float,
    attack,
    sustain,
    output_gain_db=0.0,
    fast_attack_ms=1.0,
    slow_attack_ms=30.0,
    fast_release_ms=50.0,
    slow_release_ms=500.0,
    pre_smooth_ms=5.0,
    max_det_db=24.0,
    eps: float = 1e-8,
    state=None,
    smoother: str = "parallel",
) -> Tuple[jnp.ndarray, Any]:
    """One streaming step of the transient shaper (offline
    :func:`dasp_tpu.functional.transient_shaper`). Carried state: the
    detector pre-smoother plus the three differential ballistics
    envelopes, so onset/tail shaping crosses chunk boundaries exactly."""
    bs = x.shape[0]
    dtype = x.dtype
    att = F._param(attack, bs, dtype)
    sus = F._param(sustain, bs, dtype)
    out_db = F._param(output_gain_db, bs, dtype)

    att_det, sus_det, new_state = F._transient_detectors(
        x, sample_rate, fast_attack_ms, slow_attack_ms,
        fast_release_ms, slow_release_ms, eps, smoother, pre_smooth_ms,
        max_det_db, y0=state, return_yf=True,
    )
    gain_db = att * att_det + sus * sus_det + out_db
    y = (x * F.db_to_linear(gain_db)).astype(dtype)
    return y, new_state


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
    return _conv_stream_step(x, state)


def _conv_stream_step(
    x: jnp.ndarray, state: Dict[str, Any]
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Shared overlap-save convolution step (reverb_stream /
    convolution_reverb_stream): dry/wet mix of ``x`` against the
    carried-history convolution with the precomputed IR spectrum."""
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


def convolution_reverb_stream_init(
    ir: jnp.ndarray,
    mix,
    bs: int,
    chs: int,
    chunk_len: Optional[int] = None,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Start a user-IR convolution reverb stream (offline counterpart
    :func:`dasp_tpu.functional.convolution_reverb`): transform the IR
    once and allocate the convolution history.

    Args:
        ir: impulse response, shape (K,), (bs, K) or (bs, chs, K).
        mix: dry/wet mix on [0, 1], shape (bs,) or scalar.
        bs / chs: the stream's chunk batch/channel shape.
        chunk_len: expected per-step chunk length (sizes the
            overlap-save FFT; default supports any chunk up to ~K).

    Returns:
        Opaque state dict for :func:`convolution_reverb_stream`.
    """
    ir = jnp.asarray(ir, dtype)
    if ir.ndim == 1:
        ir = ir[None, None, :]
    elif ir.ndim == 2:
        ir = ir[:, None, :]
    K = ir.shape[-1]
    n_fft = next_pow2(K - 1 + (chunk_len or K))
    return {
        "ir": ir,
        "ir_rfft": jnp.fft.rfft(ir, n_fft, axis=-1),
        "hist": jnp.zeros((bs, chs, K - 1), dtype),
        "mix": F._param(mix, bs, dtype),
    }


def convolution_reverb_stream(
    x: jnp.ndarray, state: Dict[str, Any]
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """One streaming step of the user-IR convolution reverb. Unlike
    :func:`reverb_stream` the channel layout is the caller's (no
    mono-to-stereo duplication)."""
    return _conv_stream_step(x, state)


def limiter_stream(
    x: jnp.ndarray,
    sample_rate: float,
    threshold_db,
    attack_ms,
    release_ms,
    knee_db,
    makeup_gain_db,
    eps: float = 1e-8,
    zi=None,
    smoother: str = "parallel",
) -> Tuple[jnp.ndarray, Any]:
    """Streaming feed-forward limiter.

    Matches the offline :func:`dasp_tpu.functional.limiter` at the same
    ``smoother`` — default ``"parallel"`` (true attack+release
    ballistics, the offline limiter's own default: release behaviour is
    what makes a limiter a limiter) with the carried ``(ya, ym)``
    envelope state; ``"block"``/``"exact"`` as in
    :func:`compressor_stream`. No lookahead.
    """
    return _dynamics_stream(
        x, sample_rate, threshold_db, None, attack_ms, release_ms,
        knee_db, makeup_gain_db, eps, zi, "limiter", smoother,
    )


# ---------------------------------------------------------------------------
# time-based / modulation effects
# ---------------------------------------------------------------------------


def delay_stream(
    x: jnp.ndarray,
    sample_rate: float,
    delay_samples: int,
    feedback,
    mix,
    state: Optional[Dict[str, Any]] = None,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """One streaming step of a feedback delay (echo).

    Streaming evaluates the comb recursion ``w[n] = x[n-D] + fb·w[n-D]``
    directly over a carried delay line — the causal time-domain form of
    the closed-form frequency response the offline :func:`functional.delay`
    samples (minus its negligible circular tail). The delay must be a
    static whole number of samples here because the carried state layout
    depends on it; the offline effect keeps the continuous differentiable
    delay time for training, streaming serves the trained (rounded) value.

    Recursion across a chunk is evaluated block-parallel: samples within
    one delay period never depend on each other, so the chunk runs as
    ``ceil(T / D)`` fully vectorized blocks under ``lax.scan`` instead of
    a per-sample loop.

    Args:
        x: chunk (bs, chs, T).
        sample_rate: audio sample rate (Hz) — unused, kept for signature
            uniformity with the other streams.
        delay_samples: delay D in samples (static Python int >= 1).
        feedback: feedback on [0, 1), shape (bs,). Clamped to <= 0.999.
        mix: dry/wet mix on [0, 1], shape (bs,).
        state: from the previous step (None = from rest).

    Returns:
        (y, state): mixed chunk and the carried delay lines.
    """
    import jax

    bs, chs, T = x.shape
    dtype = x.dtype
    D = int(delay_samples)
    if D < 1:
        raise ValueError(f"delay_samples must be >= 1, got {D}")
    feedback = jnp.minimum(F._param(feedback, bs, dtype), 0.999)
    mix = F._param(mix, bs, dtype)

    if state is None:
        state = {
            "dry_hist": jnp.zeros((bs, chs, D), dtype),
            "wet_hist": jnp.zeros((bs, chs, D), dtype),
        }

    # delayed dry input for every chunk position is already known
    x_ext = jnp.concatenate([state["dry_hist"], x], axis=-1)  # (bs, chs, D+T)
    dd = x_ext[..., :T]  # x[n - D] for n in [0, T)

    n_blocks = -(-T // D)
    pad = n_blocks * D - T
    dd_p = jnp.pad(dd, ((0, 0), (0, 0), (0, pad)))
    dd_blocks = dd_p.reshape(bs, chs, n_blocks, D).transpose(2, 0, 1, 3)

    def step(carry, dd_b):  # carry: previous D wet samples
        wet_b = dd_b + feedback * carry
        return wet_b, wet_b

    _, wet_blocks = jax.lax.scan(step, state["wet_hist"], dd_blocks)
    wet = wet_blocks.transpose(1, 2, 0, 3).reshape(bs, chs, n_blocks * D)[..., :T]

    y = (1.0 - mix) * x + mix * wet
    new_state = {
        "dry_hist": x_ext[..., -D:],
        "wet_hist": jnp.concatenate([state["wet_hist"], wet], axis=-1)[..., -D:],
    }
    return y.astype(dtype), new_state


def modulated_delay_stream(
    x: jnp.ndarray,
    sample_rate: float,
    rate_hz,
    depth_ms,
    base_ms,
    mix,
    max_delay_samples: int,
    state: Optional[Dict[str, Any]] = None,
    lfo_phase: float = 0.0,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """One streaming step of the LFO-modulated fractional delay
    (chorus/flanger — offline counterpart :func:`functional.modulated_delay`).

    Carries ``max_delay_samples`` of input history, the WRAPPED LFO
    phase (see :func:`ring_modulator_stream` on why not a float
    absolute counter), and an int32 sample counter used only for the
    before-signal-start mask (exact, and the mask comparison is
    insensitive to cast rounding once past the delay span), so the
    chunked output equals the offline render.

    Args:
        x: chunk (bs, chs, T).
        max_delay_samples: static history length; must be >=
            ``ceil((base_ms + depth_ms) * sample_rate / 1000) + 1`` for
            every parameter value the stream will see.
        state: from the previous step (None = from rest: zero history,
            sample counter 0).
        Other args: as in :func:`functional.modulated_delay`.

    Returns:
        (y, state).
    """
    import numpy as np

    bs, chs, T = x.shape
    dtype = x.dtype
    L = int(max_delay_samples)
    rate_hz = F._param(rate_hz, bs, dtype)
    depth_ms = F._param(depth_ms, bs, dtype)
    base_ms = F._param(base_ms, bs, dtype)
    mix = F._param(mix, bs, dtype)

    two_pi = 2.0 * np.pi
    if state is None:
        state = {"hist": jnp.zeros((bs, chs, L), dtype),
                 "ph": jnp.full((bs, 1, 1), float(lfo_phase), dtype),
                 "n0": jnp.zeros((), jnp.int32)}

    n_local = np.arange(T, dtype=np.float32)[None, None, :]
    t_abs = state["n0"].astype(jnp.float32) + n_local  # mask only (see doc)
    lfo = 0.5 * (1.0 + jnp.sin(state["ph"] + two_pi * rate_hz * (n_local / sample_rate)))
    d = (base_ms + depth_ms * lfo) * (sample_rate / 1e3)  # samples

    x_ext = jnp.concatenate([state["hist"], x], axis=-1)  # (bs, chs, L+T)
    idx = (L + n_local) - d  # fractional read position in ext coords
    i0 = jnp.floor(idx)
    frac = idx - i0
    i0i = jnp.clip(i0, 0, L + T - 1).astype(jnp.int32)
    i1i = jnp.clip(i0 + 1.0, 0, L + T - 1).astype(jnp.int32)
    i0b = jnp.broadcast_to(i0i, (bs, chs, T))
    i1b = jnp.broadcast_to(i1i, (bs, chs, T))
    x0 = jnp.take_along_axis(x_ext, i0b, axis=-1)
    x1 = jnp.take_along_axis(x_ext, i1b, axis=-1)
    wet = x0 * (1.0 - frac) + x1 * frac
    # before the global signal start the offline effect outputs zero wet;
    # from-rest zero history reproduces that except the epsilon boundary,
    # so mask on absolute time like offline does on its read index
    wet = jnp.where(t_abs - d >= 0.0, wet, 0.0)

    y = (1.0 - mix) * x + mix * wet
    ph = jnp.mod(state["ph"] + two_pi * rate_hz * (T / sample_rate), two_pi)
    new_state = {"hist": x_ext[..., -L:], "ph": ph, "n0": state["n0"] + T}
    return y.astype(dtype), new_state


def ring_modulator_stream(
    x: jnp.ndarray,
    sample_rate: float,
    frequency_hz,
    mix,
    state: Optional[Dict[str, Any]] = None,
    lfo_phase: float = 0.0,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """One streaming step of the ring modulator (offline
    :func:`functional.ring_modulator`). The only carried state is the
    WRAPPED carrier phase (an absolute sample counter cast to float32
    would quantize after ~2^24 samples — 6.3 min at 44.1 kHz — and
    staircase the carrier; the wrapped accumulator never grows)."""
    import numpy as np

    bs, chs, T = x.shape
    dtype = x.dtype
    frequency_hz = F._param(frequency_hz, bs, dtype)
    mix = F._param(mix, bs, dtype)

    two_pi = 2.0 * np.pi
    if state is None:
        state = {"ph": jnp.full((bs, 1, 1), float(lfo_phase), dtype)}

    n_local = np.arange(T, dtype=np.float32)[None, None, :]
    carrier = jnp.sin(state["ph"] + two_pi * frequency_hz * (n_local / sample_rate))
    y = ((1.0 - mix) + mix * carrier) * x
    ph = state["ph"] + two_pi * frequency_hz * (T / sample_rate)
    ph = jnp.mod(ph, two_pi)
    return y.astype(dtype), {"ph": ph}


def pitch_shift_stream(
    x: jnp.ndarray,
    sample_rate: float,
    semitones,
    mix,
    window_ms: float = 60.0,
    state: Optional[Dict[str, Any]] = None,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """One streaming step of the dual-tap delay-line pitch shifter
    (offline counterpart :func:`functional.pitch_shift` with
    ``compensate_latency=False`` — streaming is causal, so the mean
    W/2-sample tap latency stays in the output).

    Carries W samples of input history, the WRAPPED sawtooth phase
    (a float32 absolute counter would quantize the tap phases after
    ~2^24 samples and staircase the shift; see
    :func:`ring_modulator_stream`), and an int32 counter used only for
    the before-signal-start mask — chunked output equals the
    uncompensated offline render.

    Args:
        x: chunk (bs, chs, T).
        semitones / mix: as in :func:`functional.pitch_shift`; must stay
            fixed for the lifetime of a stream (the tap phase history
            assumes a constant slope).
        window_ms: static delay-line window length (ms).
        state: from the previous step (None = from rest).

    Returns:
        (y, state).
    """
    import numpy as np

    bs, chs, T = x.shape
    dtype = x.dtype
    semitones = F._param(semitones, bs, dtype)
    mix = F._param(mix, bs, dtype)

    W = F.pitch_shift_window_samples(window_ms, sample_rate)
    if state is None:
        state = {"hist": jnp.zeros((bs, chs, W), dtype),
                 "u0": jnp.zeros((bs, 1, 1), dtype),
                 "n0": jnp.zeros((), jnp.int32)}

    n_local = np.arange(T, dtype=np.float32)[None, None, :]
    t_abs = state["n0"].astype(jnp.float32) + n_local  # mask only
    slope = 1.0 - 2.0 ** (semitones / 12.0)
    u = state["u0"] + slope * n_local / W

    x_ext = jnp.concatenate([state["hist"], x], axis=-1)  # (bs, chs, W+T)
    wet = 0.0
    for i in (0.0, 0.5):
        p = u + i
        p = p - jnp.floor(p)  # sawtooth phase in [0, 1)
        d = W * p
        idx = (W + n_local) - d  # fractional read position in ext coords
        i0 = jnp.floor(idx)
        frac = idx - i0
        i0i = jnp.clip(i0, 0, W + T - 1).astype(jnp.int32)
        i1i = jnp.clip(i0 + 1.0, 0, W + T - 1).astype(jnp.int32)
        x0 = jnp.take_along_axis(x_ext, jnp.broadcast_to(i0i, (bs, chs, T)), axis=-1)
        x1 = jnp.take_along_axis(x_ext, jnp.broadcast_to(i1i, (bs, chs, T)), axis=-1)
        tap = x0 * (1.0 - frac) + x1 * frac
        # offline zero-masks reads before the global signal start
        wet = wet + jnp.sin(np.pi * p) * jnp.where(t_abs - d >= 0.0, tap, 0.0)

    y = (1.0 - mix) * x + mix * wet
    u0 = state["u0"] + slope * (T / W)
    u0 = u0 - jnp.floor(u0)  # wrap: only the sawtooth phase matters
    new_state = {"hist": x_ext[..., -W:], "u0": u0, "n0": state["n0"] + T}
    return y.astype(dtype), new_state


def tremolo_stream(
    x: jnp.ndarray,
    sample_rate: float,
    rate_hz,
    depth,
    state: Optional[Dict[str, Any]] = None,
    lfo_phase: float = 0.0,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """One streaming step of the tremolo (offline
    :func:`functional.tremolo`). The only carried state is the WRAPPED
    LFO phase (see :func:`ring_modulator_stream` on why not an absolute
    sample counter)."""
    import numpy as np

    bs, chs, T = x.shape
    dtype = x.dtype
    rate_hz = F._param(rate_hz, bs, dtype)
    depth = F._param(depth, bs, dtype)

    two_pi = 2.0 * np.pi
    if state is None:
        state = {"ph": jnp.full((bs, 1, 1), float(lfo_phase), dtype)}

    n_local = np.arange(T, dtype=np.float32)[None, None, :]
    lfo = 0.5 * (1.0 + jnp.sin(state["ph"] + two_pi * rate_hz * (n_local / sample_rate)))
    y = x * (1.0 - depth * lfo)
    ph = jnp.mod(state["ph"] + two_pi * rate_hz * (T / sample_rate), two_pi)
    return y.astype(dtype), {"ph": ph}


def _wola_analyze(x, frame_size: int, hop: int, n_fft: int, xhist):
    """Streaming half of ``ops.tv_filter.tv_stft``: windowed frame
    spectra of a chunk given the carried ``frame_size - hop`` input
    tail. Returns ``(X, new_xhist)`` with X (bs, chs, Tc/hop, n_bins)."""
    import math as _math

    import jax
    import numpy as np

    bs, chs, Tc = x.shape
    left = frame_size - hop
    if Tc % hop != 0:
        raise ValueError(f"chunk length {Tc} must be a multiple of hop {hop}.")
    K = Tc // hop
    if xhist is None:
        xhist = jnp.zeros((bs, chs, left), x.dtype)

    x_ext = jnp.concatenate([xhist, x], axis=-1)
    g = _math.gcd(frame_size, hop)
    hop_b, len_b = hop // g, frame_size // g
    xb = x_ext.reshape(bs, chs, x_ext.shape[-1] // g, g)
    parts = [
        jax.lax.slice_in_dim(xb, k, k + (K - 1) * hop_b + 1, stride=hop_b, axis=-2)
        for k in range(len_b)
    ]
    frames = jnp.concatenate(parts, axis=-1)  # (bs, chs, K, L)

    from .ops.tv_filter import tv_analysis_window

    frames = frames * jnp.asarray(tv_analysis_window(frame_size, hop))

    return jnp.fft.rfft(frames, n_fft, axis=-1), x_ext[..., -left:]


def _wola_synthesize(Y, hop: int, ola):
    """Streaming half of ``ops.tv_filter.tv_istft``: irFFT + overlap-add
    given the carried ``n_fft - hop`` OLA tail. Returns ``(y, new_ola)``
    with y (bs, chs, Tc = K*hop)."""
    bs, chs, K, n_bins = Y.shape
    n_fft = 2 * (n_bins - 1)
    Tc = K * hop
    if ola is None:
        ola = jnp.zeros((bs, chs, n_fft - hop), jnp.float32)
    yf = jnp.fft.irfft(Y, n_fft, axis=-1)

    nchunks = n_fft // hop
    yc = yf.reshape(bs, chs, K, nchunks, hop)
    out = sum(
        jnp.pad(yc[:, :, :, k], ((0, 0), (0, 0), (k, nchunks - 1 - k), (0, 0)))
        for k in range(nchunks)
    ).reshape(bs, chs, (K + nchunks - 1) * hop)
    out = out.at[..., : n_fft - hop].add(ola.astype(out.dtype))
    return out[..., :Tc], out[..., Tc:]


def _wola_stream(x, H, frame_size: int, hop: int, state):
    """Streaming core of ``ops.tv_filter.tv_freq_filter``.

    ``x`` is a (bs, chs, Tc) chunk with ``Tc % hop == 0``; ``H`` holds
    the complex responses of the ``Tc/hop`` frames whose input completes
    within this chunk. Carried state: the trailing ``frame_size - hop``
    input samples and the ``n_fft - hop`` overlap-add tail. The output
    equals the offline WOLA render delayed by ``frame_size - hop``
    samples (the window's algorithmic lookahead — the first chunk leads
    with that many warm-up samples).
    """
    n_fft = 2 * (H.shape[-1] - 1)
    if state is None:
        state = {"xhist": None, "ola": None}
    X, xhist = _wola_analyze(x, frame_size, hop, n_fft, state["xhist"])
    y, ola = _wola_synthesize(X * H[:, None].astype(X.dtype), hop, state["ola"])
    return y, {"xhist": xhist, "ola": ola}


def spectral_gate_stream(
    x: jnp.ndarray,
    sample_rate: float,
    threshold_db,
    range_db,
    attack_ms,
    release_ms,
    noise_profile_db: jnp.ndarray,
    sharpness_db=3.0,
    det_smooth_ms: float = 40.0,
    freq_smooth_bins: int = 9,
    frame_size: int = 2048,
    hop: int = 512,
    eps: float = 1e-8,
    state=None,
    smoother: str = "parallel",
) -> Tuple[jnp.ndarray, Any]:
    """Streaming spectral gate (offline
    :func:`dasp_tpu.functional.spectral_gate`).

    Requires a measured ``noise_profile_db`` (bs, frame_size + 1) —
    :func:`dasp_tpu.functional.spectral_noise_profile`; a stream cannot
    self-estimate the quantile floor the offline effect defaults to.
    Given the same profile, the concatenated stream equals the offline
    render delayed by ``frame_size - hop`` samples (WOLA lookahead —
    34.8 ms at the 2048/512 defaults, 44.1 kHz). Carried state: WOLA
    input/overlap tails + the detector power smoother + the per-bin
    ballistics envelopes. Chunk length must be a multiple of ``hop``.
    """
    import math as _math

    import numpy as np

    bs, chs, Tc = x.shape
    dtype = x.dtype
    threshold_db = F._param(threshold_db, bs, dtype)[:, :, 0]  # (bs, 1)
    range_db = F._param(range_db, bs, dtype)[:, :, 0]
    attack_ms = F._param(attack_ms, bs, dtype)
    release_ms = F._param(release_ms, bs, dtype)
    sharpness_db = F._param(sharpness_db, bs, dtype)[:, :, 0]

    if state is None:
        state = {"xhist": None, "ola": None, "det": None, "bal": None}
    n_fft = 2 * frame_size
    ln9 = _math.log(9.0)
    frame_rate = sample_rate / hop

    X, xhist = _wola_analyze(x, frame_size, hop, n_fft, state["xhist"])
    power = jnp.mean(jnp.square(jnp.abs(X)), axis=1)  # (bs, K, n_bins)
    alpha_d = np.exp(-ln9 / (frame_rate * (det_smooth_ms / 1e3))).astype(np.float32)
    power, det = F._smooth_det_power(power, alpha_d, "causal", y0=state["det"])
    det_db = 10.0 * jnp.log10(jnp.maximum(power, eps * eps))
    noise_db = jnp.asarray(noise_profile_db, dtype)[:, None, :]

    alpha_a = jnp.exp(-ln9 / (frame_rate * (attack_ms / 1e3)))
    alpha_r = jnp.exp(-ln9 / (frame_rate * (release_ms / 1e3)))

    gain, bal = F._spectral_gate_gain(
        det_db, noise_db, threshold_db[..., None], range_db[..., None],
        sharpness_db[..., None], alpha_a, alpha_r, smoother,
        freq_smooth_bins, y0=state["bal"], return_yf=True,
    )
    y, ola = _wola_synthesize(X * gain[:, None].astype(X.dtype), hop, state["ola"])
    return y.astype(dtype), {"xhist": xhist, "ola": ola, "det": det, "bal": bal}


def dynamic_eq_stream(
    x: jnp.ndarray,
    sample_rate: float,
    frequency_hz,
    q_factor,
    threshold_db,
    ratio,
    attack_ms,
    release_ms,
    knee_db: float = 6.0,
    max_cut_db: float = 24.0,
    frame_size: int = 1024,
    hop: int = 256,
    eps: float = 1e-8,
    state=None,
    smoother: str = "parallel",
) -> Tuple[jnp.ndarray, Any]:
    """One streaming step of the dynamic EQ (offline
    :func:`dasp_tpu.functional.dynamic_eq`). The concatenated stream
    equals the offline render delayed by ``frame_size - hop`` samples
    (WOLA lookahead). Carried state: WOLA input/overlap tails + the
    per-band ballistics envelopes. Chunk length must be a multiple of
    ``hop``.
    """
    import math as _math

    bs, chs, Tc = x.shape
    dtype = x.dtype
    frequency_hz = jnp.asarray(frequency_hz, dtype)
    if frequency_hz.ndim < 2:
        frequency_hz = frequency_hz.reshape(bs, -1)
    nb = frequency_hz.shape[-1]
    frequency_hz = F._band_param(frequency_hz, bs, nb, dtype)
    q_factor = F._band_param(q_factor, bs, nb, dtype)
    threshold_db = F._band_param(threshold_db, bs, nb, dtype)
    ratio = F._band_param(ratio, bs, nb, dtype)
    attack_ms = F._band_param(attack_ms, bs, nb, dtype)
    release_ms = F._band_param(release_ms, bs, nb, dtype)

    if state is None:
        state = {"xhist": None, "ola": None, "bal": None}
    n_fft = 4 * frame_size  # tail room — must match functional.dynamic_eq
    n_bins = n_fft // 2 + 1
    X, xhist = _wola_analyze(x, frame_size, hop, n_fft, state["xhist"])
    P = jnp.mean(jnp.square(jnp.abs(X)), axis=1)

    band_w = F._dynamic_eq_band_weights(
        frequency_hz, q_factor, n_bins, sample_rate, frame_size, hop
    )
    ln9 = _math.log(9.0)
    frame_rate = sample_rate / hop
    alpha_a = jnp.exp(-ln9 / (frame_rate * (attack_ms / 1e3)))[..., None]
    alpha_r = jnp.exp(-ln9 / (frame_rate * (release_ms / 1e3)))[..., None]

    g, bal = F._dynamic_eq_gain(
        P, band_w, threshold_db[..., None], ratio[..., None],
        knee_db, max_cut_db, alpha_a, alpha_r, smoother, eps,
        y0=state["bal"], return_yf=True,
    )
    H = F._dynamic_eq_response(frequency_hz, q_factor, g, n_bins, sample_rate)
    y, ola = _wola_synthesize(X * H[:, None], hop, state["ola"])
    return y.astype(dtype), {"xhist": xhist, "ola": ola, "bal": bal}


def _pv_stream_layout(rate: float, K_in: int):
    """Static frame-layout constants of the streaming phase vocoder.

    (imports are local like the rest of this module)

    K_out output frames per chunk (must divide exactly), D = output-frame
    delay so every interpolation index lands on an already-analyzed
    frame, P+1 = carried analysis spectra.
    """
    import math

    K_out = round(K_in / rate)
    if abs(K_out * rate - K_in) > 1e-9 or K_out < 1:
        raise ValueError(
            f"chunk frames ({K_in}) / rate ({rate}) must be a positive "
            f"integer (got {K_in / rate}); pick a chunk length whose "
            f"frame count divides by the rate"
        )
    D = max(1, int(math.ceil(2.0 / rate - 1.0)))
    P = max(0, int(math.ceil(D * rate)) - 1)
    return K_out, D, P


def time_stretch_stream(
    x: jnp.ndarray,
    sample_rate: float,
    rate: float,
    frame_size: int = 2048,
    hop: int = 512,
    state=None,
) -> Tuple[jnp.ndarray, Any]:
    """Streaming phase-vocoder time stretch (offline
    :func:`dasp_tpu.functional.time_stretch`, static ``rate``).

    Consumes chunks of ``Tc`` input samples and emits chunks of
    ``Tc / rate`` output samples (so ``Tc/hop / rate`` must be a
    positive integer — e.g. hop 512, Tc 10*512, rate 1.25 -> 8 output
    frames per chunk). The concatenated stream equals the offline
    render delayed by ``frame_size - hop + D*hop`` samples, where
    ``D = max(1, ceil(2/rate - 1))`` is the frame lookahead the warp's
    linear interpolation needs; the first ``D`` output frames are
    warm-up. Carried state: the WOLA input/overlap tails, the last
    ``P + 1`` analysis spectra, and the WRAPPED synthesis phase (the
    expected per-frame advance accumulates EXACTLY via the integer
    mod-n_fft ramp — see ``functional._pv_phase_ramp`` — so the stream
    can run forever without fp32 phase staircase).
    """
    import math

    import jax
    import numpy as np

    bs, chs, Tc = x.shape
    dtype = x.dtype
    rate = float(rate)
    if rate <= 0.0:
        raise ValueError(f"rate must be > 0, got {rate}")
    if Tc % hop != 0:
        raise ValueError(f"chunk length {Tc} must be a multiple of hop {hop}.")
    K_in = Tc // hop
    K_out, D, P = _pv_stream_layout(rate, K_in)

    n_fft = 2 * frame_size
    n_bins = frame_size + 1
    w_bin = np.float32(2.0 * np.pi) * np.arange(n_bins, dtype=np.float32) \
        * np.float32(hop / n_fft)
    e_wb = jnp.asarray(np.exp(-1j * w_bin).astype(np.complex64))

    first = state is None
    if first:
        state = {
            "wola_xhist": None,
            "ola": None,
            "Xbuf": jnp.zeros((bs, chs, P + 1, n_bins), jnp.complex64),
            "phi0": jnp.zeros((bs, chs, n_bins), jnp.float32),
        }

    X, xhist = _wola_analyze(x, frame_size, hop, n_fft, state["wola_xhist"])
    Xall = jnp.concatenate([state["Xbuf"], X], axis=2)  # (bs, chs, P+1+K_in, n_bins)

    # static interpolation positions: output frame j reads analysis
    # position (j - D) * rate, = (j - D)*rate + P + 1 in buffer coords
    # (>= 0 by construction: P + 1 >= D*rate)
    tau = np.arange(K_out, dtype=np.float64) * rate - D * rate + P + 1
    i0 = np.floor(tau).astype(np.int64)
    i1 = i0 + 1
    frac = jnp.asarray((tau - np.floor(tau)).astype(np.float32))[:, None]

    X0 = jnp.take(Xall, jnp.asarray(i0), axis=2)  # constant-index slices
    X1 = jnp.take(Xall, jnp.asarray(i1), axis=2)
    mag = (1.0 - frac) * jnp.abs(X0) + frac * jnp.abs(X1)
    dev = jnp.angle(X1 * jnp.conj(X0) * e_wb)  # princarg(adv - expected)

    # synthesis phases: carried phi0 + exact mod-2*pi expected ramp +
    # cumsum of the small deviations
    ramp = jnp.asarray(F._pv_phase_ramp(K_out + 1, n_bins, hop, n_fft))
    if first:
        # the first D output frames are warm-up (they read the zeroed
        # spectrum buffer): silence them and start the phase bookkeeping
        # at the true phase of analysis frame 0, so the stream equals
        # the offline render delayed by frame_size - hop + D*hop exactly
        warm = jnp.asarray(
            (np.arange(K_out) >= D).astype(np.float32))[:, None]
        mag = mag * warm
        dev = dev * warm
        ramp = ramp[np.maximum(np.arange(K_out + 1) - D, 0)]
        phi0 = jnp.angle(X[:, :, :1])  # anchor: phase of analysis frame 0
    else:
        phi0 = state["phi0"][:, :, None]

    cum = jnp.concatenate(
        [jnp.zeros_like(dev[:, :, :1]), jnp.cumsum(dev, axis=2)], axis=2)
    phase = phi0 + ramp[:K_out] + cum[:, :, :K_out]

    two_pi = np.float32(2.0 * np.pi)
    phi_next = jnp.mod(
        phase[:, :, -1] + (ramp[K_out] - ramp[K_out - 1]) + dev[:, :, -1]
        + np.float32(np.pi),
        two_pi,
    ) - np.float32(np.pi)

    Y = mag * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    y, ola = _wola_synthesize(Y, hop, state["ola"])

    new_state = {
        "wola_xhist": xhist,
        "ola": ola,
        "Xbuf": Xall[:, :, -(P + 1):],
        "phi0": phi_next,
    }
    return y.astype(dtype), new_state


def pitch_shift_pv_stream(
    x: jnp.ndarray,
    sample_rate: float,
    semitones: float,
    frame_size: int = 2048,
    hop: int = 512,
    state=None,
) -> Tuple[jnp.ndarray, Any]:
    """Streaming phase-vocoder pitch shifter (offline
    :func:`dasp_tpu.functional.pitch_shift_pv`, static ``semitones``):
    :func:`time_stretch_stream` at ``1/r`` composed with a streaming
    linear resampler at ``r = 2^(semitones/12)``. Length-preserving
    (Tc in -> Tc out); requires ``(Tc/hop) * r`` to be an integer —
    e.g. hop 512, Tc 12*512, r = 2^(7/12) is NOT representable, but
    chunked rational approximations like r = 1.5 (+7.02 st) are; for
    arbitrary shifts use the offline effect or the delay-line
    :func:`pitch_shift_stream`. Additional latency over the stretch
    stage: ``ceil((2 - r)/r)`` output samples.
    """
    import math

    import numpy as np

    bs, chs, Tc = x.shape
    r = 2.0 ** (float(semitones) / 12.0)
    if state is None:
        state = {"stretch": None, "hist": None}

    stretched, st_stretch = time_stretch_stream(
        x, sample_rate, 1.0 / r, frame_size, hop, state["stretch"])
    L = stretched.shape[-1]  # = Tc * r

    Dr = max(1, int(math.ceil((2.0 - r) / r)))
    H = int(math.ceil(Dr * r))
    hist = state["hist"]
    if hist is None:
        hist = jnp.zeros((bs, chs, H), stretched.dtype)
    buf = jnp.concatenate([hist, stretched], axis=-1)  # (bs, chs, H + L)

    pos = np.arange(Tc, dtype=np.float64) * r - Dr * r + H
    j0 = np.floor(pos).astype(np.int64)
    fr = jnp.asarray((pos - np.floor(pos)).astype(np.float32))
    s0 = jnp.take(buf, jnp.asarray(j0), axis=-1)
    s1 = jnp.take(buf, jnp.asarray(j0 + 1), axis=-1)
    y = (1.0 - fr) * s0 + fr * s1

    return y.astype(x.dtype), {"stretch": st_stretch, "hist": buf[..., -H:]}


def phaser_stream(
    x: jnp.ndarray,
    sample_rate: float,
    rate_hz,
    depth,
    centre_frequency_hz,
    feedback,
    mix,
    stages: int = 6,
    lfo_phase: float = 0.0,
    frame_size: int = 512,
    hop: int = 128,
    state=None,
) -> Tuple[jnp.ndarray, Any]:
    """Streaming phaser.

    Chunk-by-chunk :func:`dasp_tpu.functional.phaser`: the concatenated
    stream equals the offline render delayed by ``frame_size - hop``
    samples (WOLA lookahead — 8.7 ms at the defaults/44.1 kHz). Carried
    state: the WOLA input/overlap tails plus the WRAPPED LFO phase
    (see :func:`ring_modulator_stream` on why not a float absolute
    counter). Chunk length must be a multiple of ``hop``.
    """
    import numpy as np

    bs, chs, Tc = x.shape
    dtype = x.dtype
    rate_hz = F._param(rate_hz, bs, dtype).reshape(bs, 1)
    depth = F._param(depth, bs, dtype).reshape(bs, 1)
    centre = F._param(centre_frequency_hz, bs, dtype).reshape(bs, 1)
    feedback = F._param(feedback, bs, dtype).reshape(bs, 1)
    mix = F._param(mix, bs, dtype).reshape(bs, 1)

    two_pi = 2.0 * np.pi
    if state is None:
        state = {"wola": None,
                 "ph": jnp.full((bs, 1), float(lfo_phase), dtype)}
    n_fft = 4 * frame_size
    K = Tc // hop
    # frame centers within the chunk: k*hop + hop - frame_size/2
    # (matches ops.tv_filter.tv_frame_centers at the carried phase)
    offs = np.arange(K, dtype=np.float32) * hop + (hop - frame_size / 2.0)
    lfo = jnp.sin(state["ph"] + two_pi * rate_hz * (jnp.asarray(offs)[None, :] / sample_rate))
    f_break = jnp.clip(centre * 2.0 ** (2.0 * depth * lfo), 1.0, 0.49 * sample_rate)
    H = F._phaser_response(
        f_break, feedback, mix, n_fft // 2 + 1, stages, sample_rate
    )
    y, wola = _wola_stream(x, H, frame_size, hop, state["wola"])
    ph = jnp.mod(state["ph"] + two_pi * rate_hz * (Tc / sample_rate), two_pi)
    return y.astype(dtype), {"wola": wola, "ph": ph}


def auto_wah_stream(
    x: jnp.ndarray,
    sample_rate: float,
    sensitivity,
    attack_ms,
    release_ms,
    min_frequency_hz,
    max_frequency_hz,
    q_factor,
    mix,
    eps: float = 1e-8,
    frame_size: int = 512,
    hop: int = 128,
    state=None,
) -> Tuple[jnp.ndarray, Any]:
    """Streaming auto-wah.

    Chunk-by-chunk :func:`dasp_tpu.functional.auto_wah` (same
    ``frame_size - hop`` WOLA delay as :func:`phaser_stream`). Carried
    state: WOLA tails, the envelope follower's ballistics state, and the
    trailing envelope window the frame centers read from. The envelope
    path matches the offline render exactly except the offline edge
    clipping of the first/last frame centers (a sub-frame transient at
    the very start and end of a clip).
    """
    import numpy as np

    bs, chs, Tc = x.shape
    dtype = x.dtype
    sensitivity = F._param(sensitivity, bs, dtype)
    attack_ms = F._param(attack_ms, bs, dtype)
    release_ms = F._param(release_ms, bs, dtype)
    f_min = F._param(min_frequency_hz, bs, dtype).reshape(bs, 1)
    f_max = F._param(max_frequency_hz, bs, dtype).reshape(bs, 1)
    q_factor = F._param(q_factor, bs, dtype).reshape(bs, 1)
    mix = F._param(mix, bs, dtype).reshape(bs, 1)
    f_max = jnp.maximum(f_max, 1.01 * f_min)

    if state is None:
        state = {"wola": None, "env": None, "env_hist": None}
    left = frame_size - hop

    import math as _math

    level = jnp.mean(jnp.abs(x), axis=1, keepdims=True)
    ln9 = _math.log(9.0)
    alpha_a = jnp.exp(-ln9 / (sample_rate * (attack_ms / 1e3)))
    alpha_r = jnp.exp(-ln9 / (sample_rate * (release_ms / 1e3)))
    env, env_f = ballistics_smooth(
        level, alpha_r, alpha_a, mode="parallel",
        y0=state.get("env"), return_yf=True,
    )
    env_hist = state.get("env_hist")
    if env_hist is None:
        # cold start: replicate the first envelope sample, matching the
        # offline render's clipped negative frame centers
        env_hist = jnp.broadcast_to(env[..., :1], (bs, 1, left))
    env_ext = jnp.concatenate([env_hist, env], axis=-1)

    K = Tc // hop
    # frame k's center lands at index k*hop + frame_size/2 of env_ext
    idx = np.arange(K) * hop + frame_size // 2
    env_c = jnp.take(env_ext[:, 0], jnp.asarray(idx), axis=-1)  # (bs, K)
    sweep = jnp.tanh(sensitivity.reshape(bs, 1) * env_c)
    f_c = f_min * (f_max / f_min) ** sweep

    n_fft = 4 * frame_size
    from .ops.biquad import biquad
    from .ops.fft_filter import fft_freqz

    b, a = biquad(
        jnp.zeros((bs * K,), dtype),
        f_c.reshape(bs * K),
        jnp.broadcast_to(q_factor, (bs, K)).reshape(bs * K),
        sample_rate,
        "band_pass",
    )
    H_bp = fft_freqz(b, a, n_fft).reshape(bs, K, n_fft // 2 + 1)
    H = (1.0 - mix[..., None]) + mix[..., None] * H_bp

    y, wola = _wola_stream(x, H, frame_size, hop, state["wola"])
    return y.astype(dtype), {
        "wola": wola, "env": env_f, "env_hist": env_ext[..., -left:],
    }


def multiband_compressor_stream(
    x: jnp.ndarray,
    sample_rate: float,
    crossover_low_hz,
    crossover_high_hz,
    low_threshold_db, low_ratio, low_attack_ms, low_release_ms, low_makeup_gain_db,
    mid_threshold_db, mid_ratio, mid_attack_ms, mid_release_ms, mid_makeup_gain_db,
    high_threshold_db, high_ratio, high_attack_ms, high_release_ms, high_makeup_gain_db,
    knee_db,
    eps: float = 1e-8,
    state: Optional[Dict[str, Any]] = None,
    filter_method: str = "coupled",
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """One streaming step of the three-band compressor.

    Matches the offline :func:`functional.multiband_compressor` with the
    same ``filter_method`` and ``smoother="block"``. The carried state is
    the LR4 crossover tree's section states — legs batched into two
    sosfilt calls exactly like offline (``xo_s1`` holds the two f_lo
    legs stacked on batch, ``xo_s2`` the four f_hi legs) — plus the
    three band compressors' smoother state (bands batched 3x), so the
    whole effect stays one fused program per step. Chunk length must be
    a multiple of the IIR block length (128).
    """
    bs, chs, T = x.shape
    dtype = x.dtype
    f_lo = F._param(crossover_low_hz, bs, dtype).reshape(bs)
    f_hi = jnp.maximum(F._param(crossover_high_hz, bs, dtype).reshape(bs), 1.01 * f_lo)

    if state is None:
        state = {}
    elif "xo0" in state:  # legacy per-leg state layout (pre leg-batching)
        cat = lambda ks: (  # noqa: E731
            None
            if state[ks[0]] is None
            else jnp.concatenate([state[k] for k in ks], axis=0)
        )
        state = {
            "xo_s1": cat(["xo0", "xo1"]),
            "xo_s2": cat(["xo2", "xo3", "xo4", "xo5"]),
            "dyn": state.get("dyn"),
        }

    sos_lo_lp, sos_lo_hp = F.lr4_crossover_sos(f_lo, sample_rate, bs, dtype)
    sos_hi_lp, sos_hi_hp = F.lr4_crossover_sos(f_hi, sample_rate, bs, dtype)

    new_state: Dict[str, Any] = {}
    # stage 1: both f_lo legs on the same input, one batched call
    y1, new_state["xo_s1"] = sosfilt_stream(
        jnp.concatenate([sos_lo_lp, sos_lo_hp], axis=0),
        jnp.concatenate([x, x], axis=0),
        zi=state.get("xo_s1"),
        filter_method=filter_method,
    )
    low_pre, rest = y1[:bs], y1[bs:]
    # stage 2: mid/high from `rest` plus the low band's phase
    # compensation (the f_hi LR4 allpass) — four legs, one batched call
    y2, new_state["xo_s2"] = sosfilt_stream(
        jnp.concatenate([sos_hi_lp, sos_hi_hp, sos_hi_lp, sos_hi_hp], axis=0),
        jnp.concatenate([rest, rest, low_pre, low_pre], axis=0),
        zi=state.get("xo_s2"),
        filter_method=filter_method,
    )
    mid, high = y2[:bs], y2[bs : 2 * bs]
    low = y2[2 * bs : 3 * bs] + y2[3 * bs :]

    def cat(*ps):
        return jnp.concatenate([F._param(p, bs, dtype).reshape(bs) for p in ps], axis=0)

    bands = jnp.concatenate([low, mid, high], axis=0)  # (3*bs, chs, T)
    y, dyn_zf = compressor_stream(
        bands, sample_rate,
        cat(low_threshold_db, mid_threshold_db, high_threshold_db),
        cat(low_ratio, mid_ratio, high_ratio),
        cat(low_attack_ms, mid_attack_ms, high_attack_ms),
        cat(low_release_ms, mid_release_ms, high_release_ms),
        cat(knee_db, knee_db, knee_db),
        cat(low_makeup_gain_db, mid_makeup_gain_db, high_makeup_gain_db),
        eps=eps, zi=state.get("dyn"),
    )
    new_state["dyn"] = dyn_zf
    out = y[:bs] + y[bs : 2 * bs] + y[2 * bs :]
    return out.astype(dtype), new_state


class StreamChain:
    """Serial composition of stream steps with one carried state dict.

    The streaming counterpart of :class:`dasp_tpu.modules.Chain`: each
    entry is ``(name, step_fn)`` where ``step_fn(chunk, state) ->
    (chunk, state)`` is any of this module's ``*_stream`` functions with
    its parameters bound (``functools.partial`` / lambda). The chain
    itself is a pure ``(chunk, state_dict) -> (chunk, state_dict)``
    function — jit it like any single step.

    ``state=None`` starts every member from rest. Note that a jitted
    chain recompiles once when the state pytree changes from ``None``
    leaves to concrete arrays after the first chunk; pass explicit
    from-rest states (see each stream's docs) to avoid that in
    latency-critical serving.

    Example::

        chain = StreamChain([
            ("eq",   lambda c, s: parametric_eq_stream(c, sr, *p_eq, zi=s)),
            ("comp", lambda c, s: compressor_stream(c, sr, *p_c, zi=s)),
            ("lim",  lambda c, s: limiter_stream(c, sr, *p_l, zi=s)),
        ])
        step = jax.jit(chain)
        y, state = step(chunk, None)
    """

    def __init__(self, steps):
        steps = list(steps)
        if not steps:
            raise ValueError("StreamChain requires at least one step.")
        names = [name for name, _ in steps]
        if len(set(names)) != len(names):
            raise ValueError(f"Duplicate step names: {names}")
        self.steps = steps

    def __call__(
        self, x: jnp.ndarray, state: Optional[Dict[str, Any]] = None
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        state = {} if state is None else state
        new_state: Dict[str, Any] = {}
        for name, fn in self.steps:
            x, new_state[name] = fn(x, state.get(name))
        return x, new_state
