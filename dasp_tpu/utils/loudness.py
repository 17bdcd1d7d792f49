"""ITU-R BS.1770-4 loudness: differentiable LUFS metering + normalization.

Production mixing/mastering targets integrated loudness (streaming
platforms normalize to -14 LUFS, broadcast to -23), so a differentiable
meter makes "hit the loudness target" a TRAINABLE objective — usable
both as a measurement and inside a loss. The reference framework has no
metering of any kind.

Design (TPU-first): the K-weighting prefilter is the two-biquad cascade
the standard specifies, run through the exact block-state SOS machinery
(`ops.iir`); the 400 ms / 75%-overlap momentary blocks are computed from
ONE cumulative sum of the squared signal (block mean-squares are cumsum
differences at static offsets — no framing, no gathers); the two-stage
gating (absolute -70 LUFS, relative -10 LU) is masked averaging, so
gradients flow through the surviving blocks. Everything is
jit/grad/vmap-compatible.

Filter parameters are the Audio-EQ-Cookbook redesign of the standard's
curve (pyloudnorm's default "K-weighting" class): high shelf +4 dB @
1500 Hz Q 0.7071, then high-pass @ 38 Hz Q 0.5 — the forms that
approximate the BS.1770 coefficient tables when designed with the
cookbook biquad formulas at any sample rate.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = ["k_weighting_sos", "integrated_loudness", "loudness_normalize"]

# K-weighting parameters for the cookbook biquad forms (pyloudnorm's
# default "K-weighting" filter class; NOT the DeMan analog-prototype
# constants, which belong to a different filter parameterization)
_SHELF_G_DB = 4.0
_SHELF_Q = 1.0 / math.sqrt(2.0)
_SHELF_FC = 1500.0
_HP_Q = 0.5
_HP_FC = 38.0

# channel weights: L, R, C, Ls, Rs (BS.1770 Table 3)
_CH_WEIGHTS = np.asarray([1.0, 1.0, 1.0, 1.41, 1.41], np.float32)


def k_weighting_sos(bs: int, dtype, sample_rate: float) -> jnp.ndarray:
    """The K-weighting prefilter as (bs, 2, 6) a0-normalized sections."""
    from ..ops.biquad import biquad

    g = jnp.full((bs,), _SHELF_G_DB, dtype)
    b1, a1 = biquad(g, jnp.full((bs,), _SHELF_FC, dtype),
                    jnp.full((bs,), _SHELF_Q, dtype), sample_rate, "high_shelf")
    b2, a2 = biquad(jnp.zeros((bs,), dtype), jnp.full((bs,), _HP_FC, dtype),
                    jnp.full((bs,), _HP_Q, dtype), sample_rate, "high_pass")
    s1 = jnp.concatenate([b1, a1], -1)
    s2 = jnp.concatenate([b2, a2], -1)
    return jnp.stack([s1, s2], axis=1)


def integrated_loudness(
    x: jnp.ndarray,
    sample_rate: float,
    filter_method: str = "coupled",
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Integrated (gated) loudness in LUFS, shape (bs,).

    Calibration: a 0 dBFS 997 Hz sine reads -3.01 LUFS; gain linearity
    ``L(g*x) = L(x) + 20*log10(g)`` holds above the gates; appended
    silence does not change the reading (the -70 LUFS absolute gate
    drops those blocks).

    Args:
        x: audio, shape (bs, chs, T), chs <= 5 in L/R/C/Ls/Rs order.
        sample_rate: audio sample rate (Hz).
        filter_method: how the K-weighting biquads run ("coupled"
            default — exact block-state; "fsm"/"block"/"exact" as in
            :func:`dasp_tpu.functional.parametric_eq`).
        eps: log floor.
    """
    from ..functional import _apply_sos

    bs, chs, T = x.shape
    if chs > 5:
        raise ValueError(f"BS.1770 defines weights for <= 5 channels, got {chs}.")
    dtype = x.dtype

    sos = k_weighting_sos(bs, dtype, sample_rate)
    y = _apply_sos(sos, x, filter_method)

    # 400 ms momentary blocks at 75% overlap from ONE cumsum of y^2
    block = min(int(round(0.4 * sample_rate)), T)
    hop = max(int(round(0.1 * sample_rate)), 1)
    n_blocks = max((T - block) // hop + 1, 1)
    cs = jnp.cumsum(jnp.square(y), axis=-1)
    cs = jnp.concatenate([jnp.zeros_like(cs[..., :1]), cs], axis=-1)
    starts = np.arange(n_blocks, dtype=np.int64) * hop
    z = (cs[..., starts + block] - cs[..., starts]) / block  # (bs, chs, nb)

    w = jnp.asarray(_CH_WEIGHTS[:chs], dtype)
    zw = jnp.einsum("bcn,c->bn", z, w)  # weighted sum over channels
    l_blocks = -0.691 + 10.0 * jnp.log10(jnp.maximum(zw, eps))

    # stage 1: absolute gate at -70 LUFS
    m1 = (l_blocks > -70.0).astype(dtype)
    z1 = jnp.sum(zw * m1, -1) / jnp.maximum(jnp.sum(m1, -1), 1.0)
    # stage 2: relative gate 10 LU below the stage-1 loudness
    rel = -0.691 + 10.0 * jnp.log10(jnp.maximum(z1, eps)) - 10.0
    m2 = m1 * (l_blocks > rel[:, None]).astype(dtype)
    z2 = jnp.sum(zw * m2, -1) / jnp.maximum(jnp.sum(m2, -1), 1.0)
    return -0.691 + 10.0 * jnp.log10(jnp.maximum(z2, eps))


def loudness_normalize(
    x: jnp.ndarray,
    sample_rate: float,
    target_lufs,
    filter_method: str = "coupled",
) -> jnp.ndarray:
    """Gain ``x`` so its integrated loudness equals ``target_lufs``.

    Args:
        x: audio, shape (bs, chs, T).
        target_lufs: target integrated loudness, shape (bs,) or scalar.

    Returns:
        Normalized audio, same shape. Differentiable in both arguments
        (the measurement is inside the graph).
    """
    bs = x.shape[0]
    target = jnp.broadcast_to(jnp.asarray(target_lufs, x.dtype), (bs,))
    lufs = integrated_loudness(x, sample_rate, filter_method=filter_method)
    gain_db = target - lufs
    return x * (10.0 ** (gain_db / 20.0))[:, None, None]
