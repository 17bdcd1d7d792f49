"""Pallas TPU kernel: banded time-varying fractional-delay contraction.

The pitch/delay effect family (pitch_shift, modulated_delay, the PV
resampler) evaluates

    wet[b, c, t] = sum_i gv_i[b, t] * hat(w - r_i[b, t]) . x[b, c, w]

where ``hat(u) = max(0, 1 - |u|)`` has a TWO-sample support around the
fractional read position ``r_i = t + Dm - d_i``. The XLA formulation
(functional._frac_delay_tiles_ad) fuses the (B, W)-tile interpolation
matrix into a loop but still EVALUATES every (t, w) pair — ~0.6 TOP/s of
VPU work proportional to the full window width W (~3200 at pitch-shift
sizes), and its autodiff transpose materializes the matrix cotangent
(~5 HBM passes over 414 MB per tile group; see the measured A/B in
benchmarks/fdt_ab_report.json).

This kernel exploits the band structure XLA cannot: the read positions
of 8 consecutive output samples span at most ``8 * dr/dt + 2`` input
samples (dr/dt = 1 - d' bounded by ~3 for any audio-rate modulation), so
per 8-output block and tap only THREE 128-lane rows of the window can
carry nonzero hat weights — and their row index is computed at runtime
from the delay values (data-dependent control flow, impossible in a
fused XLA loop). Work drops from O(B * W) to O(B * 384) per tap,
independent of the delay bound W.

Layout: everything time-major with time split as (rows of 128 lanes);
dynamic row selection lands on the sublane dimension (Mosaic rejects
dynamic lane-dim slices). The grid is (bs, n_tiles); x rides VMEM once
per batch item (block index map ignores the tile coordinate). The
backward kernel runs the same loops once, producing dx (accumulated
in-place across the tile-sequential grid), dd and dg together — one
pass, no dense cotangent.

Correctness bound: supports spanning more than 3 rows (|dr/dt| > ~46)
would silently truncate; the wrapper asserts the caller-provided slope
bound. All dasp uses are < 3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["frac_delay_pallas", "SLOPE_BOUND"]

_LANE = 128
_JB = 8  # output samples per inner block (sublane height)
_NROWS = 3  # 128-lane window rows visited per (block, tap)

# supports span <= _JB * (1 + SLOPE_BOUND) + 2 samples; 3 rows cover 256+
SLOPE_BOUND = 30.0


def _row_candidates(r8):
    """Window rows that can carry nonzero hat weights for this 8-output
    block: a min-anchored set of 3 (covers a unimodal cluster of span
    <= 254, i.e. |dr/dt| <= SLOPE_BOUND) plus a max-anchored set of 4
    for the BIMODAL pattern a sawtooth wrap produces (pitch_shift's
    delay jumps by the full window at a wrap, splitting the block's read
    positions into two distant clusters). The max-anchored rows are
    GATED on not overlapping the min-anchored ones, so no (j, w) pair
    is ever counted twice; for unimodal blocks the gates are all zero.

    Yields (row_rel, gate) — window-relative row index (traced scalar,
    clamped >= 0) and a 0/1 float gate to multiply into the hat.
    """
    w0 = jnp.maximum(
        jnp.floor(jnp.min(r8) * (1.0 / _LANE)).astype(jnp.int32), 0)
    fmax = jnp.floor(jnp.max(r8) * (1.0 / _LANE)).astype(jnp.int32)
    for ro in range(3):
        yield w0 + ro, jnp.float32(1.0)
    for ro in (-2, -1, 0, 1):
        row = fmax + ro
        gate = jnp.where(row > w0 + 2, 1.0, 0.0).astype(jnp.float32)
        yield jnp.maximum(row, 0), gate


def _fwd_kernel(nt, chs, B, Dm_pad, x_ref, d_ref, g_ref, o_ref):
    """Grid (bs, nb). Blocks:
    x_ref (1, chs, Trows, 128)  — whole padded item, window via rows
    d_ref/g_ref (nt, 1, B, 1)   — this tile's delays/gains, time-major
    o_ref (1, chs, B, 1)        — this tile's wet output
    """
    k = pl.program_id(1)
    base_row = k * (B // _LANE)
    lane = lax.broadcasted_iota(jnp.float32, (_JB, _LANE), 1)
    jsub = lax.broadcasted_iota(jnp.float32, (_JB, 1), 0)

    def jb_body(jb, _):
        j8 = jsub + (jb * _JB).astype(jnp.float32)  # j within tile, (8,1)
        t8 = j8 + (k * B).astype(jnp.float32)  # global output time
        acc = [jnp.zeros((_JB, 1), jnp.float32) for _ in range(chs)]
        for t in range(nt):  # static tap count (1 or 2)
            d8 = d_ref[t, 0, pl.ds(jb * _JB, _JB), :]  # (8, 1)
            g8 = g_ref[t, 0, pl.ds(jb * _JB, _JB), :]
            r8 = j8 + np.float32(Dm_pad) - d8  # window coords
            gv8 = jnp.where(t8 - d8 >= 0.0, g8, 0.0)
            for row_rel, gate in _row_candidates(r8):
                row = base_row + row_rel
                wl = lane + (row_rel * _LANE).astype(jnp.float32)
                hat = jnp.maximum(0.0, 1.0 - jnp.abs(wl - r8)) * gv8 * gate
                for c in range(chs):
                    win = x_ref[0, c, pl.ds(row, 1), :]  # (1, 128)
                    acc[c] = acc[c] + jnp.sum(hat * win, axis=1,
                                              keepdims=True)
        for c in range(chs):
            o_ref[0, c, pl.ds(jb * _JB, _JB), :] = acc[c]
        return 0

    lax.fori_loop(0, B // _JB, jb_body, 0)


def _bwd_kernel(nt, chs, B, Dm_pad, x_ref, d_ref, g_ref, ct_ref,
                dx_ref, dd_ref, dg_ref):
    """Same loops as forward, one pass: dx accumulated in place across
    the tile-sequential grid (block index map pins dx to the batch item;
    zeroed at the item's first tile), dd/dg written per tile."""
    k = pl.program_id(1)
    base_row = k * (B // _LANE)
    lane = lax.broadcasted_iota(jnp.float32, (_JB, _LANE), 1)
    jsub = lax.broadcasted_iota(jnp.float32, (_JB, 1), 0)

    @pl.when(k == 0)
    def _():
        dx_ref[...] = jnp.zeros(dx_ref.shape, dx_ref.dtype)

    def jb_body(jb, _):
        j8 = jsub + (jb * _JB).astype(jnp.float32)
        t8 = j8 + (k * B).astype(jnp.float32)
        ct8 = [ct_ref[0, c, pl.ds(jb * _JB, _JB), :] for c in range(chs)]
        for t in range(nt):
            d8 = d_ref[t, 0, pl.ds(jb * _JB, _JB), :]
            g8 = g_ref[t, 0, pl.ds(jb * _JB, _JB), :]
            r8 = j8 + np.float32(Dm_pad) - d8
            mask8 = jnp.where(t8 - d8 >= 0.0, 1.0, 0.0)
            gv8 = mask8 * g8
            dd8 = jnp.zeros((_JB, 1), jnp.float32)
            dg8 = jnp.zeros((_JB, 1), jnp.float32)
            for row_rel, gate in _row_candidates(r8):
                row = base_row + row_rel
                wl = lane + (row_rel * _LANE).astype(jnp.float32)
                delta = wl - r8
                absd = jnp.abs(delta)
                hat = jnp.maximum(0.0, 1.0 - absd) * gate
                # d hat / d d = -sign(delta) inside the support
                dhat = jnp.where(absd < 1.0, jnp.sign(delta), 0.0) * gate
                for c in range(chs):
                    win = x_ref[0, c, pl.ds(row, 1), :]
                    # dg = ct . mask . (hat contraction)
                    dg8 = dg8 + ct8[c] * mask8 * jnp.sum(
                        hat * win, axis=1, keepdims=True)
                    # dd = -ct . gv . (sign contraction)
                    dd8 = dd8 - ct8[c] * gv8 * jnp.sum(
                        dhat * win, axis=1, keepdims=True)
                    # dx[row] += sum_j ct_j gv_j hat_j
                    contrib = jnp.sum(ct8[c] * gv8 * hat, axis=0,
                                      keepdims=True)  # (1, 128)
                    cur = dx_ref[0, c, pl.ds(row, 1), :]
                    dx_ref[0, c, pl.ds(row, 1), :] = cur + contrib
            dd_ref[t, 0, pl.ds(jb * _JB, _JB), :] = dd8
            dg_ref[t, 0, pl.ds(jb * _JB, _JB), :] = dg8
        return 0

    lax.fori_loop(0, B // _JB, jb_body, 0)


def _prep(x_ext, d_stk, g_stk, B, Dm):
    """Pad to the kernel's lane geometry; return padded operands + dims.

    x_ext: (bs, chs, Dm + Tp); d/g: (nt, bs, Tp) with Tp = nb * B.
    Dm must already be a multiple of 128 (the wrapper rounds the history
    bound up — always safe — so the kernel's window coordinates are
    BITWISE identical to the XLA path's); extra right rows absorb the
    row lookahead of the last blocks.
    """
    bs, chs, T_ext = x_ext.shape
    nt = d_stk.shape[0]
    Tp = T_ext - Dm
    assert Dm % _LANE == 0, f"history bound {Dm} must be a multiple of {_LANE}"
    xp = jnp.pad(x_ext, ((0, 0), (0, 0), (0, _NROWS * _LANE)))
    Trows = (Dm + Tp) // _LANE + _NROWS
    x4 = xp.reshape(bs, chs, Trows, _LANE)
    d4 = d_stk.reshape(nt, bs, Tp, 1)
    g4 = g_stk.reshape(nt, bs, Tp, 1)
    return x4, d4, g4, dict(bs=bs, chs=chs, nt=nt, Tp=Tp, nb=Tp // B,
                            Dm_pad=Dm, Trows=Trows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def frac_delay_pallas(x_ext, d_stk, g_stk, B, Dm, interpret=None):
    """Banded fractional multi-tap delay contraction on TPU.

    Same contract as ``functional._frac_delay_tiles_ad`` (x_ext:
    (bs, chs, Dm + nb*B) left-extended signal; d/g: (nt, bs, nb*B)
    delays <= Dm - 1 and gains; returns (bs, chs, nb*B) wet) evaluated
    by the banded Pallas kernel — O(taps * 384) work per output sample
    regardless of the delay bound, vs O(W) for the dense-tile einsum.
    Requires B % 128 == 0. Value-equal to the XLA path up to fp32
    reduction order (the hat weights are computed with the identical
    formula on shifted-by-integer window coordinates).
    """
    return _fdp_fwd(x_ext, d_stk, g_stk, B, Dm, interpret)[0]


def _run_fwd(x4, d4, g4, dims, B, Dm_pad, interpret):
    bs, chs, nt, nb = dims["bs"], dims["chs"], dims["nt"], dims["nb"]
    Trows = dims["Trows"]
    kern = functools.partial(_fwd_kernel, nt, chs, B, Dm_pad)
    out = pl.pallas_call(
        kern,
        grid=(bs, nb),
        in_specs=[
            pl.BlockSpec((1, chs, Trows, _LANE), lambda b, k: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, 1, B, 1), lambda b, k: (0, b, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, 1, B, 1), lambda b, k: (0, b, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chs, B, 1), lambda b, k: (b, 0, k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs, chs, dims["Tp"], 1), jnp.float32),
        interpret=interpret,
    )(x4, d4, g4)
    return out[..., 0]


def _fdp_fwd(x_ext, d_stk, g_stk, B, Dm, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert B % _LANE == 0, f"tile length {B} must be a multiple of {_LANE}"
    x4, d4, g4, dims = _prep(x_ext, d_stk, g_stk, B, Dm)
    wet = _run_fwd(x4, d4, g4, dims, B, dims["Dm_pad"], interpret)
    return wet, (x_ext, d_stk, g_stk)


def _fdp_bwd(B, Dm, interpret, res, ct):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x_ext, d_stk, g_stk = res
    x4, d4, g4, dims = _prep(x_ext, d_stk, g_stk, B, Dm)
    bs, chs, nt, nb = dims["bs"], dims["chs"], dims["nt"], dims["nb"]
    Trows, Tp, Dm_pad = dims["Trows"], dims["Tp"], dims["Dm_pad"]
    ct4 = ct.reshape(bs, chs, Tp, 1)
    kern = functools.partial(_bwd_kernel, nt, chs, B, Dm_pad)
    dx4, dd4, dg4 = pl.pallas_call(
        kern,
        grid=(bs, nb),
        in_specs=[
            pl.BlockSpec((1, chs, Trows, _LANE), lambda b, k: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, 1, B, 1), lambda b, k: (0, b, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, 1, B, 1), lambda b, k: (0, b, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chs, B, 1), lambda b, k: (b, 0, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, chs, Trows, _LANE), lambda b, k: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, 1, B, 1), lambda b, k: (0, b, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, 1, B, 1), lambda b, k: (0, b, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, chs, Trows, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((nt, bs, Tp, 1), jnp.float32),
            jax.ShapeDtypeStruct((nt, bs, Tp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x4, d4, g4, ct4)
    # drop the right lookahead pad rows
    dx_flat = dx4.reshape(bs, chs, Trows * _LANE)
    return dx_flat[..., : x_ext.shape[-1]], dd4[..., 0], dg4[..., 0]


frac_delay_pallas.defvjp(_fdp_fwd, _fdp_bwd)
