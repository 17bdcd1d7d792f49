"""Pallas TPU kernel: banded time-varying fractional-delay contraction.

The pitch/delay effect family (pitch_shift, modulated_delay, the PV
resampler) evaluates

    wet[b, c, t] = sum_i gv_i[b, t] * hat(w - r_i[b, t]) . x[b, c, w]

where ``hat(u) = max(0, 1 - |u|)`` has a TWO-sample support around the
fractional read position ``r_i = t + Dm - d_i``. The XLA formulation
(functional._frac_delay_tiles_ad) fuses the (B, W)-tile interpolation
matrix into a loop but still EVALUATES every (t, w) pair — VPU work
proportional to the full window width W (~3200 at pitch-shift sizes) —
and its autodiff transpose materializes the matrix cotangent (~5 HBM
passes over 414 MB per tile group; benchmarks/fdt_ab_report.json).

This kernel exploits the band structure XLA cannot: the read positions
of ``_JB`` consecutive output samples span O(_JB * dr/dt) input samples,
so per block and tap only a few 128-lane window rows can carry nonzero
hat weights — and WHICH rows is data-dependent (computed from the delay
values), control flow a fused XLA loop cannot express. Work per output
sample drops from O(W) to O(taps * rows * 128 / _JB), independent of the
delay bound.

MEASURED OUTCOME (v5e, reference scale; benchmarks/fdt_ab_report.json
incl. the "crossover_sweep"): the kernel's cost is delay-bound-
INDEPENDENT (~23 ms fwd / 39 ms grad at 8x2x131072 for ANY bound) but
Mosaic issue-latency-bound at (16, 128) granularity, so the dense XLA
einsum — O(W)/sample but ~10x better element throughput — wins at small
windows (20 ms bound: fwd 9.3 vs 23.9 ms) and loses beyond W ~ 4.5k
(120 ms bound: grad 39 vs 59 ms; 500 ms: 39 vs 217). functional's
adjoint="auto" dispatches on that crossover: smooth (wraps=False)
delays switch here at W >= 4608; wrapping pitch-style taps pay the
bimodal row set and stay dense below W ~ 16k.

Row selection is HOISTED out of the kernel: a cheap XLA pre-pass
computes each (tap, block)'s candidate window rows — 3 min-anchored
rows (a unimodal cluster of span <= 382, i.e. |dr/dt| <= SLOPE_BOUND)
plus, when ``wraps=True``, 4 max-anchored rows covering the BIMODAL
blocks a sawtooth wrap produces (gated against overlap so no (t, w)
pair is counted twice) — and the kernel reads them as scalars from
SMEM. Everything else is time-major with time split as (rows of 128
lanes); dynamic row selection lands on the sublane dimension (Mosaic
rejects dynamic lane-dim slices). The grid is (bs, n_tiles); x rides
VMEM once per batch item. The backward kernel runs the same band once,
producing dx (accumulated in-place across the tile-sequential grid),
dd and dg together — one pass, no dense cotangent.
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
_JB = 16  # output samples per inner block (sublane height)
_PAD_ROWS = 3  # right lookahead rows

# 3 min-anchored rows cover a unimodal span of 384 - 2: slope bound
SLOPE_BOUND = (3 * _LANE - 2.0 - 2.0) / _JB


def _row_plan(r, wraps: bool):
    """XLA pre-pass: candidate window rows + overlap gates per
    (tap, item, _JB-block).

    r: (nt, bs, Tp) fractional read positions in window coordinates.
    Returns int32 rows (nt, bs, nblk, R) clamped >= 0 and float32 gates
    of the same shape (1 everywhere for the min-anchored rows; the
    max-anchored rows of the wrap set are gated on not overlapping the
    min-anchored ones).
    """
    nt, bs, Tp = r.shape
    nblk = Tp // _JB
    rb = r.reshape(nt, bs, nblk, _JB)
    w0 = jnp.maximum(
        jnp.floor(jnp.min(rb, -1) * (1.0 / _LANE)).astype(jnp.int32), 0)
    rows = [w0, w0 + 1, w0 + 2]
    gates = [jnp.ones_like(w0, jnp.float32)] * 3
    if wraps:
        fmax = jnp.floor(jnp.max(rb, -1) * (1.0 / _LANE)).astype(jnp.int32)
        for ro in (-2, -1, 0, 1):
            row = fmax + ro
            gates.append((row > w0 + 2).astype(jnp.float32))
            rows.append(jnp.maximum(row, 0))
    return jnp.stack(rows, -1), jnp.stack(gates, -1)


def _fwd_kernel(nt, chs, B, R, Dm, x_ref, d_ref, g_ref, rows_ref, gates_ref,
                o_ref):
    """Grid (bs, nb). Blocks:
    x_ref (1, chs, Trows, 128)      — whole padded item (VMEM)
    d_ref/g_ref (nt, 1, B, 1)       — this tile's delays/gains, time-major
    rows_ref/gates_ref (nt, 1, B//_JB, R) — hoisted row plan (SMEM)
    o_ref (1, chs, B, 1)            — this tile's wet output
    """
    k = pl.program_id(1)
    base_row = k * (B // _LANE)
    lane = lax.broadcasted_iota(jnp.int32, (_JB, _LANE), 1).astype(jnp.float32)
    jsub = lax.broadcasted_iota(jnp.int32, (_JB, 1), 0).astype(jnp.float32)

    def jb_body(jb, _):
        j16 = jsub + (jb * _JB).astype(jnp.float32)  # j within tile
        t16 = j16 + (k * B).astype(jnp.float32)  # global output time
        acc = [jnp.zeros((_JB, 1), jnp.float32) for _ in range(chs)]
        for t in range(nt):  # static tap count (1 or 2)
            d16 = d_ref[t, 0, pl.ds(jb * _JB, _JB), :]  # (_JB, 1)
            g16 = g_ref[t, 0, pl.ds(jb * _JB, _JB), :]
            r16 = j16 + np.float32(Dm) - d16  # window coords
            gv16 = jnp.where(t16 - d16 >= 0.0, g16, 0.0)
            for ro in range(R):
                row_rel = rows_ref[t, 0, jb, ro]
                gate = gates_ref[t, 0, jb, ro]
                wl = lane + (row_rel * _LANE).astype(jnp.float32)
                hat = (jnp.maximum(0.0, 1.0 - jnp.abs(wl - r16))
                       * (gv16 * gate))
                for c in range(chs):
                    win = x_ref[0, c, pl.ds(base_row + row_rel, 1), :]
                    acc[c] = acc[c] + jnp.sum(hat * win, axis=1,
                                              keepdims=True)
        for c in range(chs):
            o_ref[0, c, pl.ds(jb * _JB, _JB), :] = acc[c]
        return 0

    lax.fori_loop(0, B // _JB, jb_body, 0)


def _bwd_kernel(nt, chs, B, R, Dm, x_ref, d_ref, g_ref, rows_ref, gates_ref,
                ct_ref, dx_ref, dd_ref, dg_ref):
    """Same band as forward, one pass: dx accumulated in place across
    the tile-sequential grid (block index map pins dx to the batch item;
    zeroed at the item's first tile), dd/dg written per tile."""
    k = pl.program_id(1)
    base_row = k * (B // _LANE)
    lane = lax.broadcasted_iota(jnp.int32, (_JB, _LANE), 1).astype(jnp.float32)
    jsub = lax.broadcasted_iota(jnp.int32, (_JB, 1), 0).astype(jnp.float32)

    @pl.when(k == 0)
    def _():
        dx_ref[...] = jnp.zeros(dx_ref.shape, dx_ref.dtype)

    def jb_body(jb, _):
        j16 = jsub + (jb * _JB).astype(jnp.float32)
        t16 = j16 + (k * B).astype(jnp.float32)
        ct16 = [ct_ref[0, c, pl.ds(jb * _JB, _JB), :] for c in range(chs)]
        for t in range(nt):
            d16 = d_ref[t, 0, pl.ds(jb * _JB, _JB), :]
            g16 = g_ref[t, 0, pl.ds(jb * _JB, _JB), :]
            r16 = j16 + np.float32(Dm) - d16
            mask16 = jnp.where(t16 - d16 >= 0.0, 1.0, 0.0)
            gv16 = mask16 * g16
            dd16 = jnp.zeros((_JB, 1), jnp.float32)
            dg16 = jnp.zeros((_JB, 1), jnp.float32)
            for ro in range(R):
                row_rel = rows_ref[t, 0, jb, ro]
                gate = gates_ref[t, 0, jb, ro]
                row = base_row + row_rel
                wl = lane + (row_rel * _LANE).astype(jnp.float32)
                delta = wl - r16
                absd = jnp.abs(delta)
                hat = jnp.maximum(0.0, 1.0 - absd) * gate
                # d hat / d d = -sign(delta) inside the support
                dhat = jnp.where(absd < 1.0, jnp.sign(delta), 0.0) * gate
                for c in range(chs):
                    win = x_ref[0, c, pl.ds(row, 1), :]
                    # dg = ct . mask . (hat contraction)
                    dg16 = dg16 + ct16[c] * mask16 * jnp.sum(
                        hat * win, axis=1, keepdims=True)
                    # dd = -ct . gv . (sign contraction)
                    dd16 = dd16 - ct16[c] * gv16 * jnp.sum(
                        dhat * win, axis=1, keepdims=True)
                    # dx[row] += sum_j ct_j gv_j hat_j
                    contrib = jnp.sum(ct16[c] * gv16 * hat, axis=0,
                                      keepdims=True)  # (1, 128)
                    cur = dx_ref[0, c, pl.ds(row, 1), :]
                    dx_ref[0, c, pl.ds(row, 1), :] = cur + contrib
            dd_ref[t, 0, pl.ds(jb * _JB, _JB), :] = dd16
            dg_ref[t, 0, pl.ds(jb * _JB, _JB), :] = dg16
        return 0

    lax.fori_loop(0, B // _JB, jb_body, 0)


def _prep(x_ext, d_stk, g_stk, B, Dm, wraps):
    """Pad to the kernel's lane geometry; compute the hoisted row plan.

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
    xp = jnp.pad(x_ext, ((0, 0), (0, 0), (0, _PAD_ROWS * _LANE)))
    Trows = (Dm + Tp) // _LANE + _PAD_ROWS
    x4 = xp.reshape(bs, chs, Trows, _LANE)
    d4 = d_stk.reshape(nt, bs, Tp, 1)
    g4 = g_stk.reshape(nt, bs, Tp, 1)
    j = jnp.asarray(np.tile(np.arange(B, dtype=np.float32), Tp // B))
    r = j[None, None, :] + np.float32(Dm) - d_stk
    rows, gates = _row_plan(r, wraps)
    return x4, d4, g4, rows, gates, dict(
        bs=bs, chs=chs, nt=nt, Tp=Tp, nb=Tp // B, Trows=Trows,
        R=rows.shape[-1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def frac_delay_pallas(x_ext, d_stk, g_stk, B, Dm, wraps=True, interpret=None):
    """Banded fractional multi-tap delay contraction on TPU.

    Same contract as ``functional._frac_delay_tiles_ad`` (x_ext:
    (bs, chs, Dm + nb*B) left-extended signal; d/g: (nt, bs, nb*B)
    delays <= Dm - 1 and gains; returns (bs, chs, nb*B) wet) evaluated
    by the banded Pallas kernel — per-sample work independent of the
    delay bound, vs O(W) for the dense-tile einsum. Requires
    B % 128 == 0 and Dm % 128 == 0. Value-equal to the XLA path up to
    fp32 reduction order.

    ``wraps``: the delay curves may JUMP by the full window within a
    16-sample block (a pitch-shifter's sawtooth wrap) — adds the gated
    max-anchored row set. False (smooth LFO/ramp delays, |dr/dt| <=
    SLOPE_BOUND) runs the 3-row fast path.
    """
    return _fdp_fwd(x_ext, d_stk, g_stk, B, Dm, wraps, interpret)[0]


def _specs(dims, B):
    nt, chs, Trows, R = dims["nt"], dims["chs"], dims["Trows"], dims["R"]
    nblk = B // _JB
    return dict(
        x=pl.BlockSpec((1, chs, Trows, _LANE), lambda b, k: (b, 0, 0, 0),
                       memory_space=pltpu.VMEM),
        dg=pl.BlockSpec((nt, 1, B, 1), lambda b, k: (0, b, k, 0),
                        memory_space=pltpu.VMEM),
        plan=pl.BlockSpec((nt, 1, nblk, R), lambda b, k: (0, b, k, 0),
                          memory_space=pltpu.SMEM),
        o=pl.BlockSpec((1, chs, B, 1), lambda b, k: (b, 0, k, 0),
                       memory_space=pltpu.VMEM),
    )


def _fdp_fwd(x_ext, d_stk, g_stk, B, Dm, wraps, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert B % _LANE == 0, f"tile length {B} must be a multiple of {_LANE}"
    x4, d4, g4, rows, gates, dims = _prep(x_ext, d_stk, g_stk, B, Dm, wraps)
    sp = _specs(dims, B)
    kern = functools.partial(_fwd_kernel, dims["nt"], dims["chs"], B,
                             dims["R"], Dm)
    out = pl.pallas_call(
        kern,
        grid=(dims["bs"], dims["nb"]),
        in_specs=[sp["x"], sp["dg"], sp["dg"], sp["plan"], sp["plan"]],
        out_specs=sp["o"],
        out_shape=jax.ShapeDtypeStruct(
            (dims["bs"], dims["chs"], dims["Tp"], 1), jnp.float32),
        interpret=interpret,
    )(x4, d4, g4, rows, gates)
    return out[..., 0], (x_ext, d_stk, g_stk)


def _fdp_bwd(B, Dm, wraps, interpret, res, ct):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x_ext, d_stk, g_stk = res
    x4, d4, g4, rows, gates, dims = _prep(x_ext, d_stk, g_stk, B, Dm, wraps)
    bs, chs, nt = dims["bs"], dims["chs"], dims["nt"]
    Trows, Tp = dims["Trows"], dims["Tp"]
    ct4 = ct.reshape(bs, chs, Tp, 1)
    sp = _specs(dims, B)
    kern = functools.partial(_bwd_kernel, nt, chs, B, dims["R"], Dm)
    dx4, dd4, dg4 = pl.pallas_call(
        kern,
        grid=(bs, dims["nb"]),
        in_specs=[sp["x"], sp["dg"], sp["dg"], sp["plan"], sp["plan"],
                  sp["o"]],
        out_specs=[sp["x"], sp["dg"], sp["dg"]],
        out_shape=[
            jax.ShapeDtypeStruct((bs, chs, Trows, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((nt, bs, Tp, 1), jnp.float32),
            jax.ShapeDtypeStruct((nt, bs, Tp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x4, d4, g4, rows, gates, ct4)
    # drop the right lookahead pad rows
    dx_flat = dx4.reshape(bs, chs, Trows * _LANE)
    return dx_flat[..., : x_ext.shape[-1]], dd4[..., 0], dg4[..., 0]


frac_delay_pallas.defvjp(_fdp_fwd, _fdp_bwd)
