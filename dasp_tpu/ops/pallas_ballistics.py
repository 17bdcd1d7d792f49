"""Pallas TPU kernel: exact branching attack/release envelope smoother.

The true compressor/expander smoother switches its time constant per
sample based on the *state*:

    alpha[n] = alpha_attack if g[n] < y[n-1] else alpha_release
    y[n] = (1 - alpha[n]) * g[n] + alpha[n] * y[n-1]

This data-dependent recursion cannot be expressed as an associative scan
(ops.iir.ballistics_smooth's "parallel" mode is a two-pass approximation
and its "exact" mode is a lax.scan — latency-bound sample by sample
through HBM on TPU). Here the recursion runs inside a Pallas kernel:

  * time-major layout (T, lanes) — dynamic per-sample indexing must land
    on the sublane dimension (Mosaic rejects dynamic lane-dim slices);
  * rows padded to the 128-lane VPU width (vector ops on (1, 128) cost
    the same as (1, 8));
  * the time axis is streamed through VMEM in blocks (grid dimension,
    sequential on TPU) with the scalar state carried in a persistent
    scratch — memory is O(block), not O(T).

Backward uses the adjoint of the recursion treating the branch pattern as
locally constant (identical to autodiff through jnp.where):

    lam[n] = ct[n] + alpha[n+1] * lam[n+1]            (anti-causal)
    dL/dg[n] = (1 - alpha[n]) * lam[n]
    dL/dalpha[n] = (y[n-1] - g[n]) * lam[n]  -> routed to aa/ar by branch

with the branch pattern recomputed from the saved forward output and the
time blocks visited in reverse.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ballistics_pallas"]

_LANES = 128


def _fwd_kernel(g_ref, aa_ref, ar_ref, y0_ref, out_ref, carry_ref):
    t = pl.program_id(0)
    Tb, L = g_ref.shape

    @pl.when(t == 0)
    def _():
        carry_ref[:, :] = y0_ref[:, :]

    aa = aa_ref[:, :]  # (1, L)
    ar = ar_ref[:, :]

    def step(n, y_prev):
        gn = g_ref[pl.ds(n, 1), :]  # (1, L)
        alpha = jnp.where(gn < y_prev, aa, ar)
        y = (1.0 - alpha) * gn + alpha * y_prev
        out_ref[pl.ds(n, 1), :] = y
        return y

    carry_ref[:, :] = lax.fori_loop(0, Tb, step, carry_ref[:, :])


def _bwd_kernel(y_ref, g_ref, aa_ref, ar_ref, ct_ref, dg_ref, daa_ref, dar_ref,
                dy0_ref, lam_ref, daa_acc, dar_acc):
    """Time blocks are fed in REVERSE via the index map; within a block the
    samples run backward. y[n-1] for the first sample of a block is the
    last sample of the PREVIOUS (earlier-in-time) block — read from y_ref
    one step outside the block is impossible, so the wrapper passes y
    shifted by one (y_prev array) instead: y_ref here is ALREADY y[n-1]."""
    t = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    Tb, L = g_ref.shape

    @pl.when(t == 0)
    def _():
        lam_ref[:, :] = jnp.zeros_like(lam_ref)
        daa_acc[:, :] = jnp.zeros_like(daa_acc)
        dar_acc[:, :] = jnp.zeros_like(dar_acc)

    aa = aa_ref[:, :]
    ar = ar_ref[:, :]

    def step(i, carry):
        lam_scaled, daa, dar = carry  # alpha[n+1] * lam[n+1]
        n = Tb - 1 - i
        gn = g_ref[pl.ds(n, 1), :]
        y_prev = y_ref[pl.ds(n, 1), :]  # pre-shifted: y[n-1]
        alpha = jnp.where(gn < y_prev, aa, ar)

        lam = ct_ref[pl.ds(n, 1), :] + lam_scaled
        dg_ref[pl.ds(n, 1), :] = (1.0 - alpha) * lam
        dalpha = (y_prev - gn) * lam
        is_attack = (gn < y_prev).astype(daa.dtype)
        daa = daa + dalpha * is_attack
        dar = dar + dalpha * (1.0 - is_attack)
        return alpha * lam, daa, dar

    lam0, daa, dar = lax.fori_loop(
        0, Tb, step, (lam_ref[:, :], daa_acc[:, :], dar_acc[:, :])
    )
    lam_ref[:, :] = lam0
    daa_acc[:, :] = daa
    dar_acc[:, :] = dar

    @pl.when(t == n_blocks - 1)
    def _():
        daa_ref[:, :] = daa_acc[:, :]
        dar_ref[:, :] = dar_acc[:, :]
        # after the earliest block, the carry is alpha[0] * lam[0] = dL/dy0
        dy0_ref[:, :] = lam_ref[:, :]


def _pad_tm(x, pad_t, pad_l):
    return jnp.pad(x, ((0, pad_t), (0, pad_l)))


def _fwd_impl(g, aa, ar, y0, time_block, interpret):
    # g: (T, R) time-major; aa/ar/y0: (1, R)
    T, R = g.shape
    pad_l = (-R) % _LANES
    pad_t = (-T) % time_block
    gp = _pad_tm(g, pad_t, pad_l)
    aap = jnp.pad(aa, ((0, 0), (0, pad_l)))
    arp = jnp.pad(ar, ((0, 0), (0, pad_l)))
    y0p = jnp.pad(y0, ((0, 0), (0, pad_l)))
    Tp, L = gp.shape
    n_blocks = Tp // time_block

    y = pl.pallas_call(
        _fwd_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((time_block, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((time_block, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, L), g.dtype),
        scratch_shapes=[pltpu.VMEM((1, L), jnp.float32)],
        interpret=interpret,
    )(gp, aap, arp, y0p)
    return y[:T, :R]


def _bwd_impl(y, g, aa, ar, y0, ct, time_block, interpret):
    T, R = g.shape
    pad_l = (-R) % _LANES
    pad_t = (-T) % time_block
    # y_prev[n] = y[n-1] (the carried-in state y0 at n=0), padded like the rest
    y_prev = jnp.concatenate([y0, y[:-1]], axis=0)
    yp = _pad_tm(y_prev, pad_t, pad_l)
    gp = _pad_tm(g, pad_t, pad_l)
    ctp = _pad_tm(ct, pad_t, pad_l)
    aap = jnp.pad(aa, ((0, 0), (0, pad_l)))
    arp = jnp.pad(ar, ((0, 0), (0, pad_l)))
    Tp, L = gp.shape
    n_blocks = Tp // time_block
    rev = lambda t: (n_blocks - 1 - t, 0)  # noqa: E731

    dg, daa, dar, dy0 = pl.pallas_call(
        _bwd_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((time_block, L), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((time_block, L), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((time_block, L), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((time_block, L), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, L), g.dtype),
            jax.ShapeDtypeStruct((1, L), g.dtype),
            jax.ShapeDtypeStruct((1, L), g.dtype),
            jax.ShapeDtypeStruct((1, L), g.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, L), jnp.float32),
            pltpu.VMEM((1, L), jnp.float32),
            pltpu.VMEM((1, L), jnp.float32),
        ],
        interpret=interpret,
    )(yp, gp, aap, arp, ctp)
    return dg[:T, :R], daa[:, :R], dar[:, :R], dy0[:, :R]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ballistics_rows(g, aa, ar, y0, time_block, interpret):
    return _fwd_impl(g, aa, ar, y0, time_block, interpret)


def _b_fwd(g, aa, ar, y0, time_block, interpret):
    y = _fwd_impl(g, aa, ar, y0, time_block, interpret)
    return y, (y, g, aa, ar, y0)


def _b_bwd(time_block, interpret, res, ct):
    y, g, aa, ar, y0 = res
    return _bwd_impl(y, g, aa, ar, y0, ct, time_block, interpret)


_ballistics_rows.defvjp(_b_fwd, _b_bwd)


def ballistics_pallas(
    g: jnp.ndarray,
    alpha_attack: jnp.ndarray,
    alpha_release: jnp.ndarray,
    time_block: int = 1024,
    interpret: bool | None = None,
    y0: jnp.ndarray | None = None,
    return_yf: bool = False,
):
    """Exact branching attack/release smoother on TPU (see module docs).

    Args:
        g: gain-reduction curve, shape (bs, ch, T).
        alpha_attack / alpha_release: coefficients broadcastable to
            (bs, 1, 1).
        time_block: samples streamed through VMEM per grid step. Mosaic
            compile time grows steeply with the per-kernel loop length
            (1024 -> ~4 s per kernel, 4096 -> ~180 s), while runtime barely
            changes; keep it moderate.
        interpret: force interpreter mode (default: off-TPU only).
        y0: carried envelope state, shape ``g.shape[:-1]`` (None = from
            rest). Differentiable — chunk-chained evaluation equals the
            one-shot render bitwise, which is what the sequence-sharded
            relay (parallel.sharded_ballistics_smooth mode="exact_pallas")
            and streaming chunk loops rely on.
        return_yf: also return the final state tuple
            ``(y[..., -1], y[..., -1])`` (the same convention as
            ops.iir.ballistics_smooth mode="exact").

    Returns:
        Smoothed curve, same shape as g; with ``return_yf`` a tuple
        ``(y, (yf, yf))``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    bs, ch, T = g.shape
    rows_tm = g.reshape(bs * ch, T).T  # (T, R) time-major
    aa = jnp.broadcast_to(jnp.asarray(alpha_attack, g.dtype).reshape(bs, 1, 1), (bs, ch, 1))
    ar = jnp.broadcast_to(jnp.asarray(alpha_release, g.dtype).reshape(bs, 1, 1), (bs, ch, 1))
    if y0 is None:
        y0_rows = jnp.zeros((1, bs * ch), g.dtype)
    else:
        y0_rows = jnp.asarray(y0, g.dtype).reshape(1, bs * ch)
    y = _ballistics_rows(
        rows_tm, aa.reshape(1, bs * ch), ar.reshape(1, bs * ch), y0_rows,
        time_block, interpret
    )
    out = y.T.reshape(bs, ch, T)
    if return_yf:
        yf = out[..., -1]
        return out, (yf, yf)
    return out
