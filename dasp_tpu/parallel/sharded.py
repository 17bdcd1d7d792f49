"""Sequence-parallel FIR convolution via shard_map + halo exchange.

The reference's only long-sequence strategy is "make the FFT bigger"
(SURVEY.md §5). TPU-native long audio shards the time axis across the
mesh's "sp" axis: each device convolves its local block after receiving a
(K-1)-sample halo from its left neighbour over ICI (``lax.ppermute``).
This is the audio-DSP analogue of context parallelism: compute and memory
per device drop by the sp factor while the result is bit-equal to the
unsharded causal convolution.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.fir import fft_conv_causal

# jax>=0.8 moved shard_map out of experimental
try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

__all__ = [
    "sharded_fft_conv_causal",
    "sharded_sosfilt_coupled",
    "sharded_tv_freq_filter",
    "sharded_tv_power",
    "sharded_multi_resolution_stft_loss",
    "sharded_ballistics_smooth",
    "sharded_onepole",
]


def _direct_causal_conv(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Causal convolution as a grouped lax.conv (per batch-item kernels).

    Used for short IRs and inside shard_map on the CPU backend, where the
    rfft grad path can hit XLA-CPU's row-major-only fft thunk.
    """
    bs, ch, T = x.shape
    h = jnp.broadcast_to(h, (bs, ch, h.shape[-1]))
    K = h.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (K - 1, 0)))
    lhs = xp.reshape(1, bs * ch, T + K - 1)
    rhs = jnp.flip(h.reshape(bs * ch, 1, K), -1)
    out = lax.conv_general_dilated(
        lhs, rhs, (1,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=bs * ch,
        # bit-compatibility with the fp32 FFT path requires fp32
        # accumulation (TPU convs default to bf16)
        precision=lax.Precision.HIGHEST,
    )
    return out.reshape(bs, ch, T)


def _halo_conv_block(
    x_blk: jnp.ndarray, h: jnp.ndarray, halo: int, axis_name: str, method: str
) -> jnp.ndarray:
    """Per-device body: receive left halo, convolve, crop.

    x_blk: (..., T_local) local sequence block; h: (..., K) replicated IR.
    """
    conv = _direct_causal_conv if method == "direct" else fft_conv_causal
    if halo == 0:  # 1-tap IR: pointwise, nothing to exchange
        return conv(x_blk, h)

    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    # send our last `halo` samples to the right neighbour (shift-right ring)
    tail = x_blk[..., -halo:]
    left_halo = lax.ppermute(tail, axis_name, perm=[(i, (i + 1) % n) for i in range(n)])
    # device 0 has no history: zero its halo
    left_halo = jnp.where(idx == 0, jnp.zeros_like(left_halo), left_halo)

    x_ext = jnp.concatenate([left_halo, x_blk], axis=-1)
    y = conv(x_ext, h)
    return y[..., halo:]


def sharded_fft_conv_causal(
    x: jnp.ndarray,
    h: jnp.ndarray,
    mesh: Mesh,
    seq_axis_name: str = "sp",
    method: str = "auto",
) -> jnp.ndarray:
    """Causal FIR convolution with the time axis sharded over the mesh.

    Bit-compatible with ``ops.fir.fft_conv_causal`` (same zero initial
    history), but each device only touches T / sp_size samples plus a
    (K-1)-sample halo.

    Args:
        x: signal (bs, ch, T); T must divide by the sp axis size, and
            T / sp_size must be >= K - 1 (single-neighbour halo).
        h: impulse response (bs, ch, K) or broadcastable.
        mesh: a mesh containing ``seq_axis_name``.
        seq_axis_name: mesh axis to shard time over.
        method: "fft", "direct" (grouped lax.conv) or "auto" (direct for
            IRs up to 4096 taps — also the safe path for grads on the CPU
            backend, whose fft thunk requires row-major layouts).

    Returns:
        y = causal conv, sharded over the sequence axis.
    """
    sp = mesh.shape[seq_axis_name]
    T = x.shape[-1]
    K = h.shape[-1]
    if method == "auto":
        method = "direct" if K <= 4096 else "fft"
    halo = K - 1
    assert T % sp == 0, f"sequence length {T} not divisible by sp={sp}"
    assert T // sp >= halo, (
        f"local block {T // sp} shorter than halo {halo}; reduce sp or IR length"
    )

    fn = shard_map(
        partial(_halo_conv_block, halo=halo, axis_name=seq_axis_name, method=method),
        mesh=mesh,
        in_specs=(P(None, None, seq_axis_name), P()),
        out_specs=P(None, None, seq_axis_name),
    )
    # optimization_barrier fences layout propagation between the shard_map
    # region and surrounding FFT ops (XLA-CPU's fft thunk requires row-major
    # inputs and chokes on layouts chosen across the boundary)
    x, h = lax.optimization_barrier((x, h))
    return lax.optimization_barrier(fn(x, h))


def sharded_sosfilt_coupled(
    sos: jnp.ndarray,
    x: jnp.ndarray,
    mesh: Mesh,
    seq_axis_name: str = "sp",
    block: int = 128,
) -> jnp.ndarray:
    """Exact biquad-cascade IIR with the TIME axis sharded over the mesh —
    a true recurrence evaluated across chips.

    Each device runs the coupled-form block-state chain
    (``ops.iir.sosfilt_coupled``) on its local sequence shard from rest;
    one tiny per-section ``all_gather`` (a 2x2 matrix + 2-vector per
    row, a few hundred bytes over ICI) communicates every shard's affine
    state map, and each device linearly corrects its outputs with its
    true incoming state. Bit-compatible with the unsharded filter up to
    fp32 reassociation; compute and memory per device drop by the sp
    factor. This is the IIR counterpart of
    :func:`sharded_fft_conv_causal`'s halo exchange — together they make
    every effect's hot path sequence-shardable.

    Args:
        sos: (bs, n_sections, 6), a0 normalized to 1 (replicated).
        x: signal (bs, ch, T); T must divide by the sp axis size and the
            per-device shard by ``block``.
        mesh: a mesh containing ``seq_axis_name``.
        seq_axis_name: mesh axis to shard time over.
        block: intra-block length of the block-state formulation.

    Returns:
        Filtered signal, sharded over the sequence axis like x.
    """
    from ..ops.iir import sosfilt_coupled

    sp = mesh.shape[seq_axis_name]
    T = x.shape[-1]
    assert T % sp == 0, f"sequence length {T} not divisible by sp={sp}"
    assert (T // sp) % block == 0, (
        f"per-device shard {T // sp} not divisible by block={block}"
    )

    fn = shard_map(
        partial(sosfilt_coupled, block=block, seq_axis_name=seq_axis_name),
        mesh=mesh,
        in_specs=(P(), P(None, None, seq_axis_name)),
        out_specs=P(None, None, seq_axis_name),
    )
    x_b, sos_b = lax.optimization_barrier((x, sos))
    return lax.optimization_barrier(fn(sos_b, x_b))


# ---------------------------------------------------------------------------
# Sequence-parallel dynamics smoothing (compressor/expander/limiter
# envelopes). A one-pole y[n] = a[n] y[n-1] + (1-a[n]) g[n] is LINEAR in
# its initial state, so each device runs its local scan from rest and
# linearly corrects with its true incoming state:
#
#     y(t; y_in) = y_zero(t) + C(t) * y_in,   C(t) = prod_{s<=t} a[s]
#
# One tiny all_gather of every shard's affine state map (f_d, P_d) =
# (y_zero[-1], C[-1]) — two scalars per (bs, ch) over ICI — and each
# device composes the maps of the shards to its left. The same pattern
# as sharded_sosfilt_coupled, specialized to first order. The ballistics
# smoother's "parallel" mode is two such passes plus ONE boundary sample
# exchanged for its delayed attack/release comparison, so the dynamics
# stage stays sequence-sharded instead of idling the sp axis
# (functional._smooth_gain accepts these as callables).
# ---------------------------------------------------------------------------


def _onepole_block(g_blk: jnp.ndarray, alpha_blk: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Per-device exact time-varying one-pole with cross-shard correction.

    g_blk, alpha_blk: (bs, ch, T_local); the recurrence continues across
    shards exactly as if run unsharded from rest (up to fp32
    reassociation in the cumprod correction).
    """
    from ..ops.iir import onepole_varying

    y_zero = onepole_varying(g_blk, alpha_blk)           # local, from rest
    C = jnp.cumprod(alpha_blk, axis=-1)                  # dy/dy_in
    f_loc, P_loc = y_zero[..., -1], C[..., -1]           # shard's affine map

    n = lax.axis_size(axis_name)
    f_all = lax.all_gather(f_loc, axis_name)             # (n, bs, ch)
    P_all = lax.all_gather(P_loc, axis_name)
    y_in = jnp.zeros_like(f_loc)
    y_ins = []
    for k in range(n):                                   # n is static, tiny
        y_ins.append(y_in)
        y_in = f_all[k] + P_all[k] * y_in
    d = lax.axis_index(axis_name)
    y_in_d = lax.dynamic_index_in_dim(jnp.stack(y_ins), d, 0, keepdims=False)
    return y_zero + C * y_in_d[..., None]


def _ballistics_parallel_block(g_blk, aa, ar, axis_name):
    """Per-device body of the sharded "parallel" ballistics smoother —
    value-equal to ops.iir.ballistics_smooth(mode="parallel") up to fp32
    reassociation."""
    aa_b = jnp.broadcast_to(aa, g_blk.shape).astype(g_blk.dtype)
    ar_b = jnp.broadcast_to(ar, g_blk.shape).astype(g_blk.dtype)
    y_a = _onepole_block(g_blk, aa_b, axis_name)         # attack pass

    # the delayed comparison sample crosses the shard boundary
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    prev = lax.ppermute(y_a[..., -1:], axis_name,
                        perm=[(i, (i + 1) % n) for i in range(n)])
    prev = jnp.where(idx == 0, jnp.zeros_like(prev), prev)
    y_prev = jnp.concatenate([prev, y_a[..., :-1]], axis=-1)

    alpha = jnp.where(g_blk < y_prev, aa_b, ar_b)
    return _onepole_block(g_blk, alpha, axis_name)


def sharded_onepole(
    g: jnp.ndarray,
    alpha: jnp.ndarray,
    mesh: Mesh,
    seq_axis_name: str = "sp",
    batch_axis_name=None,
) -> jnp.ndarray:
    """Exact (time-varying) one-pole smoother with the TIME axis sharded.

    Same recurrence as :func:`dasp_tpu.ops.iir.onepole_varying` from
    rest; each device scans its T/sp block and linearly corrects with
    its true incoming state (one tiny all_gather of per-shard affine
    maps over ICI). ``alpha`` broadcasts against g (constant (bs, 1, 1)
    coefficients stay replicated; per-sample coefficients shard with g).

    ``batch_axis_name``: mesh axis to ALSO split the batch over.
    """
    sp = mesh.shape[seq_axis_name]
    if sp == 1:
        from ..ops.iir import onepole_varying

        return onepole_varying(g, alpha)
    T = g.shape[-1]
    assert T % sp == 0, f"sequence length {T} not divisible by sp={sp}"

    per_sample = (jnp.ndim(alpha) == g.ndim and alpha.shape[-1] == T)
    b = batch_axis_name
    if per_sample:
        a_spec = P(b, None, seq_axis_name)
    elif jnp.ndim(alpha) >= 1 and jnp.shape(alpha)[0] == g.shape[0]:
        a_spec = P(b)  # per-item coefficients split with the batch
    else:
        a_spec = P()

    def body(g_blk, a_blk):
        return _onepole_block(
            g_blk, jnp.broadcast_to(a_blk, g_blk.shape).astype(g_blk.dtype),
            seq_axis_name)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(b, None, seq_axis_name), a_spec),
                   out_specs=P(b, None, seq_axis_name))
    g_b, a_b = lax.optimization_barrier((g, jnp.asarray(alpha, g.dtype)))
    return lax.optimization_barrier(fn(g_b, a_b))


def _ballistics_exact_relay_block(g_blk, aa, ar, axis_name, mode):
    """Per-device body of the sharded EXACT ballistics smoother.

    The branching recursion (alpha picked by comparing g[n] against the
    true y[n-1]) is nonlinear in its state, so shards cannot run from
    rest and linearly correct like :func:`_onepole_block`. Instead the
    scalar envelope state relays sequentially across the sp ring: shard
    k runs its local exact kernel once its true incoming state arrives
    from shard k-1 (one (bs, ch, 1) ppermute per hop). Compute per shard
    is T/sp but serialized by the data dependency — total latency ~ one
    unsharded scan plus sp tiny hops; g itself stays sharded (memory and
    all surrounding chain stages keep their sp savings), and the result
    is BITWISE equal to the unsharded kernel. Each relay step re-runs
    every shard's kernel with its best-known state (results of shards
    > k are discarded via jnp.where); on an SPMD mesh the idle shards
    would stall at the ppermute anyway, so this costs no wall-clock over
    a masked/conditional formulation and keeps the program collective-
    uniform.
    """
    from ..ops.iir import ballistics_smooth
    from ..ops.pallas_ballistics import ballistics_pallas

    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    # derive the initial state/output from the varying input (a fresh
    # jnp.zeros would be sp-UNvarying and trip shard_map's vma check in
    # the scan carry / where lattice)
    y0 = g_blk[..., 0] * 0
    y_out = jnp.zeros_like(g_blk)
    for k in range(n):  # n is static and tiny (the sp factor)
        if mode == "exact_pallas":
            y_k = ballistics_pallas(g_blk, aa, ar, y0=y0)
        else:  # "exact": the lax.scan reference kernel
            y_k = ballistics_smooth(g_blk, aa, ar, mode="exact", y0=(y0, y0))
        y_out = jnp.where(idx == k, y_k, y_out)
        yf = lax.ppermute(y_k[..., -1], axis_name, perm=perm)
        if k + 1 < n:
            y0 = jnp.where(idx == k + 1, yf, y0)
    return y_out


def sharded_ballistics_smooth(
    g: jnp.ndarray,
    alpha_attack: jnp.ndarray,
    alpha_release: jnp.ndarray,
    mesh: Mesh,
    seq_axis_name: str = "sp",
    mode: str = "exact_pallas",
    batch_axis_name=None,
) -> jnp.ndarray:
    """Sequence-sharded dual-time-constant ballistics smoothing.

    Drop-in for the unsharded smoothers with the time axis sharded over
    the mesh's ``seq_axis_name``. Pass
    ``functools.partial(sharded_ballistics_smooth, mesh=mesh)`` as a
    processor's ``smoother=`` to keep the dynamics stage sp-sharded in a
    multi-chip chain (see functional._smooth_gain).

    Modes and their unsharded equivalents:

      * ``"exact_pallas"`` (default) / ``"exact"``: the true branching
        ballistics — BITWISE equal to ``ops.pallas_ballistics.
        ballistics_pallas`` / ``ops.iir.ballistics_smooth(mode="exact")``.
        The scalar state relays sequentially across sp shards (one
        (bs, ch) ppermute per hop, see :func:`_ballistics_exact_relay_block`)
        — latency ~ one unsharded scan, memory and the rest of the chain
        keep their sp savings. The default matches the single-chip
        dynamics default, so an sp>1 run trains through the SAME numerics
        as the same script on one chip.
      * ``"parallel"`` / ``"attack_only"``: the associative two-pass
        approximation / the attack-only one-pole — value-equal to
        ``ops.iir.ballistics_smooth`` of the same mode up to fp32
        reassociation, fully parallel across shards (per-shard scans +
        affine state-map correction, no serialization).

    Args:
        g: gain-reduction curve (bs, ch, T), sp | T.
        alpha_attack / alpha_release: (bs,)/(bs, 1, 1) coefficients.
        mesh / seq_axis_name / batch_axis_name: as in
            :func:`sharded_fft_conv_causal`.
        mode: "exact_pallas" (default), "exact", "parallel" or
            "attack_only".
    """
    if mode not in ("exact_pallas", "exact", "parallel", "attack_only"):
        raise ValueError(
            f"sharded_ballistics_smooth mode must be one of 'exact_pallas', "
            f"'exact', 'parallel', 'attack_only'; got {mode!r}")
    sp = mesh.shape[seq_axis_name]
    aa = jnp.reshape(alpha_attack, (g.shape[0],) + (1,) * (g.ndim - 1))
    ar = jnp.reshape(alpha_release, (g.shape[0],) + (1,) * (g.ndim - 1))
    if sp == 1:
        if mode == "exact_pallas":
            from ..ops.pallas_ballistics import ballistics_pallas

            return ballistics_pallas(g, aa, ar)
        from ..ops.iir import ballistics_smooth

        return ballistics_smooth(g, aa, ar, mode=mode)
    if mode == "attack_only":
        return sharded_onepole(g, aa, mesh, seq_axis_name,
                               batch_axis_name=batch_axis_name)
    T = g.shape[-1]
    assert T % sp == 0, f"sequence length {T} not divisible by sp={sp}"

    b = batch_axis_name
    body = (partial(_ballistics_parallel_block, axis_name=seq_axis_name)
            if mode == "parallel"
            else partial(_ballistics_exact_relay_block,
                         axis_name=seq_axis_name, mode=mode))
    fn = shard_map(
        body,
        mesh=mesh,
        # the per-item (bs, 1, 1) coefficients split over the batch axis
        # alongside g (replicated when no batch axis)
        in_specs=(P(b, None, seq_axis_name), P(b), P(b)),
        out_specs=P(b, None, seq_axis_name),
        # pallas_call can't declare vma on its out ShapeDtypeStructs, so
        # the varying-axis lattice check must be off for the relay modes
        check_vma=(mode == "parallel"),
    )
    g_b, aa_b, ar_b = lax.optimization_barrier(
        (g, jnp.asarray(aa, g.dtype), jnp.asarray(ar, g.dtype)))
    return lax.optimization_barrier(fn(g_b, aa_b, ar_b))


# ---------------------------------------------------------------------------
# Sequence-parallel WOLA (time-varying filtering) and STFT losses.
#
# The WOLA machinery (ops.tv_filter) is the hot path of the modulation /
# spectral effect families (phaser, auto_wah, dynamic_eq, spectral_gate).
# Frames are independent given an input halo, so the frame axis shards
# cleanly over the mesh's sp axis:
#
#   * analysis: each device computes the frames that READ its local
#     sequence block, after a (frame_size - hop)-sample halo exchange;
#   * synthesis: each device computes the frames that WRITE its local
#     output block — frames whose n_fft-long tails cross a shard boundary
#     are *recomputed* on the right neighbour (an extra n_fft/hop - 1
#     frames, a few percent) instead of exchanging output tails, so the
#     only communication is the tiny input halo.
#
# Both are bit-compatible with the unsharded ops up to fp32 reassociation.
# ---------------------------------------------------------------------------

import math

import numpy as np


def _ring_halo(x_blk, lh: int, rh: int, axis_name: str):
    """Extend a local sequence block with lh samples from the left
    neighbour and rh from the right (zeros at the mesh edges — matching
    the zero padding the unsharded framing applies at the signal edges)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    parts = []
    if lh:
        left = lax.ppermute(
            x_blk[..., -lh:], axis_name, perm=[(i, (i + 1) % n) for i in range(n)]
        )
        parts.append(jnp.where(idx == 0, jnp.zeros_like(left), left))
    parts.append(x_blk)
    if rh:
        right = lax.ppermute(
            x_blk[..., :rh], axis_name, perm=[(i, (i - 1) % n) for i in range(n)]
        )
        parts.append(jnp.where(idx == n - 1, jnp.zeros_like(right), right))
    return jnp.concatenate(parts, axis=-1)


def _frames_rdft(frames, n_fft: int):
    """rfft of zero-padded frames as two DFT matmuls (re, im).

    XLA-CPU's fft thunk RET_CHECKs row-major operands, which layouts
    chosen around shard_map regions violate (see utils.loss._rdft_mag);
    matmuls are layout-agnostic. Also the fast TPU path for small
    transforms (ops.dft, fp32 HIGHEST on the MXU).
    """
    from ..ops.dft import rdft

    return rdft(frames, n_fft)


def _irdft_ola_tables(n_fft: int):
    """(n_bins, n_fft) synthesis matrices: y = Yr @ A + Yi @ B."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[:, None]
    m = np.arange(n_fft)[None, :]
    c = np.full((n_bins, 1), 2.0)
    c[0] = 1.0
    c[-1] = 1.0
    ang = 2.0 * np.pi * k * m / n_fft
    A = (c * np.cos(ang) / n_fft).astype(np.float32)
    B = (-c * np.sin(ang) / n_fft).astype(np.float32)
    return A, B


def _use_dft(fft_mode: str) -> bool:
    if fft_mode == "auto":
        return jax.default_backend() == "cpu"
    return fft_mode == "dft"


def _tv_filter_block(x_blk, Hp, *, frame_size, hop, axis_name, fft_mode):
    """Per-device body of :func:`sharded_tv_freq_filter`.

    x_blk: (bs, chs, T_local); Hp: replicated response, zero-padded with
    q = n_fft/hop - frame_size/hop phantom rows at the FRONT so device
    d's F = T_local/hop + n_fft/hop - 1 frames slice rows
    [d*T_local/hop, ...) — phantom frames multiply to zero exactly where
    the unsharded OLA has no frame.
    """
    from ..ops.tv_filter import tv_analysis_window
    from ..utils.loss import _frame

    bs, chs, T_local = x_blk.shape
    n_bins = Hp.shape[-1]
    n_fft = 2 * (n_bins - 1)
    Th = T_local // hop
    F = Th + n_fft // hop - 1

    x_ext = _ring_halo(x_blk, n_fft - hop, frame_size - hop, axis_name)
    frames = _frame(x_ext, frame_size, hop)  # (bs, chs, F, frame_size)
    frames = frames * jnp.asarray(tv_analysis_window(frame_size, hop))

    d = lax.axis_index(axis_name)
    H_loc = lax.dynamic_slice_in_dim(Hp, d * Th, F, axis=1)  # (bs, F, n_bins)
    Hr, Hi = jnp.real(H_loc)[:, None], jnp.imag(H_loc)[:, None]

    if _use_dft(fft_mode):
        Xr, Xi = _frames_rdft(frames, n_fft)
        Yr = Xr * Hr - Xi * Hi
        Yi = Xr * Hi + Xi * Hr
        A, B = _irdft_ola_tables(n_fft)
        yf = Yr @ jnp.asarray(A) + Yi @ jnp.asarray(B)
    else:
        X = jnp.fft.rfft(frames, n_fft, axis=-1)
        Y = X * (Hr + 1j * Hi).astype(X.dtype)
        yf = jnp.fft.irfft(Y, n_fft, axis=-1)

    # overlap-add at hop (static diagonal shifts — no scatter), then crop
    # to the local output window: frame j starts at output-local
    # j*hop - (n_fft - hop)
    nch = n_fft // hop
    yc = yf.reshape(bs, chs, F, nch, hop)
    out = sum(
        jnp.pad(yc[:, :, :, k], ((0, 0), (0, 0), (k, nch - 1 - k), (0, 0)))
        for k in range(nch)
    )
    y = out.reshape(bs, chs, (F + nch - 1) * hop)
    return y[..., n_fft - hop : n_fft - hop + T_local]


def _check_tv_shard(T: int, frame_size: int, hop: int, halo: int, sp: int):
    if T % sp != 0:
        raise ValueError(f"sequence length {T} not divisible by sp={sp}")
    T_local = T // sp
    if T_local % hop != 0:
        raise ValueError(
            f"per-device shard {T_local} not divisible by hop={hop}"
        )
    if T_local < halo:
        raise ValueError(
            f"per-device shard {T_local} shorter than the halo {halo}; "
            f"reduce sp (or the FFT/frame size)"
        )


def sharded_tv_freq_filter(
    x: jnp.ndarray,
    H: jnp.ndarray,
    frame_size: int,
    hop: int,
    mesh: Mesh,
    seq_axis_name: str = "sp",
    fft_mode: str = "auto",
    batch_axis_name=None,
) -> jnp.ndarray:
    """Sequence-sharded :func:`dasp_tpu.ops.tv_filter.tv_freq_filter`.

    Same contract (x: (bs, chs, T); H: (bs, n_frames, n_bins) per-frame
    response — real or complex) and the same result up to fp32
    reassociation, with the time axis sharded over the mesh's
    ``seq_axis_name``: each device analyses, filters and overlap-adds
    only the frames covering its T/sp-sample block (plus n_fft/hop - 1
    recomputed boundary frames), exchanging an (n_fft - hop)-sample
    input halo over ICI. H stays replicated over sp — it is
    n_frames x n_bins, tiny next to the frame tensors, and its gradient
    psums automatically through the shard_map transpose.

    Extra constraints vs the unsharded op: sp | T, hop | T/sp, and
    T/sp >= n_fft - hop.

    ``fft_mode``: "fft", "dft" (layout-agnostic DFT matmuls) or "auto"
    (dft on the CPU backend, whose fft thunk rejects the layouts
    shard_map regions produce; true FFTs elsewhere).

    ``batch_axis_name``: name of a mesh axis (e.g. "dp") to ALSO split
    the batch dimension over — composing with data parallelism instead
    of redundantly recomputing the frames on every dp row. Requires
    dp | bs.
    """
    from ..ops.tv_filter import tv_freq_filter, tv_frame_count

    sp = mesh.shape[seq_axis_name]
    if sp == 1:
        return tv_freq_filter(x, H, frame_size, hop)

    bs, chs, T = x.shape
    n_bins = H.shape[-1]
    n_fft = 2 * (n_bins - 1)
    n_frames = tv_frame_count(T, frame_size, hop)
    if H.shape[0] != bs or H.shape[1] != n_frames:
        raise ValueError(
            f"H has shape {H.shape}; expected ({bs}, {n_frames}, n_bins) "
            f"for seq_len={T}, frame_size={frame_size}, hop={hop}."
        )
    if frame_size % (2 * hop) != 0:
        raise ValueError(
            f"frame_size ({frame_size}) must be a multiple of 2*hop ({2 * hop})."
        )
    if n_fft < 2 * frame_size or n_fft % hop != 0:
        raise ValueError(
            f"n_fft ({n_fft}) must be >= 2*frame_size ({2 * frame_size}) "
            f"and a multiple of hop ({hop})."
        )
    _check_tv_shard(T, frame_size, hop, n_fft - hop, sp)

    q = n_fft // hop - frame_size // hop
    Hp = jnp.pad(H.astype(jnp.complex64), ((0, 0), (q, 0), (0, 0)))

    b = batch_axis_name
    fn = shard_map(
        partial(
            _tv_filter_block,
            frame_size=frame_size,
            hop=hop,
            axis_name=seq_axis_name,
            fft_mode=fft_mode,
        ),
        mesh=mesh,
        in_specs=(P(b, None, seq_axis_name), P(b)),
        out_specs=P(b, None, seq_axis_name),
    )
    x_b, Hp_b = lax.optimization_barrier((x, Hp))
    return lax.optimization_barrier(fn(x_b, Hp_b))


def _tv_power_block(x_blk, *, frame_size, hop, n_fft, axis_name, fft_mode):
    """Per-device body of :func:`sharded_tv_power`: the
    F2 = T_local/hop + frame_size/hop - 1 analysis frames starting at
    global row d*T_local/hop (consecutive devices overlap by
    frame_size/hop - 1 rows; the caller deduplicates)."""
    from ..ops.tv_filter import tv_analysis_window
    from ..utils.loss import _frame

    left = frame_size - hop
    x_ext = _ring_halo(x_blk, left, left, axis_name)
    frames = _frame(x_ext, frame_size, hop)  # (bs, chs, F2, frame_size)
    frames = frames * jnp.asarray(tv_analysis_window(frame_size, hop))
    if _use_dft(fft_mode):
        re, im = _frames_rdft(frames, n_fft)
        P_loc = re**2 + im**2
    else:
        X = jnp.fft.rfft(frames, n_fft, axis=-1)
        P_loc = X.real**2 + X.imag**2
    return jnp.mean(P_loc, axis=1)  # (bs, F2, n_bins)


def sharded_tv_power(
    x: jnp.ndarray,
    frame_size: int,
    hop: int,
    n_fft: int,
    mesh: Mesh,
    seq_axis_name: str = "sp",
    fft_mode: str = "auto",
    batch_axis_name=None,
) -> jnp.ndarray:
    """Channel-mean power spectrogram of the WOLA analysis frames —
    ``mean_chs |tv_stft(x)|^2`` with the frame computation sequence-
    sharded over the mesh (each device transforms the frames reading its
    local block after a (frame_size - hop)-sample halo exchange).

    The result, (bs, n_frames, n_bins), is the *global* frame sequence
    (replicated over sp) — it is what the spectral detectors (dynamic_eq,
    spectral_gate) consume for their frame-rate gain logic, which is
    orders of magnitude cheaper than the transforms and stays replicated.
    ``batch_axis_name``: mesh axis to also split the batch over (see
    :func:`sharded_tv_freq_filter`).
    """
    bs, chs, T = x.shape
    sp = mesh.shape[seq_axis_name]
    if sp == 1:
        from ..ops.tv_filter import tv_stft

        X = tv_stft(x, frame_size, hop, n_fft)
        return jnp.mean(X.real**2 + X.imag**2, axis=1)
    if frame_size % (2 * hop) != 0:
        raise ValueError(
            f"frame_size ({frame_size}) must be a multiple of 2*hop ({2 * hop})."
        )
    _check_tv_shard(T, frame_size, hop, frame_size - hop, sp)
    T_local = T // sp
    Th = T_local // hop
    F2 = Th + frame_size // hop - 1

    fn = shard_map(
        partial(
            _tv_power_block,
            frame_size=frame_size,
            hop=hop,
            n_fft=n_fft,
            axis_name=seq_axis_name,
            fft_mode=fft_mode,
        ),
        mesh=mesh,
        in_specs=(P(batch_axis_name, None, seq_axis_name),),
        out_specs=P(batch_axis_name, seq_axis_name, None),
    )
    (x_b,) = lax.optimization_barrier((x,))
    Pg = lax.optimization_barrier(fn(x_b))  # (bs, sp*F2, n_bins)
    # deduplicate the frame_size/hop - 1 overlap rows: rows [0, Th) of
    # every device, plus the last device's tail rows [Th, F2)
    n_bins = Pg.shape[-1]
    Pg = Pg.reshape(bs, sp, F2, n_bins)
    main = Pg[:, :, :Th].reshape(bs, sp * Th, n_bins)
    return jnp.concatenate([main, Pg[:, -1, Th:]], axis=1)


def _mrstft_partial(
    yh, y, *, fft_size, hop, win, sp, axis_name, w_sc, w_log_mag, w_lin_mag,
    eps, use_dft, auraloss_compat, weight, batch_axis_name=None, dp=1,
):
    """One resolution's loss from gathered signals, frames sharded over
    ``axis_name``: device d computes frames [d*F_each, (d+1)*F_each)
    (masked past the true count) and all reductions psum."""
    from ..utils.loss import _frame, _hann

    T = y.shape[-1]
    pad = fft_size // 2
    yhp = jnp.pad(yh, [(0, 0)] * (yh.ndim - 1) + [(pad, pad)], mode="reflect")
    yp = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")

    n_frames = 1 + (T + 2 * pad - fft_size) // hop
    F_each = -(-n_frames // sp)  # ceil
    need = (sp * F_each - 1) * hop + fft_size
    extra = need - yp.shape[-1]
    if extra > 0:
        yhp = jnp.pad(yhp, [(0, 0)] * (yh.ndim - 1) + [(0, extra)])
        yp = jnp.pad(yp, [(0, 0)] * (y.ndim - 1) + [(0, extra)])

    d = lax.axis_index(axis_name)
    W = (F_each - 1) * hop + fft_size
    wh = lax.dynamic_slice_in_dim(yhp, d * F_each * hop, W, axis=-1)
    wy = lax.dynamic_slice_in_dim(yp, d * F_each * hop, W, axis=-1)

    window = _hann(win, y.dtype)
    if win < fft_size:
        lpad = (fft_size - win) // 2
        window = jnp.pad(window, (lpad, fft_size - win - lpad))

    def mag(sig):
        # must mirror utils.loss._mag_from_power exactly: the continuous
        # floor in native mode, auraloss's hard clamp in compat mode
        from ..utils.loss import _mag_from_power

        frames = _frame(sig, fft_size, hop) * window
        if use_dft:
            re, im = _frames_rdft(frames, fft_size)
            return _mag_from_power(re**2 + im**2, eps, not auraloss_compat)
        spec = jnp.fft.rfft(frames, fft_size, axis=-1)
        return _mag_from_power(spec.real**2 + spec.imag**2, eps,
                               not auraloss_compat)

    mag_hat = mag(wh) * weight
    mag_ref = mag(wy) * weight

    mask = (d * F_each + jnp.arange(F_each) < n_frames).astype(y.dtype)
    m = mask[:, None]
    n_bins = fft_size // 2 + 1
    lead = int(np.prod(y.shape[:-1])) * dp  # GLOBAL lead count (dp | bs)
    count = lead * n_frames * n_bins  # static
    # scalar reductions psum over sp; over dp too when the batch is split
    axes = (axis_name,) + ((batch_axis_name,) if batch_axis_name else ())

    loss = jnp.asarray(0.0, y.dtype)
    if w_sc:
        if auraloss_compat:
            # per-item Frobenius sums assemble over sp; the item mean
            # assembles over dp (each dp row holds distinct items)
            num = lax.psum(jnp.sum((mag_ref - mag_hat) ** 2 * m, axis=(-2, -1)), axis_name)
            den = lax.psum(jnp.sum(mag_ref**2 * m, axis=(-2, -1)), axis_name)
            sc_items = jnp.sqrt(num) / jnp.sqrt(den)
            if batch_axis_name:
                sc = lax.psum(jnp.sum(sc_items), batch_axis_name) / lead
            else:
                sc = jnp.mean(sc_items)
        else:
            num = lax.psum(jnp.sum((mag_ref - mag_hat) ** 2 * m), axes)
            den = lax.psum(jnp.sum(mag_ref**2 * m), axes)
            sc = jnp.sqrt(num) / (jnp.sqrt(den) + eps)
        loss = loss + w_sc * sc
    if w_log_mag:
        s = lax.psum(jnp.sum(jnp.abs(jnp.log(mag_ref) - jnp.log(mag_hat)) * m), axes)
        loss = loss + w_log_mag * s / count
    if w_lin_mag:
        s = lax.psum(jnp.sum(jnp.abs(mag_ref - mag_hat) * m), axes)
        loss = loss + w_lin_mag * s / count
    return loss


def sharded_multi_resolution_stft_loss(
    y_hat: jnp.ndarray,
    y: jnp.ndarray,
    mesh: Mesh,
    seq_axis_name: str = "sp",
    fft_sizes=(1024, 2048, 512),
    hop_sizes=None,
    win_lengths=(600, 1200, 240),
    w_sc: float = 1.0,
    w_log_mag: float = 1.0,
    w_lin_mag: float = 0.0,
    perceptual_weighting: bool = False,
    sample_rate=None,
    eps: float = 1e-8,
    fft_mode: str = "auto",
    auraloss_compat: bool = False,
    batch_axis_name=None,
) -> jnp.ndarray:
    """Sequence-sharded :func:`dasp_tpu.utils.multi_resolution_stft_loss`.

    Same semantics and value (up to fp32 reassociation); the STFT frame
    work — the heavy part: framing, windows, transforms, magnitude
    reductions — is split over the mesh's ``seq_axis_name``, each device
    computing an equal static share of every resolution's frames and the
    scalar terms assembling by ``psum``. The signals themselves are
    all-gathered once inside the region (T samples — small next to the
    sharded ~T*fft/hop-element spectrogram tensors).

    ``batch_axis_name``: mesh axis (e.g. "dp") to also split the batch
    over — the loss then psums over BOTH axes, composing sequence
    parallelism with data parallelism in one region.
    """
    from ..utils.loss import a_weighting, a_weighting_fir_taps, fir_prefilter

    sp = mesh.shape[seq_axis_name]
    if sp == 1:
        from ..utils.loss import multi_resolution_stft_loss

        return multi_resolution_stft_loss(
            y_hat, y, fft_sizes=fft_sizes, hop_sizes=hop_sizes,
            win_lengths=win_lengths, w_sc=w_sc, w_log_mag=w_log_mag,
            w_lin_mag=w_lin_mag, perceptual_weighting=perceptual_weighting,
            sample_rate=sample_rate, auraloss_compat=auraloss_compat,
            cpu_fft_workaround=_use_dft(fft_mode),
        )

    if hop_sizes is None:
        hop_sizes = (
            (120, 240, 50) if auraloss_compat else tuple(n // 4 for n in fft_sizes)
        )

    def loss_use_dft(n_fft):
        # auto: CPU -> DFT for layout safety (as before); TPU -> DFT up
        # to the measured MXU-wins size (utils.loss._prefer_dft)
        if fft_mode == "auto":
            from ..utils.loss import _prefer_dft

            return _prefer_dft(n_fft, cpu_fft_workaround=True)
        return fft_mode == "dft"
    taps = (
        a_weighting_fir_taps(sample_rate)
        if (perceptual_weighting and auraloss_compat)
        else None
    )

    def body(yh_blk, y_blk):
        yh = lax.all_gather(yh_blk, seq_axis_name, axis=-1, tiled=True)
        yg = lax.all_gather(y_blk, seq_axis_name, axis=-1, tiled=True)
        if taps is not None:
            yh = fir_prefilter(yh, taps)
            yg = fir_prefilter(yg, taps)
        total = jnp.asarray(0.0, y.dtype)
        for n_fft, hop, win in zip(fft_sizes, hop_sizes, win_lengths):
            if perceptual_weighting and not auraloss_compat:
                freqs = np.fft.rfftfreq(n_fft, 1.0 / sample_rate)
                weight = jnp.asarray(a_weighting(freqs))
            else:
                weight = jnp.asarray(1.0, y.dtype)
            total = total + _mrstft_partial(
                yh, yg, fft_size=n_fft, hop=hop, win=win, sp=sp,
                axis_name=seq_axis_name, w_sc=w_sc, w_log_mag=w_log_mag,
                w_lin_mag=w_lin_mag, eps=eps, use_dft=loss_use_dft(n_fft),
                auraloss_compat=auraloss_compat, weight=weight,
                batch_axis_name=batch_axis_name,
                dp=mesh.shape[batch_axis_name] if batch_axis_name else 1,
            )
        return total / len(fft_sizes)

    b = batch_axis_name
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(b, None, seq_axis_name), P(b, None, seq_axis_name)),
        out_specs=P(),
    )
    yh_b, y_b = lax.optimization_barrier((y_hat, y))
    return fn(yh_b, y_b)
