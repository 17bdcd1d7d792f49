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

__all__ = ["sharded_fft_conv_causal", "sharded_sosfilt_coupled"]


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
