"""Multi-device parallelism: mesh helpers, batch sharding, sequence-sharded
convolution (TPU-first addition; the reference is single-device)."""

from .mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
from .sharded import (
    sharded_ballistics_smooth,
    sharded_fft_conv_causal,
    sharded_multi_resolution_stft_loss,
    sharded_sosfilt_coupled,
    sharded_tv_freq_filter,
    sharded_onepole,
    sharded_tv_power,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "sharded_fft_conv_causal",
    "sharded_sosfilt_coupled",
    "sharded_tv_freq_filter",
    "sharded_tv_power",
    "sharded_multi_resolution_stft_loss",
    "sharded_ballistics_smooth",
    "sharded_onepole",
]
