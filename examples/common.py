"""Shared plumbing for the example trainers: args, data iteration,
checkpoint/metrics wiring. The reference hardcodes paths and hyperparams
in __main__ blocks (SURVEY.md §5 config); here every example takes
argparse flags and falls back to synthetic audio when no --data-dir is
given (the reference's datasets are not redistributable)."""

from __future__ import annotations

import argparse
import os
import sys
from typing import Iterator, Optional

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# make the JAX_PLATFORMS env var reliable for all examples: a sitecustomize
# can latch another platform at interpreter start, in which case the env var
# is ignored — the config API is honored as long as no backend initialized
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from dasp_tpu.utils.audio import index_wav_dataset, synthetic_batch  # noqa: E402


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--data-dir", type=str, default=None,
                   help="directory of wav files; omit to train on synthetic audio")
    p.add_argument("--log-dir", type=str, default=None)
    p.add_argument("--steps", type=int, default=1000, help="total optimization steps")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--length", type=int, default=131072, help="clip length in samples")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--sample-rate", type=int, default=44100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true",
                   help="tiny shapes / shallow nets for a fast functional check")
    p.add_argument("--checkpoint-every", type=int, default=200)
    p.add_argument("--resume", action="store_true", help="resume from the last checkpoint")
    p.add_argument("--filter-method", default="fsm",
                   choices=["fsm", "exact", "pallas", "block", "coupled"],
                   help="IIR evaluation for EQ-based effects: 'fsm' = reference "
                        "parity; 'block' = exact block-state MXU formulation, "
                        "fastest on TPU (see docs/PERFORMANCE.md)")
    p.add_argument("--auraloss-compat", action="store_true",
                   help="bit-exact auraloss loss semantics (hops 120/240/50 "
                        "defaults, per-item spectral convergence, time-domain "
                        "A-weighting FIR prefilter) instead of the TPU-native "
                        "defaults; matches the reference examples' training "
                        "loss exactly, compiles slower")
    p.add_argument("--smoother", default=None,
                   choices=["fsm", "parallel", "attack_only", "pallas", "block",
                            "exact_pallas"],
                   help="envelope smoother for dynamics effects: 'fsm' = reference "
                        "parity (attack-only); 'block' = same filter, fastest on TPU; "
                        "'parallel'/'exact_pallas' = true attack/release ballistics. "
                        "Default: the processor's own default ('fsm' for the "
                        "compressor, 'parallel' for the expander)")
    return p


def _batches(args, channels: int, seed: int, examples=None) -> Iterator[np.ndarray]:
    rng = np.random.default_rng(seed)
    if examples is not None:
        from dasp_tpu.utils.audio import load_clip_batch
        while True:
            idx = rng.choice(len(examples), size=args.batch_size, replace=True)
            # pooled native loader: one contiguous buffer, range reads,
            # C++ threads (python fallback inside); mono files repeat to
            # fill a stereo request like the reference channel handling
            yield load_clip_batch([examples[i] for i in idx], args.length,
                                  channels=channels, mono_mix=(channels == 1),
                                  pad_mode="repeat")
    else:
        while True:
            b = synthetic_batch(rng, args.batch_size, args.length, args.sample_rate)
            if channels > 1:
                b = np.repeat(b, channels, axis=1)
            yield b


def batch_iterator(args, channels: int = 1, prefetch: int = 4,
                   num_workers: int = 2) -> Iterator[np.ndarray]:
    """Yield (batch, channels, length) float32 batches forever, produced
    by ``num_workers`` background threads up to ``prefetch`` batches ahead
    (the reference's DataLoader(num_workers=8) analogue,
    style_transfer.py:401-406; see dasp_tpu.utils.pipeline)."""
    from dasp_tpu.utils import threaded_iterator

    examples = None
    if args.data_dir:
        examples = index_wav_dataset(args.data_dir, args.length)
        if not examples:
            raise SystemExit(f"no usable wav chunks of length {args.length} in {args.data_dir}")
        print(f"dataset: {len(examples)} chunks from {args.data_dir}")

    return threaded_iterator(
        lambda wid: _batches(args, channels, args.seed + 7919 * wid, examples),
        num_workers=num_workers, prefetch=prefetch,
    )


def device_batches(args, channels: int = 1, prefetch: int = 4,
                   num_workers: int = 2, depth: int = 2,
                   wire: str = "i16") -> Iterator:
    """:func:`batch_iterator` plus async staged host->device transfer.

    Batches travel over the int16 wire by default — half the fp32 bytes
    on the host->device link and BIT-exact for 16-bit-PCM-sourced wav
    datasets (dasp_tpu.utils.pipeline.wire_encode) — with ``depth``
    transfers in flight so the device never waits on a blocking
    ``jnp.asarray``. Yields on-device float32 batches."""
    from dasp_tpu.utils import device_prefetch

    return device_prefetch(
        batch_iterator(args, channels=channels, prefetch=prefetch,
                       num_workers=num_workers),
        size=depth, wire=wire)
