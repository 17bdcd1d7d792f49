"""Demo: a fixed-parameter mastering chain rendered under one jit.

Mirrors the reference examples/demo.py:11-147 (EQ -> compressor ->
distortion -> EQ -> reverb on a guitar DI) with explicit PRNG for the
reverb. Runs on the default JAX device (TPU when available).

    python examples/demo.py [--wav input.wav]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import dasp_tpu as D
from dasp_tpu.utils.audio import load_wav, save_wav, synthetic_batch


def render(x, sample_rate, key):
    bs = x.shape[0]
    f = lambda v: jnp.full((bs,), v)  # noqa: E731

    # bass cut + presence EQ
    x = D.parametric_eq(
        x, sample_rate,
        f(-8.0), f(100.0), f(0.9),       # low shelf down
        f(2.0), f(400.0), f(1.2),        # low-mid bump
        f(3.0), f(2500.0), f(1.5),       # presence
        f(-2.0), f(9000.0), f(1.0),
        f(1.0), f(14000.0), f(0.8),
        f(4.0), f(8000.0), f(0.7),       # high shelf up
    )
    # glue compression
    x = D.compressor(
        x, sample_rate,
        threshold_db=f(-24.0), ratio=f(4.0), attack_ms=f(10.0),
        release_ms=f(80.0), knee_db=f(6.0), makeup_gain_db=f(4.0),
    )
    # drive
    x = D.distortion(x, sample_rate, f(10.0))
    # post-drive tone shaping
    x = D.parametric_eq(
        x, sample_rate,
        f(2.0), f(120.0), f(0.7),
        f(-3.0), f(700.0), f(1.0),
        f(2.0), f(3000.0), f(1.5),
        f(0.0), f(9000.0), f(1.0),
        f(0.0), f(13000.0), f(1.0),
        f(-4.0), f(9000.0), f(0.7),
    )
    # space
    gains = [f(v) for v in (0.9, 0.9, 0.8, 0.8, 0.7, 0.7, 0.6, 0.6, 0.5, 0.5, 0.4, 0.4)]
    decays = [f(v) for v in (0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5, 0.5, 0.45, 0.4, 0.35, 0.3)]
    x = D.noise_shaped_reverberation(x, sample_rate, *gains, *decays, f(0.25), key=key)
    return x


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav", type=str, default=None)
    p.add_argument("--out-dir", type=str, default="outputs/demo")
    args = p.parse_args()

    sample_rate = 44100
    if args.wav:
        audio, sample_rate = load_wav(args.wav)
        x = jnp.asarray(audio[None, :1, :])
    else:
        x = jnp.asarray(synthetic_batch(np.random.default_rng(0), 1, 131072, sample_rate, kind="pluck"))

    y = jax.jit(lambda x, k: render(x, sample_rate, k))(x, jax.random.PRNGKey(0))
    y = np.asarray(y[0])
    y = 0.9 * y / (np.abs(y).max() + 1e-9)

    os.makedirs(args.out_dir, exist_ok=True)
    save_wav(os.path.join(args.out_dir, "dry.wav"), np.asarray(x[0]), sample_rate)
    save_wav(os.path.join(args.out_dir, "wet.wav"), y, sample_rate)
    print(f"wrote {args.out_dir}/dry.wav and wet.wav ({y.shape[-1]} samples, "
          f"{y.shape[0]} channels) on {jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
