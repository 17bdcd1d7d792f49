"""Quickstart: reverse-engineer an effect parameter by gradient descent.

The reference's headline demo (README.md:47-84; its script version
examples/reverse_eng.py is stale/broken). A distortion is applied with an
unknown drive; Adam recovers the drive by optimizing MSE *through the
effect* — everything under one jit.

    python examples/quickstart.py [--wav input.wav] [--drive-db 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dasp_tpu as D
from dasp_tpu.utils.audio import load_wav, save_wav, synthetic_batch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav", type=str, default=None, help="input wav (default: synthetic pluck)")
    p.add_argument("--drive-db", type=float, default=16.0, help="true drive to recover")
    p.add_argument("--iters", type=int, default=2500)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--out-dir", type=str, default="outputs/quickstart")
    args = p.parse_args()

    sample_rate = 44100
    if args.wav:
        audio, sample_rate = load_wav(args.wav)
        x = jnp.asarray(audio[None, :1, :])  # (1, 1, T)
    else:
        x = jnp.asarray(synthetic_batch(np.random.default_rng(0), 1, 65536, sample_rate))

    # render the target with the "unknown" drive
    target = D.distortion(x, sample_rate, jnp.array([args.drive_db]))

    @jax.jit
    def loss_fn(drive):
        return jnp.mean((D.distortion(x, sample_rate, drive) - target) ** 2)

    grad_fn = jax.jit(jax.grad(loss_fn))
    opt = optax.adam(args.lr)
    drive = jnp.array([0.0])
    opt_state = opt.init(drive)

    t0 = time.time()
    for it in range(args.iters):
        g = grad_fn(drive)
        updates, opt_state = opt.update(g, opt_state)
        drive = optax.apply_updates(drive, updates)
        if it % 250 == 0 or it == args.iters - 1:
            print(f"iter {it:5d}  loss {float(loss_fn(drive)):.3e}  drive {float(drive[0]):7.3f} dB")

    print(f"recovered drive: {float(drive[0]):.3f} dB (true {args.drive_db}) "
          f"in {time.time() - t0:.1f}s")

    os.makedirs(args.out_dir, exist_ok=True)
    y = D.distortion(x, sample_rate, drive)
    save_wav(os.path.join(args.out_dir, "recovered.wav"), np.asarray(y[0]), sample_rate)
    save_wav(os.path.join(args.out_dir, "target.wav"), np.asarray(target[0]), sample_rate)


if __name__ == "__main__":
    main()
