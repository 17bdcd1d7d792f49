"""Mixing console: multitrack mix by gradient descent on console parameters.

Demonstrates the stereo routing processors the reference ships but never
exercises in an example (stereo_panner, stereo_widener, stereo_bus —
dasp_pytorch/functional.py:580-636): a differentiable console

    per-track EQ -> per-track pan -> stereo bus (send levels) -> widener

whose parameters (pans, sends, EQ gains, width) are optimized so the mix
matches a target stereo image and spectrum. Runs on synthetic multitrack
audio.

    python examples/mixing_console.py [--steps 400]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dasp_tpu as D
from dasp_tpu.utils import multi_resolution_stft_loss, synthetic_batch
from dasp_tpu.utils.audio import save_wav


def console(tracks, sample_rate, params):
    """tracks: (bs, n_tracks, T) mono -> stereo mix (bs, 2, T)."""
    bs, n_tracks, T = tracks.shape

    # per-track 10-band graphic EQ: reshape tracks into the batch dim
    flat = tracks.reshape(bs * n_tracks, 1, T)
    eq_gains = jnp.tanh(params["eq_gains"]) * 12.0  # (bs, n_tracks, 10) -> +-12 dB
    flat = D.graphic_eq(flat, sample_rate, eq_gains.reshape(bs * n_tracks, 10))
    tracks = flat.reshape(bs, n_tracks, T)

    # constant-power pan per track
    pan = jax.nn.sigmoid(params["pan"])  # (bs, n_tracks)
    panned = D.stereo_panner(tracks, sample_rate, pan)  # (bs, 2, n_tracks, T)

    # stereo bus with per-track sends
    send_db = jnp.tanh(params["send_db"]) * 24.0  # (bs, n_tracks)
    mix = D.stereo_bus(panned, sample_rate, send_db)  # (bs, 2, T)

    # master widener
    width = jax.nn.sigmoid(params["width"])  # (bs,)
    return D.stereo_widener(mix, sample_rate, width)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--tracks", type=int, default=4)
    ap.add_argument("--length", type=int, default=32768)
    ap.add_argument("--lr", type=float, default=5e-2)
    ap.add_argument("--out-dir", type=str, default="outputs/mixing_console")
    args = ap.parse_args()

    sr = 44100
    bs = 1
    rng = np.random.default_rng(0)
    tracks = jnp.asarray(
        np.concatenate(
            [synthetic_batch(rng, bs, args.length, sr) for _ in range(args.tracks)], axis=1
        )
    )  # (bs, n_tracks, T)

    # a "reference mix" made with hidden console settings
    true_params = {
        "eq_gains": jnp.asarray(rng.uniform(-0.5, 0.5, (bs, args.tracks, 10)).astype(np.float32)),
        "pan": jnp.asarray(rng.uniform(-1.5, 1.5, (bs, args.tracks)).astype(np.float32)),
        "send_db": jnp.asarray(rng.uniform(-0.4, 0.4, (bs, args.tracks)).astype(np.float32)),
        "width": jnp.asarray(rng.uniform(-0.5, 0.5, (bs,)).astype(np.float32)),
    }
    target = console(tracks, sr, true_params)

    params = jax.tree.map(jnp.zeros_like, true_params)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(params):
            mix = console(tracks, sr, params)
            return multi_resolution_stft_loss(mix, target) + 10.0 * jnp.mean((mix - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    l0 = None
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state)
        if l0 is None:
            l0 = float(loss)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.4f}")

    print(f"loss {l0:.4f} -> {float(loss):.4f}")
    pan_err = float(jnp.abs(jax.nn.sigmoid(params["pan"]) - jax.nn.sigmoid(true_params["pan"])).mean())
    print(f"mean pan error: {pan_err:.3f} (0 = perfect)")

    os.makedirs(args.out_dir, exist_ok=True)
    mix = console(tracks, sr, params)
    save_wav(os.path.join(args.out_dir, "mix.wav"), np.asarray(mix[0]), sr)
    save_wav(os.path.join(args.out_dir, "target.wav"), np.asarray(target[0]), sr)
    print(f"wrote {args.out_dir}/mix.wav and target.wav")


if __name__ == "__main__":
    main()
