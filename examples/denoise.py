"""Denoising: spectral gate with a measured noise profile, then tuned
by gradient descent.

Demonstrates the spectral processing subsystem this framework adds
beyond the reference (which has no spectral effects): broadband noise
is measured from a noise-only capture (`spectral_noise_profile`), the
`spectral_gate` denoises with that profile, and — because the whole
gate is differentiable — its four parameters (threshold, range,
attack, release) are then TUNED by Adam against the clean reference,
all inside one jit. Reports SNR before/after and integrated LUFS.

    python examples/denoise.py [--steps 60] [--smoke]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dasp_tpu as D
from dasp_tpu.utils import integrated_loudness, synthetic_batch
from dasp_tpu.utils.audio import save_wav


def snr_db(clean, x):
    n = x - clean
    return 10.0 * np.log10(
        float(np.mean(np.asarray(clean) ** 2)) / max(float(np.mean(np.asarray(n) ** 2)), 1e-12)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--length", type=int, default=131072)
    ap.add_argument("--noise-db", type=float, default=-30.0)
    ap.add_argument("--lr", type=float, default=3e-2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out-dir", type=str, default="outputs/denoise")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        args.length, args.steps = 32768, min(args.steps, 10)

    sr = 44100
    rng = np.random.default_rng(args.seed)
    clean_np = synthetic_batch(rng, 1, args.length, sr)
    amp = 10.0 ** (args.noise_db / 20.0)
    noisy_np = clean_np + (amp * rng.standard_normal(clean_np.shape)).astype(np.float32)
    noise_only_np = (amp * rng.standard_normal(clean_np.shape)).astype(np.float32)

    # measure the floor from the noise-only capture (the production path)
    prof = jax.jit(D.spectral_noise_profile)(noise_only_np)

    gate = D.SpectralGate(sr)
    clean = jnp.asarray(clean_np)
    noisy = jnp.asarray(noisy_np)

    render = jax.jit(
        lambda x, p: gate.process_normalized(
            x, p, clip_params=True, noise_profile_db=prof
        )
    )
    p0 = jnp.asarray([[0.25, 0.66, 0.08, 0.14]], jnp.float32)  # sane defaults
    y0 = render(noisy, p0)
    print(f"SNR: noisy {snr_db(clean_np, noisy_np):6.2f} dB -> "
          f"gated (defaults) {snr_db(clean_np, np.asarray(y0)):6.2f} dB")

    # tune the gate against the clean reference
    z = jnp.log(p0 / (1.0 - p0))  # logit
    opt = optax.adam(args.lr)
    opt_state = opt.init(z)

    @jax.jit
    def step(z, opt_state, noisy, clean):
        def loss_fn(z):
            y = gate.process_normalized(
                noisy, jax.nn.sigmoid(z), clip_params=True, noise_profile_db=prof
            )
            return jnp.mean((y - clean) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(z)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(z, updates), opt_state, loss

    for i in range(args.steps):
        z, opt_state, loss = step(z, opt_state, noisy, clean)
        if i % 20 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  mse {float(loss):.3e}")

    y = render(noisy, jax.nn.sigmoid(z))
    print(f"SNR: tuned {snr_db(clean_np, np.asarray(y)):6.2f} dB")
    lufs = jax.jit(lambda a: integrated_loudness(a, sr))
    print(f"LUFS: noisy {float(lufs(noisy)[0]):6.2f}  denoised {float(lufs(y)[0]):6.2f}")

    os.makedirs(args.out_dir, exist_ok=True)
    save_wav(os.path.join(args.out_dir, "noisy.wav"), noisy_np[0], sr)
    save_wav(os.path.join(args.out_dir, "denoised.wav"), np.asarray(y[0]), sr)
    save_wav(os.path.join(args.out_dir, "clean.wav"), clean_np[0], sr)
    print(f"wrote {args.out_dir}/noisy.wav, denoised.wav, clean.wav")


if __name__ == "__main__":
    main()
