"""Automatic EQ: undo a random corrupting equalization with a TCN.

Mirrors the reference examples/auto_eq.py:102-394: corrupt audio with a
random 6-band EQ (+ peak normalize + random -24..0 dB gain), show the
corrupted signal to a TCN that predicts 18 normalized EQ parameters, apply
the predicted EQ to recover the original, and minimize a perceptually
weighted multi-resolution STFT loss. Validation renders wavs and saves a
smoothed response plot.

    python examples/auto_eq.py [--data-dir wavs/] [--steps N] [--smoke]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dasp_tpu as D
from dasp_tpu.models import ParameterNetwork
from dasp_tpu.utils import (
    MetricsLogger,
    load_checkpoint,
    multi_resolution_stft_loss,
    save_checkpoint,
)
from dasp_tpu.utils.audio import save_wav

from common import base_parser, device_batches

MRSTFT_KW = dict(  # auto_eq.py:252-262 configuration
    fft_sizes=(128, 256, 512, 1024, 2048, 4096, 8192),
    hop_sizes=(64, 128, 256, 512, 1024, 2048, 4096),
    win_lengths=(128, 256, 512, 1024, 2048, 4096, 8192),
    w_sc=0.0, w_log_mag=1.0, w_lin_mag=1.0,
    perceptual_weighting=True,
)


def save_response_plot(log_dir, equalizer, p_hat, sample_rate, step):
    """Smoothed magnitude response of the predicted EQ (auto_eq.py:18-99)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    from dasp_tpu.ops.biquad import biquad

    # rebuild the sos the same way parametric_eq does, then evaluate the
    # response on the host (plotting is not device work)
    names = list(equalizer.param_ranges.keys())
    denorm = equalizer.denormalize_param_dict(
        {n: jnp.asarray(p_hat[:, i]) for i, n in enumerate(names)}, validate=False
    )
    secs = []
    for band, ftype in [
        ("low_shelf", "low_shelf"), ("band0", "peaking"), ("band1", "peaking"),
        ("band2", "peaking"), ("band3", "peaking"), ("high_shelf", "high_shelf"),
    ]:
        b, a = biquad(denorm[f"{band}_gain_db"], denorm[f"{band}_cutoff_freq"],
                      denorm[f"{band}_q_factor"], sample_rate, ftype)
        secs.append(np.concatenate([np.asarray(b), np.asarray(a)], axis=-1))
    sos = np.stack(secs, axis=1)  # (bs, 6, 6)
    H = np.prod(
        np.fft.rfft(sos[0, :, :3], 4096, axis=-1) / np.fft.rfft(sos[0, :, 3:], 4096, axis=-1),
        axis=0,
    )
    freqs = np.fft.rfftfreq(4096, 1 / sample_rate)
    mag = 20 * np.log10(np.abs(H) + 1e-8)

    fig, ax = plt.subplots()
    ax.semilogx(freqs[1:], mag[1:])
    ax.set_xlabel("Hz"); ax.set_ylabel("dB"); ax.grid(c="lightgray")
    ax.set_title(f"predicted EQ response, step {step}")
    fig.savefig(os.path.join(log_dir, f"response_{step}.png"), dpi=120)
    plt.close(fig)


def main():
    args = base_parser(__doc__).parse_args()
    args.lr = args.lr if args.lr != 1e-4 else 2e-3  # reference default (auto_eq.py:230)
    if args.smoke:
        args.length, args.batch_size = 16384, 2
    log_dir = args.log_dir or "outputs/auto_eq"
    os.makedirs(log_dir, exist_ok=True)

    sr = args.sample_rate
    equalizer = D.ParametricEQ(sr, max_q_factor=1.0,  # auto_eq.py:238-240
                               filter_method=args.filter_method)
    if args.smoke:
        net = ParameterNetwork(
            equalizer.num_params, channels=(32,) * 4, kernel_size=7,
            dilations=(1, 2, 4, 8), activation="prelu", mlp_hidden=64)
    else:
        net = ParameterNetwork.auto_eq(equalizer.num_params)

    rng = jax.random.PRNGKey(args.seed)
    x0 = jnp.zeros((args.batch_size, 1, args.length), jnp.float32)
    variables = net.init(rng, x0, train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, x, rand_params, rand_gain_db):
        # corrupt: random EQ, peak norm, random -24..0 dB gain (auto_eq.py:284-295)
        y = equalizer.process_normalized(x, rand_params, clip_params=True)
        peak = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
        y = y / (peak + 1e-9)
        y = y * 10.0 ** (rand_gain_db / 20.0)

        def loss_fn(params):
            p_hat, updates = net.apply(
                {"params": params, "batch_stats": batch_stats},
                y, train=True, mutable=["batch_stats"])
            x_hat = equalizer.process_normalized(y, p_hat, clip_params=True)
            x_hat = jnp.tanh(x_hat)  # auto_eq.py:303-304
            loss = multi_resolution_stft_loss(
                x_hat, x, sample_rate=sr,
                auraloss_compat=args.auraloss_compat, **MRSTFT_KW)
            return loss, (updates["batch_stats"], p_hat, x_hat)

        (loss, (new_stats, p_hat, x_hat)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss, p_hat, (y, x_hat)

    state = load_checkpoint(os.path.join(log_dir, "ckpt.pkl")) if args.resume else None
    start = 0
    if state:
        params, batch_stats, opt_state, start = (
            state["params"], state["batch_stats"], state["opt_state"], state["step"])
        print(f"resumed from step {start}")

    logger = MetricsLogger(log_dir)
    nprng = np.random.default_rng(args.seed + 1)
    data = device_batches(args)  # async staged transfer, int16 wire

    for step in range(start, args.steps):
        x = next(data)  # already on device (device_batches)
        rand_params = jnp.asarray(
            nprng.uniform(0, 1, (args.batch_size, equalizer.num_params)).astype(np.float32))
        rand_gain = jnp.asarray(
            nprng.uniform(-24, 0, (args.batch_size, 1, 1)).astype(np.float32))
        params, batch_stats, opt_state, loss, p_hat, (y, x_hat) = train_step(
            params, batch_stats, opt_state, x, rand_params, rand_gain)
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step:5d}  mrstft {float(loss):.4f}")
            logger.log(step, loss=loss)
        if (step + 1) % args.checkpoint_every == 0 or step == args.steps - 1:
            save_checkpoint(os.path.join(log_dir, "ckpt.pkl"),
                            {"params": params, "batch_stats": batch_stats,
                             "opt_state": opt_state, "step": step + 1})
            # validation artifacts (auto_eq.py:321-389)
            save_wav(os.path.join(log_dir, f"corrupted_{step}.wav"), np.asarray(y[0]), sr)
            save_wav(os.path.join(log_dir, f"recovered_{step}.wav"), np.asarray(x_hat[0]), sr)
            save_response_plot(log_dir, equalizer, np.asarray(p_hat), sr, step)

    print(f"done; metrics at {logger.path}")


if __name__ == "__main__":
    main()
