"""Blind estimation of compressor parameters with a TCN.

Mirrors the reference examples/blind_estimation.py:14-181: a dataset of
(clean, compressed-with-random-params) pairs; a TCN sees the compressed
audio and predicts the 6 normalized compressor parameters; the effect is
re-applied with the prediction and an STFT loss compares the two renders.
The whole step — random-param rendering, network, effect, loss, grads,
Adam update — is one jitted function.

    python examples/blind_estimation.py [--data-dir wavs/] [--steps N] [--smoke]
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
from dasp_tpu.utils import MetricsLogger, load_checkpoint, save_checkpoint, stft_loss

from common import base_parser, device_batches


def main():
    parser = base_parser(__doc__)
    parser.add_argument("--processor",
                        choices=["compressor", "expander", "limiter",
                                 "multiband_compressor", "delay", "chorus",
                                 "flanger", "tremolo", "noise_gate",
                                 "phaser", "auto_wah", "de_esser", "bitcrusher",
                                 "pitch_shift", "transient_shaper", "exciter",
                                 "spectral_gate", "ring_modulator",
                                 "dynamic_eq", "clipper"],
                        default="compressor",
                        help="which processor to blind-estimate")
    args = parser.parse_args()
    if args.smoke:
        args.length, args.batch_size, args.steps = 16384, 2, args.steps
    log_dir = args.log_dir or f"outputs/blind_estimation_{args.processor}"
    os.makedirs(log_dir, exist_ok=True)

    sr = args.sample_rate
    if args.processor == "expander":
        # --smoother None -> the expander's own default (true-ballistics
        # 'parallel'); an explicit --smoother fsm is honoured
        processor = D.Expander(sr, smoother=args.smoother or "parallel")
    elif args.processor == "limiter":
        processor = D.Limiter(sr, smoother=args.smoother or "parallel")
    elif args.processor == "multiband_compressor":
        processor = D.MultibandCompressor(sr, smoother=args.smoother or "fsm")
    elif args.processor == "delay":
        processor = D.Delay(sr)
    elif args.processor == "chorus":
        processor = D.Chorus(sr)
    elif args.processor == "flanger":
        processor = D.Flanger(sr)
    elif args.processor == "tremolo":
        processor = D.Tremolo(sr)
    elif args.processor == "noise_gate":
        processor = D.NoiseGate(sr, smoother=args.smoother or "parallel")
    elif args.processor == "phaser":
        processor = D.Phaser(sr)
    elif args.processor == "auto_wah":
        processor = D.AutoWah(sr)
    elif args.processor == "de_esser":
        processor = D.DeEsser(sr)
    elif args.processor == "bitcrusher":
        processor = D.Bitcrusher(sr)
    elif args.processor == "pitch_shift":
        processor = D.PitchShift(sr)
    elif args.processor == "transient_shaper":
        processor = D.TransientShaper(sr, smoother=args.smoother or "parallel")
    elif args.processor == "exciter":
        processor = D.Exciter(sr)
    elif args.processor == "spectral_gate":
        processor = D.SpectralGate(sr)
    elif args.processor == "ring_modulator":
        processor = D.RingModulator(sr)
    elif args.processor == "dynamic_eq":
        processor = D.DynamicEQ(sr)
    elif args.processor == "clipper":
        processor = D.Clipper(sr)
    else:
        processor = D.Compressor(sr, smoother=args.smoother or "fsm")
    net = ParameterNetwork.blind_estimation(processor.num_params)

    rng = jax.random.PRNGKey(args.seed)
    x0 = jnp.zeros((args.batch_size, 1, args.length), jnp.float32)
    variables = net.init(rng, x0, train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, x, rand_params):
        # render the "measured" signal with random parameters (the dataset's
        # __getitem__ in the reference, blind_estimation.py:94-117)
        y = processor.process_normalized(x, rand_params, clip_params=True)

        def loss_fn(params):
            p_hat, updates = net.apply(
                {"params": params, "batch_stats": batch_stats},
                y, train=True, mutable=["batch_stats"],
            )
            y_hat = processor.process_normalized(x, p_hat, clip_params=True)
            loss = stft_loss(y_hat, y, auraloss_compat=args.auraloss_compat)
            return loss, (updates["batch_stats"], p_hat)

        (loss, (new_stats, p_hat)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        param_err = jnp.mean(jnp.abs(p_hat - rand_params))
        return params, new_stats, opt_state, loss, param_err

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
            nprng.uniform(0, 1, (args.batch_size, processor.num_params)).astype(np.float32))
        params, batch_stats, opt_state, loss, perr = train_step(
            params, batch_stats, opt_state, x, rand_params)
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step:5d}  stft_loss {float(loss):.4f}  param_l1 {float(perr):.4f}")
            logger.log(step, loss=loss, param_l1=perr)
        if (step + 1) % args.checkpoint_every == 0:
            save_checkpoint(os.path.join(log_dir, "ckpt.pkl"),
                            {"params": params, "batch_stats": batch_stats,
                             "opt_state": opt_state, "step": step + 1})

    save_checkpoint(os.path.join(log_dir, "ckpt.pkl"),
                    {"params": params, "batch_stats": batch_stats,
                     "opt_state": opt_state, "step": args.steps})
    print(f"done; metrics at {logger.path}")


if __name__ == "__main__":
    main()
