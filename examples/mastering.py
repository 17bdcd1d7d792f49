"""Mastering chain: match a reference master by gradient descent.

Demonstrates the production-dynamics processors this framework adds
beyond the reference (which has no example in this category —
dasp_pytorch ships neither the effects nor a mastering recipe): a
differentiable mastering chain

    transient shaper -> dynamic EQ -> multiband compressor -> exciter
    -> limiter

driven by ONE flat normalized parameter tensor through
``modules.Chain``, optimized so the processed mix matches a reference
master (here: the same mix rendered through hidden chain settings —
the classic "reverse the mastering" setup). The whole chain renders,
differentiates and updates inside a single ``jax.jit`` step.

    python examples/mastering.py [--steps 300] [--smoke]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor JAX_PLATFORMS even when a sitecustomize latches another platform
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dasp_tpu as D
from dasp_tpu.utils import multi_resolution_stft_loss, synthetic_batch
from dasp_tpu.utils.audio import save_wav


def build_chain(sr: int, mesh=None) -> D.Chain:
    """``mesh`` with an sp axis > 1 sequence-shards the dynamic EQ's
    WOLA transforms and (in main) the MR-STFT loss over the mesh —
    the long-audio path for mastering-length programs."""
    deq_kw = {}
    if mesh is not None and mesh.shape.get("sp", 1) > 1:
        from functools import partial

        from dasp_tpu.parallel import sharded_tv_freq_filter, sharded_tv_power

        deq_kw = {
            "tv_power_fn": partial(sharded_tv_power, mesh=mesh),
            "tv_filter_fn": partial(sharded_tv_freq_filter, mesh=mesh),
        }
    return D.Chain([
        D.TransientShaper(sr),
        D.DynamicEQ(sr, num_bands=3, **deq_kw),
        D.MultibandCompressor(sr),
        D.Exciter(sr),
        D.Limiter(sr),
    ])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--length", type=int, default=65536)
    ap.add_argument("--lr", type=float, default=2e-2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out-dir", type=str, default="outputs/mastering")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--sp", type=int, default=1,
                    help="sequence-parallel factor: shard the dynamic EQ's "
                         "WOLA transforms and the MR-STFT loss over an "
                         "(n/sp) dp x sp device mesh")
    args = ap.parse_args()
    if args.smoke:
        args.length, args.steps = 16384, min(args.steps, 50)

    sr = 44100
    bs = 1
    rng = np.random.default_rng(args.seed)
    # keep host data as numpy; device arrays are created inside jit only
    # (eager device constants break lowering through the axon tunnel)
    mix_np = np.repeat(synthetic_batch(rng, bs, args.length, sr), 2, axis=1)

    mesh = None
    loss_mr = multi_resolution_stft_loss
    if args.sp > 1:
        from functools import partial

        from dasp_tpu.parallel import make_mesh, sharded_multi_resolution_stft_loss

        n = len(jax.devices())
        mesh = make_mesh((n // args.sp, args.sp))
        loss_mr = partial(sharded_multi_resolution_stft_loss, mesh=mesh)
        print(f"mesh: dp={n // args.sp} sp={args.sp}")

    chain = build_chain(sr, mesh)
    print(f"mastering chain: {chain.num_params} parameters "
          f"({', '.join(type(p).__name__ for p in chain.processors)})")

    # the "reference master": hidden settings, mild deviations from center
    p_true = np.clip(
        0.5 + 0.25 * rng.standard_normal((bs, chain.num_params)), 0.05, 0.95
    ).astype(np.float32)
    target = jax.jit(
        lambda x, p: chain.process_normalized(x, p, clip_params=True)
    )(mix_np, p_true)

    # logit-parameterized so optimization stays inside (0, 1)
    z = jnp.zeros((bs, chain.num_params), jnp.float32)
    opt = optax.adam(args.lr)
    opt_state = opt.init(z)

    @jax.jit
    def step(z, opt_state, mix, target):
        def loss_fn(z):
            y = chain.process_normalized(mix, jax.nn.sigmoid(z), clip_params=True)
            return loss_mr(y, target) + 10.0 * jnp.mean((y - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(z)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(z, updates), opt_state, loss

    mix = jnp.asarray(mix_np)
    l0 = None
    for i in range(args.steps):
        z, opt_state, loss = step(z, opt_state, mix, target)
        if l0 is None:
            l0 = float(loss)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.4f}")

    print(f"loss {l0:.4f} -> {float(loss):.4f}")

    os.makedirs(args.out_dir, exist_ok=True)
    y = jax.jit(
        lambda x, zz: chain.process_normalized(x, jax.nn.sigmoid(zz), clip_params=True)
    )(mix, z)
    save_wav(os.path.join(args.out_dir, "master.wav"), np.asarray(y[0]), sr)
    save_wav(os.path.join(args.out_dir, "target.wav"), np.asarray(target[0]), sr)
    save_wav(os.path.join(args.out_dir, "input.wav"), np.asarray(mix[0]), sr)
    print(f"wrote {args.out_dir}/master.wav, target.wav, input.wav")


if __name__ == "__main__":
    main()
