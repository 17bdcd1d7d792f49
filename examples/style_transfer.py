"""Self-supervised audio production style transfer.

Mirrors the reference examples/style_transfer.py:110-417: corrupt the
input with a randomly parameterized EQ -> compressor -> reverb chain to
make a "reference" recording, split input/reference into A/B halves, let
a shared TCN encoder + projectors predict chain parameters from
(input_a, ref_b), render input_a through the chain, and match ref_a with
a multi-resolution STFT loss. One jitted train step covers corruption,
two encoder passes, four projectors, the 4-effect render, the loss, and
the Adam update.

Optionally runs data-parallel over all available devices (--dp).

    python examples/style_transfer.py [--data-dir wavs/] [--steps N] [--smoke] [--dp]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dasp_tpu.models import StyleTransferNet, apply_style_chain, make_style_processors
from dasp_tpu.parallel import make_mesh, replicate, shard_batch
from dasp_tpu.utils import (
    MetricsLogger,
    load_checkpoint,
    multi_resolution_stft_loss,
    save_checkpoint,
)
from dasp_tpu.utils.audio import save_wav

from common import base_parser, device_batches


def build(args, mesh=None):
    sr = args.sample_rate
    ir_conv = None
    kw = dict(eq_filter_method=args.filter_method,
              compressor_smoother=args.smoother or "fsm")
    if mesh is not None and mesh.shape.get("sp", 1) > 1:
        from functools import partial

        from dasp_tpu.parallel import (
            sharded_ballistics_smooth,
            sharded_fft_conv_causal,
            sharded_sosfilt_coupled,
        )

        # sequence-shard ALL long-sequence hot paths: the reverb's
        # signal-with-IR convolution (halo exchange), the EQ's exact
        # IIR recurrence (coupled block-state chain across chips), and
        # the compressor's envelope smoother (per-shard scans + affine
        # state-map correction)
        ir_conv = partial(sharded_fft_conv_causal, mesh=mesh)
        kw["eq_filter_method"] = partial(sharded_sosfilt_coupled, mesh=mesh)
        kw["compressor_smoother"] = partial(
            sharded_ballistics_smooth, mesh=mesh, batch_axis_name="dp")
        if jax.default_backend() == "cpu":
            # CPU-backend-only workaround (NOT sp semantics): XLA-CPU's
            # fft thunk requires row-major layouts, which shard_map-adjacent
            # FFTs violate — draw reverb noise in the time domain. TPU
            # meshes keep the faster frequency path.
            kw["reverb_noise_mode"] = "time"
    if args.smoke:
        processors = make_style_processors(
            sr, reverb_num_samples=2048, reverb_ir_conv_fn=ir_conv, **kw)
        net = StyleTransferNet(embed_dim=32, ch_dim=8, encoder_dilations=(1, 2, 4))
    else:
        processors = make_style_processors(
            sr, reverb_num_samples=65536, reverb_ir_conv_fn=ir_conv, **kw)
        net = StyleTransferNet()
    return processors, net


def make_step(args, processors, net, opt, mesh=None):
    sr = args.sample_rate
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_only = NamedSharding(mesh, P("dp"))
    else:
        batch_only = None

    def step_fn(params, batch_stats, opt_state, x, rand, key):
        """One optimization step (reference step() + train(),
        style_transfer.py:271-328,:331-370)."""
        k_ref, k_out = jax.random.split(key)

        # build the pseudo-reference by random corruption (:274-299)
        ref = processors["equalizer"].process_normalized(x, rand["eq"], clip_params=True)
        ref = processors["compressor"].process_normalized(ref, rand["comp"], clip_params=True)
        ref = processors["reverb"].process_normalized(ref, rand["reverb"], clip_params=True, key=k_ref)

        # peak normalize + random gains (:307-319)
        peak = jnp.max(jnp.abs(ref), axis=-1, keepdims=True)
        ref = ref / (peak + 1e-9)
        ref = ref * 10.0 ** (-rand["ref_gain_db"] / 20.0)
        x = x * 10.0 ** (-rand["in_gain_db"] / 20.0)

        # split A/B halves (:322-323)
        input_a, input_b = jnp.split(x, 2, axis=-1)
        ref_a, ref_b = jnp.split(ref, 2, axis=-1)

        def loss_fn(params):
            p, updates = net.apply(
                {"params": params, "batch_stats": batch_stats},
                input_a, jnp.mean(ref_b, axis=1, keepdims=True),
                train=True, mutable=["batch_stats"],
            )
            output_a = apply_style_chain(processors, input_a, p, k_out)
            if batch_only is not None:
                # re-materialize batch-sharded/sequence-replicated before the
                # STFT loss (keeps the loss FFTs off shard_map-derived
                # layouts, which XLA-CPU's fft thunk rejects); on the CPU
                # backend the loss additionally swaps its rffts for DFT
                # matmuls (layout-agnostic) — layout constraints cannot
                # reach the fft ops XLA's own rfft transpose builds
                output_a = jax.lax.with_sharding_constraint(output_a, batch_only)
            loss = multi_resolution_stft_loss(
                output_a, ref_a, cpu_fft_workaround=batch_only is not None,
                auraloss_compat=args.auraloss_compat)
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    return jax.jit(step_fn, donate_argnums=(0, 1, 2))


def random_corruption(nprng, bs, processors):
    return {
        "eq": jnp.asarray(nprng.uniform(0, 1, (bs, processors["equalizer"].num_params)).astype(np.float32)),
        "comp": jnp.asarray(nprng.uniform(0, 1, (bs, processors["compressor"].num_params)).astype(np.float32)),
        "reverb": jnp.asarray(nprng.uniform(0, 1, (bs, processors["reverb"].num_params)).astype(np.float32)),
        "ref_gain_db": jnp.asarray(nprng.uniform(0, 24, (bs, 1, 1)).astype(np.float32)),
        "in_gain_db": jnp.asarray(nprng.uniform(0, 24, (bs, 1, 1)).astype(np.float32)),
    }


def main():
    parser = base_parser(__doc__)
    parser.add_argument("--dp", action="store_true", help="data-parallel over all devices")
    parser.add_argument("--sp", type=int, default=1,
                        help="sequence-parallel factor for the reverb convolution "
                             "(devices split as (n/sp) dp x sp). Works on TPU meshes "
                             "and on the virtual CPU mesh (there the MR-STFT loss "
                             "automatically swaps its rffts for DFT matmuls to dodge "
                             "XLA-CPU's row-major-only fft thunk)")
    parser.add_argument("--reservoir", type=int, default=0, metavar="R",
                        help="device-resident clip reservoir: keep R clips in HBM, "
                             "stream only batch_size/2 fresh clips per step and "
                             "gather each batch from random reservoir rows "
                             "(utils.pipeline.reservoir_put/_sample). Lifts the "
                             "host->device bandwidth cap on real-data training — "
                             "each clip trains ~2x, always with freshly drawn "
                             "corruption params. 0 disables (stream every sample)")
    args = parser.parse_args()
    if args.smoke:
        args.length = 16384
        if "--batch-size" not in sys.argv:
            args.batch_size = 2
    elif args.length == 131072:
        args.length = 262144  # reference: 262144, split into 2x131072 (:400)
    log_dir = args.log_dir or "outputs/style_transfer"
    os.makedirs(log_dir, exist_ok=True)
    sr = args.sample_rate

    mesh = None
    if args.dp or args.sp > 1:
        n = len(jax.devices())
        mesh = make_mesh((n // args.sp, args.sp))
        dp_size = n // args.sp
        print(f"mesh: dp={dp_size} sp={args.sp}")
        if args.batch_size % dp_size:
            if "--batch-size" in sys.argv:
                raise SystemExit(
                    f"--batch-size {args.batch_size} not divisible by dp={dp_size}")
            args.batch_size = dp_size * max(1, args.batch_size // dp_size)
            print(f"batch size rounded to {args.batch_size} (divisible by dp)")

    processors, net = build(args, mesh)
    half = args.length // 2
    x0 = jnp.zeros((args.batch_size, 1, half), jnp.float32)
    variables = net.init(jax.random.PRNGKey(args.seed), x0, x0, train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"model: {n_params/1e6:.2f}M params")

    opt = optax.chain(
        optax.adam(args.lr),
        optax.scale_by_schedule(optax.cosine_decay_schedule(1.0, args.steps)),
    )
    opt_state = opt.init(params)
    step_fn = make_step(args, processors, net, opt, mesh)

    if mesh is not None:
        params = replicate(params, mesh)
        batch_stats = replicate(batch_stats, mesh)
        opt_state = replicate(opt_state, mesh)

    state = load_checkpoint(os.path.join(log_dir, "ckpt.pkl")) if args.resume else None
    start = 0
    if state:
        params, batch_stats, opt_state, start = (
            state["params"], state["batch_stats"], state["opt_state"], state["step"])
        print(f"resumed from step {start}")

    logger = MetricsLogger(log_dir)
    nprng = np.random.default_rng(args.seed + 1)
    key = jax.random.PRNGKey(args.seed + 2)

    if args.reservoir:
        # Reservoir feeding: only `fresh_n` clips cross the host->device
        # link per step; the batch is gathered from R resident clips.
        # The store stays in the WIRE's int16 form (half the HBM of f32,
        # matching the halved wire bytes) with a per-row inverse scale;
        # dequantization happens after the gather, inside the jitted
        # step, and XLA fuses it into the batch's first consumer.
        # The reservoir lives on one device (unsharded); sampled batches
        # are resharded by shard_batch below when a mesh is active.
        import copy
        import functools

        from dasp_tpu.utils import (device_prefetch, reservoir_put,
                                    wire_i16_parts)
        from common import batch_iterator

        fresh_n = max(1, args.batch_size // 2)
        R = max(args.reservoir, 2 * fresh_n)
        R -= R % fresh_n  # multiple of fresh_n: the write window never wraps
        fargs = copy.copy(args)
        fargs.batch_size = fresh_n
        # undecoded i16 wire: each pull is {payload (fresh_n,1,T) i16,
        # inv_scale f32 scalar} already on device
        data = device_prefetch(batch_iterator(fargs), size=2, wire="i16",
                               decode_on_yield=False)
        # jit the store assembly: eager concatenate of device arrays can
        # stall through the remote-TPU tunnel (see CLAUDE.md)
        first = [wire_i16_parts(next(data)) for _ in range(R // fresh_n)]
        store, store_inv = jax.jit(
            lambda ps: (jnp.concatenate([q for q, _ in ps]),
                        jnp.concatenate([jnp.broadcast_to(i, (fresh_n,))
                                         for _, i in ps])))(first)
        ptr = np.int32(0)
        print(f"reservoir: {R} resident clips (int16), {fresh_n} fresh/step "
              f"(reuse ~{args.batch_size / fresh_n:.0f}x)")

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def reservoir_step(store, store_inv, fq, finv, ptr, k):
            store, _ = reservoir_put(store, fq, ptr)
            store_inv, ptr = reservoir_put(
                store_inv, jnp.broadcast_to(finv, (fq.shape[0],)), ptr)
            idx = jax.random.randint(k, (args.batch_size,), 0, store.shape[0])
            x = (jnp.take(store, idx, axis=0).astype(jnp.float32)
                 / jnp.take(store_inv, idx)[:, None, None])
            return store, store_inv, ptr, x
    else:
        data = device_batches(args)  # async staged transfer, int16 wire

    for step in range(start, args.steps):
        if args.reservoir:
            key, k_res = jax.random.split(key)
            fq, finv = wire_i16_parts(next(data))
            store, store_inv, ptr, x = reservoir_step(
                store, store_inv, fq, finv, ptr, k_res)
        else:
            x = next(data)  # already on device (device_batches)
        if mesh is not None:
            x = shard_batch(x, mesh)
        rand = random_corruption(nprng, args.batch_size, processors)
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, loss = step_fn(
            params, batch_stats, opt_state, x, rand, sub)
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step:5d}  mrstft {float(loss):.4f}")
            logger.log(step, loss=loss)
        if (step + 1) % args.checkpoint_every == 0 or step == args.steps - 1:
            save_checkpoint(os.path.join(log_dir, "ckpt.pkl"),
                            {"params": params, "batch_stats": batch_stats,
                             "opt_state": opt_state, "step": step + 1})

    print(f"done; metrics at {logger.path}")


if __name__ == "__main__":
    main()
