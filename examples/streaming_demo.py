"""Streaming (serving) demo: process audio chunk-by-chunk with state.

Renders a guitar-ish synthetic signal through the serving chain
(parametric EQ -> compressor -> feedback delay -> noise-shaped reverb ->
limiter) twice — once offline on the whole clip, once through
`dasp_tpu.streaming` in fixed-size chunks with carried state — verifies
the outputs match, and writes both to wav. This is the deployment shape:
one jitted step, fixed chunk in / fixed chunk out, all state on device.
The limiter streams with TRUE attack/release ballistics (carried
envelope state), and the delay's comb recursion runs block-parallel over
its carried delay line.

    python examples/streaming_demo.py [--chunk 512] [--seconds 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import dasp_tpu as D
from dasp_tpu import streaming
from dasp_tpu.utils import save_wav, synthetic_batch

SR = 44100


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--reverb-samples", type=int, default=16384)
    ap.add_argument("--out-dir", default="outputs/streaming_demo")
    ap.add_argument("--smoke", action="store_true",
                    help="short clip / small IR for a fast functional check")
    ap.add_argument("--steps", type=int, default=None,
                    help="accepted for CLI uniformity with the trainers (unused)")
    args = ap.parse_args()
    if args.smoke:
        args.seconds, args.reverb_samples = 0.5, 2048

    T = int(args.seconds * SR) // args.chunk * args.chunk
    rng = np.random.default_rng(0)
    x = jnp.asarray(synthetic_batch(rng, 1, T, SR, kind="pluck"))
    x = jnp.tile(x, (1, 2, 1))  # stereo

    # fixed effect parameters (host numpy: axon cannot fetch device
    # constants at lowering time)
    eq_p = [np.full((1,), v, np.float32) for v in
            [3.0, 120.0, 0.7, 2.5, 600.0, 1.2, -3.0, 2500.0, 2.0,
             1.5, 6000.0, 1.0, 2.0, 11000.0, 1.0, -2.0, 9000.0, 0.7]]
    comp_p = {k: np.full((1,), v, np.float32) for k, v in dict(
        threshold_db=-28.0, ratio=4.0, attack_ms=5.0, release_ms=60.0,
        knee_db=6.0, makeup_gain_db=3.0).items()}
    gains = jnp.full((1, 12), 0.6)
    decays = jnp.full((1, 12), 0.5)
    key = jax.random.PRNGKey(7)
    # integer-sample delay so the offline closed-form comb and the
    # streaming time-domain recursion agree exactly
    delay_samp = 4410  # 100 ms
    delay_ms = np.full((1,), delay_samp / SR * 1e3, np.float32)
    delay_fb = np.full((1,), 0.35, np.float32)
    delay_mix = np.full((1,), 0.3, np.float32)
    lim_p = {k: np.full((1,), v, np.float32) for k, v in dict(
        threshold_db=-8.0, attack_ms=1.0, release_ms=150.0,
        knee_db=2.0, makeup_gain_db=0.0).items()}

    # --- offline render (whole clip at once) ------------------------------
    @jax.jit
    def offline(x):
        y = D.parametric_eq(x, SR, *eq_p, filter_method="coupled")
        y = D.compressor(y, SR, **comp_p, smoother="block")
        y = D.delay(y, SR, delay_ms, delay_fb, delay_mix)
        y = D.noise_shaped_reverberation(
            y, SR, *[gains[:, i] for i in range(12)],
            *[decays[:, i] for i in range(12)], jnp.full((1,), 0.25),
            num_samples=args.reverb_samples, key=key, noise_mode="frequency")
        return D.limiter(y, SR, **lim_p)

    y_offline = offline(x)

    # --- streaming render (chunk by chunk, carried state) -----------------
    rev_state = jax.jit(lambda g, d, k: streaming.reverb_stream_init(
        SR, g, d, 0.25, k, num_samples=args.reverb_samples,
        noise_mode="frequency"))(gains, decays, key)

    @jax.jit
    def step(c, st):
        y, eq_zi = streaming.parametric_eq_stream(c, SR, *eq_p, zi=st["eq"])
        y, comp_zi = streaming.compressor_stream(y, SR, **comp_p, zi=st["comp"])
        y, dl_state = streaming.delay_stream(
            y, SR, delay_samp, delay_fb, delay_mix, state=st["delay"])
        y, rev_state = streaming.reverb_stream(y, st["rev"])
        y, lim_zi = streaming.limiter_stream(y, SR, **lim_p, zi=st["lim"])
        return y, {"eq": eq_zi, "comp": comp_zi, "delay": dl_state,
                   "rev": rev_state, "lim": lim_zi}

    st = {
        "eq": jnp.zeros((1, 2, 6, 2)),
        "comp": jnp.zeros((1, 1, 1, 4)),
        # concrete from-rest states (a None->array swap after the first
        # chunk would retrigger compilation)
        "delay": {"dry_hist": jnp.zeros((1, 2, delay_samp)),
                  "wet_hist": jnp.zeros((1, 2, delay_samp))},
        "rev": rev_state,
        "lim": (jnp.zeros((1, 1)), jnp.zeros((1, 1))),
    }
    outs = []
    t0 = time.time()
    for i in range(T // args.chunk):
        c = x[..., i * args.chunk : (i + 1) * args.chunk]
        y, st = step(c, st)
        outs.append(y)
    y_stream = jnp.concatenate(outs, axis=-1)
    jax.block_until_ready(y_stream)
    wall = time.time() - t0

    err = float(jnp.abs(y_stream - y_offline).max())
    n_chunks = T // args.chunk
    print(f"{n_chunks} chunks of {args.chunk} samples "
          f"({args.chunk / SR * 1e3:.1f} ms each): "
          f"{wall / n_chunks * 1e3:.2f} ms/chunk host-loop wall "
          f"(includes first-chunk compile)")
    print(f"streaming vs offline max abs err: {err:.2e}")
    # dominant term: the offline delay's closed-form spectral comb
    # truncates the infinite feedback tail that the streaming recursion
    # carries exactly — an offline-side approximation, not streaming
    # drift (the per-effect streams are 1e-7-tight, tests/test_streaming).
    # At --smoke scale this sits at ~1.0e-3 (measured identically on the
    # round-4 tree); bound it with headroom instead of at its knife-edge.
    assert err < 3e-3, "chunked render diverged from the offline render"

    os.makedirs(args.out_dir, exist_ok=True)
    save_wav(os.path.join(args.out_dir, "dry.wav"), np.asarray(x[0]), SR)
    save_wav(os.path.join(args.out_dir, "streamed.wav"), np.asarray(y_stream[0]), SR)
    print(f"wrote {args.out_dir}/dry.wav and streamed.wav")


if __name__ == "__main__":
    main()
