"""Serving latency: one streaming step of the full effect chain.

Measures per-chunk latency of the jitted streaming chain
(parametric EQ -> compressor -> reverb wet/dry) at serving chunk sizes,
the deployment shape of `dasp_tpu.streaming`: fixed chunk in, fixed
chunk out, state carried on device. Reports ms/chunk and the realtime
margin (chunk duration / latency).

    python benchmarks/streaming_latency.py [--chunks 128 512 2048]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dasp_tpu import streaming

SR = 44100


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, nargs="+", default=[128, 512, 2048])
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--reverb-samples", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--chain", default="classic",
                    choices=["classic", "mastering"],
                    help="'classic' = EQ + compressor + reverb; 'mastering' "
                         "= transient shaper + dynamic EQ + exciter + "
                         "limiter (the beyond-reference dynamics family)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        suffix = "" if args.chain == "classic" else f"_{args.chain}"
        args.out = os.path.join(
            os.path.dirname(__file__), f"streaming_latency{suffix}.json")

    bs = args.batch_size
    rng = np.random.default_rng(0)
    # host-side numpy constants: the axon tunnel cannot fetch device
    # arrays back during constant-embedding at lowering time
    if args.chain == "classic":
        eq_p = [np.full((bs,), v, np.float32) for v in
                [2.0, 200.0, 0.7, 3.0, 400.0, 1.0, -2.0, 3000.0, 2.0,
                 1.0, 9000.0, 1.0, 2.0, 13000.0, 1.0, -3.0, 8000.0, 0.7]]
        comp_p = {k: np.full((bs,), v, np.float32) for k, v in dict(
            threshold_db=-24.0, ratio=4.0, attack_ms=10.0, release_ms=60.0,
            knee_db=6.0, makeup_gain_db=1.0).items()}

        # jit the init: some primitives (scatter/complex fft) are not
        # implemented for EAGER dispatch through the axon tunnel
        rev_state0 = jax.jit(lambda g, d, k: streaming.reverb_stream_init(
            SR, g, d, 0.3, k, num_samples=args.reverb_samples,
            noise_mode="frequency",
        ))(jnp.full((bs, 12), 0.6), jnp.full((bs, 12), 0.4), jax.random.PRNGKey(0))

        def step(x, st):
            y, eq_zi = streaming.parametric_eq_stream(x, SR, *eq_p, zi=st["eq"])
            y, comp_zi = streaming.compressor_stream(y, SR, **comp_p, zi=st["comp"])
            y, rev = streaming.reverb_stream(y, st["rev"])
            return y, {"eq": eq_zi, "comp": comp_zi, "rev": rev}

        def state0(chunk):
            # rev constants ride the carry as ARGS (loop-invariant; never
            # closure constants — the tunnel cannot fetch device arrays
            # during constant-embedding at lowering time)
            return {"eq": jnp.zeros((bs, 2, 6, 2)),
                    "comp": jnp.zeros((bs, 1, 1, 4)),
                    "rev": rev_state0}
    else:  # mastering: the beyond-reference dynamics serving chain
        ts_p = {k: np.full((bs,), v, np.float32)
                for k, v in dict(attack=0.6, sustain=-0.4).items()}
        deq_p = dict(
            frequency_hz=np.tile(np.asarray([[200.0, 1500.0, 6000.0]], np.float32), (bs, 1)),
            q_factor=np.full((bs, 3), 2.0, np.float32),
            threshold_db=np.full((bs, 3), -24.0, np.float32),
            ratio=np.full((bs, 3), 4.0, np.float32),
            attack_ms=np.full((bs, 3), 5.0, np.float32),
            release_ms=np.full((bs, 3), 80.0, np.float32),
        )
        exc_p = [np.full((bs,), v, np.float32) for v in (3000.0, 12.0, 0.4)]
        lim_p = {k: np.full((bs,), v, np.float32) for k, v in dict(
            threshold_db=-3.0, attack_ms=2.0, release_ms=80.0,
            knee_db=3.0, makeup_gain_db=0.0).items()}

        def step(x, st):
            y, s1 = streaming.transient_shaper_stream(x, SR, **ts_p, state=st["ts"])
            y, s2 = streaming.dynamic_eq_stream(y, SR, **deq_p, state=st["deq"])
            y, s3 = streaming.exciter_stream(y, SR, *exc_p, zi=st["exc"])
            y, s4 = streaming.limiter_stream(y, SR, **lim_p, zi=st["lim"])
            return y, {"ts": s1, "deq": s2, "exc": s3, "lim": s4}

        def state0(chunk):
            # one from-rest step fixes the carried pytree structure
            z = jnp.zeros((bs, 2, chunk), jnp.float32)
            _, st = jax.jit(lambda z: step(
                z, {"ts": None, "deq": None, "exc": None, "lim": None}))(z)
            return jax.tree.map(jnp.zeros_like, st)

    # chained fori_loop with a scalar readback — the only timing method
    # that survives the remote-execution tunnel (see benchmarks/processors.py)
    @jax.jit
    def run(x, st0):
        def body(i, carry):
            st, acc = carry
            y, st = step(x, st)
            return st, acc + jnp.mean(y**2)

        _, acc = jax.lax.fori_loop(0, args.iters, body, (st0, 0.0))
        return acc

    dev = jax.devices()[0]
    results = {"device": f"{dev.platform}:{dev.device_kind}", "batch_size": bs,
               "chain": args.chain, "reverb_ir": args.reverb_samples, "rows": []}
    for chunk in args.chunks:
        if args.chain == "mastering" and chunk % 256 != 0:
            print(f"chunk {chunk}: skipped (dynamic_eq_stream needs "
                  f"multiples of hop=256)", file=sys.stderr)
            continue
        x = jnp.asarray(rng.standard_normal((bs, 2, chunk)).astype(np.float32) * 0.3)
        st0 = state0(chunk)
        float(run(x, st0))  # compile + warmup
        t0 = time.time()
        float(run(x, st0))  # scalar readback = real completion
        ms = (time.time() - t0) / args.iters * 1e3
        chunk_ms = chunk / SR * 1e3
        row = {"chunk": chunk, "latency_ms": round(ms, 3),
               "chunk_ms": round(chunk_ms, 3),
               "realtime_margin": round(chunk_ms / ms, 1)}
        results["rows"].append(row)
        print(f"chunk {chunk:5d} ({chunk_ms:6.2f} ms audio): "
              f"{ms:6.2f} ms/step -> {row['realtime_margin']:.1f}x realtime",
              file=sys.stderr)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"wrote": args.out, "device": results["device"]}))


if __name__ == "__main__":
    main()
