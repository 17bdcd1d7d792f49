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
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "streaming_latency.json"))
    args = ap.parse_args()

    bs = args.batch_size
    rng = np.random.default_rng(0)
    # host-side numpy constants: the axon tunnel cannot fetch device
    # arrays back during constant-embedding at lowering time
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

    def step(x, eq_zi, comp_zi, rev_state):
        y, eq_zi = streaming.parametric_eq_stream(x, SR, *eq_p, zi=eq_zi)
        y, comp_zi = streaming.compressor_stream(y, SR, **comp_p, zi=comp_zi)
        y, rev_state = streaming.reverb_stream(y, rev_state)
        return y, eq_zi, comp_zi, rev_state

    # chained fori_loop with a scalar readback — the only timing method
    # that survives the remote-execution tunnel (see benchmarks/processors.py)
    @jax.jit
    def run(x, rev_state):
        eq_zi = jnp.zeros((bs, 2, 6, 2))
        comp_zi = jnp.zeros((bs, 1, 1, 4))

        def body(i, carry):
            eq_zi, comp_zi, hist, acc = carry
            y, eq_zi2, comp_zi2, st = step(
                x, eq_zi, comp_zi, {**rev_state, "hist": hist})
            return eq_zi2, comp_zi2, st["hist"], acc + jnp.mean(y**2)

        _, _, _, acc = jax.lax.fori_loop(
            0, args.iters, body, (eq_zi, comp_zi, rev_state["hist"], 0.0))
        return acc

    dev = jax.devices()[0]
    results = {"device": f"{dev.platform}:{dev.device_kind}", "batch_size": bs,
               "reverb_ir": args.reverb_samples, "rows": []}
    for chunk in args.chunks:
        x = jnp.asarray(rng.standard_normal((bs, 2, chunk)).astype(np.float32) * 0.3)
        float(run(x, rev_state0))  # compile + warmup
        t0 = time.time()
        float(run(x, rev_state0))  # scalar readback = real completion
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
