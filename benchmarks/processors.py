"""Per-processor realtime-factor benchmark (the BASELINE tracked metric:
audio-seconds processed per wall-clock second per chip).

Measures every effect — forward and forward+grad — at the reference
workload scale (batch 8, stereo, 131072 samples @ 44.1 kHz; reverb with a
65536-sample IR) on the default JAX device, and writes a JSON report.

    python benchmarks/processors.py [--out benchmarks/processors_report.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import dasp_tpu as D  # noqa: E402

SR = 44100


def timed(fn, inputs, iters=10):
    """Pipelined throughput timing over a cycle of DISTINCT inputs (repeating
    one buffer lets the runtime elide work and reports fantasy numbers)."""
    y = jax.block_until_ready(fn(inputs[0]))  # compile + warmup
    t0 = time.time()
    for i in range(iters):
        y = fn(inputs[i % len(inputs)])
    jax.block_until_ready(y)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "processors_report.json"))
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--length", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    bs, T = args.batch_size, args.length
    rng = np.random.default_rng(0)
    inputs = [
        jnp.asarray(rng.standard_normal((bs, 2, T)).astype(np.float32) * 0.25)
        for _ in range(4)
    ]
    key = jax.random.PRNGKey(0)
    f = lambda v: jnp.full((bs,), v)  # noqa: E731

    eq_params = [2.0, 200.0, 0.7, 3.0, 400.0, 1.0, -2.0, 3000.0, 2.0,
                 1.0, 9000.0, 1.0, 2.0, 13000.0, 1.0, -3.0, 8000.0, 0.7]
    dyn = dict(threshold_db=f(-24.0), ratio=f(4.0), attack_ms=f(10.0),
               release_ms=f(60.0), knee_db=f(6.0), makeup_gain_db=f(0.0))
    rev = [f(0.5)] * 25

    cases = {
        "gain": lambda x: D.gain(x, SR, f(3.0)),
        "distortion": lambda x: D.distortion(x, SR, f(12.0)),
        "advanced_distortion": lambda x: D.advanced_distortion(x, SR, f(12.0), f(-3.0), f(0.5), f(0.01)),
        "parametric_eq_fsm": lambda x: D.parametric_eq(x, SR, *[f(v) for v in eq_params]),
        "parametric_eq_exact_pallas": lambda x: D.parametric_eq(
            x, SR, *[f(v) for v in eq_params], filter_method="pallas"),
        "graphic_eq": lambda x: D.graphic_eq(x, SR, jnp.zeros((bs, 10)) + 3.0),
        "compressor_fsm": lambda x: D.compressor(x, SR, **dyn, smoother="fsm"),
        "compressor_ballistics": lambda x: D.compressor(x, SR, **dyn, smoother="parallel"),
        "compressor_pallas": lambda x: D.compressor(x, SR, **dyn, smoother="pallas"),
        "compressor_exact_pallas": lambda x: D.compressor(x, SR, **dyn, smoother="exact_pallas"),
        "expander": lambda x: D.expander(x, SR, **dyn, smoother="parallel"),
        "reverb": lambda x: D.noise_shaped_reverberation(x, SR, *rev, key=key),
        "reverb_freq_noise": lambda x: D.noise_shaped_reverberation(
            x, SR, *rev, key=key, noise_mode="frequency"),
        "stereo_widener": lambda x: D.stereo_widener(x, SR, f(0.7)),
    }

    audio_sec = bs * T / SR  # per-item seconds x batch
    dev = jax.devices()[0]
    report = {
        "device": f"{dev.platform}:{dev.device_kind}",
        "batch_size": bs,
        "length": T,
        "sample_rate": SR,
        "audio_seconds_per_call": audio_sec,
        "note": (
            "pipelined throughput timing; through the remote-execution tunnel "
            "sub-millisecond programs are below dispatch resolution, so tiny "
            "effects (gain/distortion/eq forward) read as upper-bound-free "
            "device time while multi-ms programs are wall-clock accurate"
        ),
        "processors": {},
    }

    for name, fn in cases.items():
        try:
            fwd = jax.jit(fn)
            t_fwd = timed(fwd, inputs, iters=args.iters)

            loss = jax.jit(jax.grad(lambda x: jnp.mean(fn(x) ** 2)))
            t_grad = timed(loss, inputs, iters=args.iters)
        except Exception as e:  # keep the report going (remote compile flakes)
            report["processors"][name] = {"error": str(e)[:200]}
            print(f"{name:28s} FAILED: {str(e)[:80]}", file=sys.stderr, flush=True)
            continue

        report["processors"][name] = {
            "forward_ms": round(t_fwd * 1e3, 3),
            "forward_rtf": round(audio_sec / t_fwd, 1),
            "grad_ms": round(t_grad * 1e3, 3),
            "grad_rtf": round(audio_sec / t_grad, 1),
        }
        print(f"{name:28s} fwd {t_fwd*1e3:8.2f} ms ({audio_sec/t_fwd:9.0f}x RT)   "
              f"grad {t_grad*1e3:8.2f} ms ({audio_sec/t_grad:9.0f}x RT)", file=sys.stderr, flush=True)

    with open(args.out, "w") as fjson:
        json.dump(report, fjson, indent=2)
    print(json.dumps({"wrote": args.out, "device": report["device"]}))


if __name__ == "__main__":
    main()
