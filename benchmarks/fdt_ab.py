"""A/B of fractional-delay adjoint strategies at reference scale.

The pitch/delay effect family (pitch_shift, modulated_delay, the PV
resampler) shares one hot primitive: the tiled fused-interpolation-matrix
contraction (functional._frac_delay_matmul). Round 4 left its gradient
5-8x slower than its forward (processors_report.json: pitch_shift fwd
1257x RTF vs grad 164x) — the autodiff einsum transpose materializes the
(bs, chunk, B, W) matrix cotangent. This bench times the forward and the
value_and_grad of each adjoint strategy on the real device and writes
benchmarks/fdt_ab_report.json; the winner is wired as the default
(`adjoint="auto"`).

    python benchmarks/fdt_ab.py [--iters 8]
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

import dasp_tpu.functional as F  # noqa: E402

SR = 44100


def timed_scalar(make_many, *args, iters):
    """processors.py-style chained fori_loop timing (see its docstring:
    the only method that survives the tunnel's early-completion).

    A SIGALRM deadline guards the first (compiling) call: remote compile
    RPCs through the tunnel occasionally stall indefinitely (CLAUDE.md);
    one stalled case must not wedge the whole A/B. A timed-out case
    raises and is retried once by the caller loop in main()."""
    import signal

    many = make_many(iters)

    def _raise(signum, frame):
        raise TimeoutError("compile/warmup deadline")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(1200)
    try:
        float(many(*args))  # compile + warmup
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    t0 = time.time()
    float(many(*args))
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fdt_ab_report.json"))
    args = ap.parse_args()

    bs, chs, T = 8, 2, 131072
    audio_s = bs * T / SR
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bs, chs, T)).astype(np.float32) * 0.25)
    st = jnp.asarray(np.linspace(-7, 7, bs).astype(np.float32))
    mix = jnp.asarray(np.full(bs, 0.7, np.float32))
    rate = jnp.asarray(np.full(bs, 0.8, np.float32))
    depth = jnp.asarray(np.full(bs, 12.0, np.float32))
    base = jnp.asarray(np.full(bs, 8.0, np.float32))

    def renorm(y):
        return y * jax.lax.rsqrt(jnp.mean(jnp.square(y)) + 1e-12) * 0.25

    def bench_fn(fn, params, grad):
        if grad:
            gfn = jax.grad(lambda x, p: jnp.mean(fn(x, p) ** 2), argnums=(0, 1))

            def make_many(iters):
                @jax.jit
                def many(z, p):
                    def body(i, carry):
                        c, s = carry
                        dx, dp = gfn(c, p)
                        s = s + sum(jnp.sum(q) for q in jax.tree.leaves(dp))
                        return renorm(dx), s
                    c, s = jax.lax.fori_loop(0, iters, body, (z, 0.0))
                    return jnp.sum(c) + s
                return many
        else:
            def make_many(iters):
                @jax.jit
                def many(z, p):
                    return jnp.sum(jax.lax.fori_loop(
                        0, iters, lambda i, c: renorm(fn(c, p)), z))
                return many
        return timed_scalar(make_many, x, params, iters=args.iters)

    cases = {}

    def add(name, fn, params):
        try:
            f = bench_fn(fn, params, False)
            g = bench_fn(fn, params, True)
        except TimeoutError as e:
            print(f"{name:34s} SKIPPED ({e})", flush=True)
            cases[name] = {"error": str(e)}
            return
        cases[name] = {
            "fwd_ms": round(f * 1e3, 2), "grad_ms": round(g * 1e3, 2),
            "fwd_rtf": round(audio_s / f, 1), "grad_rtf": round(audio_s / g, 1),
        }
        print(f"{name:34s} fwd {f*1e3:8.2f} ms ({audio_s/f:7.1f}x)   "
              f"grad {g*1e3:8.2f} ms ({audio_s/g:7.1f}x)", flush=True)

    # pitch_shift: matmul path, all adjoints, plus the gather path
    for adj in ("pallas", "ad", "hybrid"):
        add(f"pitch_shift[{adj}]",
            lambda c, p, adj=adj: F.pitch_shift(
                c, SR, p["st"], p["mix"], adjoint=adj),
            {"st": st, "mix": mix})
    add("pitch_shift[gather]",
        lambda c, p: F.pitch_shift(c, SR, p["st"], p["mix"], matmul=False),
        {"st": st, "mix": mix})

    # modulated_delay: gather default vs matmul both adjoints
    add("modulated_delay[gather]",
        lambda c, p: F.modulated_delay(c, SR, p["r"], p["d"], p["b"], p["m"]),
        {"r": rate, "d": depth, "b": base, "m": mix})
    for adj in ("pallas", "ad", "hybrid"):
        add(f"modulated_delay_matmul[{adj}]",
            lambda c, p, adj=adj: F.modulated_delay(
                c, SR, p["r"], p["d"], p["b"], p["m"], max_delay_ms=22.0,
                block=512, adjoint=adj),
            {"r": rate, "d": depth, "b": base, "m": mix})

    report = {
        "device": f"{jax.devices()[0].platform}:{jax.devices()[0].device_kind}",
        "batch_size": bs, "length": T, "sample_rate": SR,
        "audio_seconds_per_call": audio_s,
        "cases": cases,
    }
    with open(args.out, "w") as fp:
        json.dump(report, fp, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
