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
import dasp_tpu.utils  # noqa: E402,F401  (binds D.utils for the loudness case)

SR = 44100


def timed(fn, x0, params, iters=10, grad=False, chain=None):
    """Chained fori_loop timing with a scalar readback.

    Through the remote-execution tunnel, ``block_until_ready`` returns
    early for many program shapes (dispatch-chained loops once read
    0.01 ms for a 10 ms FFT program). The only reliable measurement is a
    single jitted program that runs ``iters`` *data-dependent* iterations
    and returns a scalar whose host readback forces real completion.
    Each iteration RMS-renormalizes the carry so dynamics stay in range
    regardless of the effect's gain. With ``grad`` the iteration computes
    d mean(fn^2) / d(audio, params); the parameter cotangents are folded
    into the returned scalar so XLA cannot dead-code-eliminate them.
    """
    import jax.numpy as _jnp
    from jax import lax as _lax

    def renorm(y):
        return y * _lax.rsqrt(_jnp.mean(_jnp.square(y)) + 1e-12) * 0.25

    # map shape-changing outputs (panner/bus) back to the carry shape; the
    # grad path needs no adapter (the input cotangent has the input shape)
    out_to_carry = chain if chain is not None else (lambda y: y)

    if grad:
        gfn = jax.grad(lambda x, p: _jnp.mean(fn(x, p) ** 2), argnums=(0, 1))

        @jax.jit
        def many(z, p):
            def body(i, carry):
                c, s = carry
                dx, dp = gfn(c, p)
                s = s + sum(_jnp.sum(q) for q in jax.tree.leaves(dp))
                return renorm(dx), s
            c, s = _lax.fori_loop(0, iters, body, (z, 0.0))
            return _jnp.sum(c) + s
    else:
        @jax.jit
        def many(z, p):
            return _jnp.sum(
                _lax.fori_loop(0, iters, lambda i, c: renorm(out_to_carry(fn(c, p))), z)
            )

    float(many(x0, params))  # compile + warmup
    t0 = time.time()
    float(many(x0, params))  # scalar readback = real completion
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "processors_report.json"))
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--length", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", default=None,
                    help="comma-separated substring filters on case names; "
                         "measured rows are merged into an existing report "
                         "instead of replacing it")
    ap.add_argument("--missing", action="store_true",
                    help="measure only cases absent from (or failed in) the "
                         "existing report, merging into it")
    args = ap.parse_args()

    bs, T = args.batch_size, args.length
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((bs, 2, T)).astype(np.float32) * 0.25)
    key = jax.random.PRNGKey(0)
    f = lambda v: jnp.full((bs,), v)  # noqa: E731

    eq_params = [2.0, 200.0, 0.7, 3.0, 400.0, 1.0, -2.0, 3000.0, 2.0,
                 1.0, 9000.0, 1.0, 2.0, 13000.0, 1.0, -3.0, 8000.0, 0.7]
    dyn = [f(-24.0), f(4.0), f(10.0), f(60.0), f(6.0), f(0.0)]
    rev = [f(0.5)] * 25

    # each case: (params_list, fn(x, params)); grads are measured w.r.t.
    # BOTH the audio and the effect parameters — effects are driven by
    # neural networks in every reference application, so parameter
    # gradients are the training-relevant cost
    cases = {
        "gain": ([f(3.0)], lambda x, p: D.gain(x, SR, *p)),
        "distortion": ([f(12.0)], lambda x, p: D.distortion(x, SR, *p)),
        # default = exact block path (stub effect, no parity default)
        "advanced_distortion": (
            [f(12.0), f(-3.0), f(0.5), f(0.01)],
            lambda x, p: D.advanced_distortion(x, SR, *p)),
        "advanced_distortion_fsm": (
            [f(12.0), f(-3.0), f(0.5), f(0.01)],
            lambda x, p: D.advanced_distortion(x, SR, *p, filter_method="fsm")),
        "parametric_eq_fsm": (
            [f(v) for v in eq_params],
            lambda x, p: D.parametric_eq(x, SR, *p)),
        "parametric_eq_exact_pallas": (
            [f(v) for v in eq_params],
            lambda x, p: D.parametric_eq(x, SR, *p, filter_method="pallas")),
        "parametric_eq_block": (
            [f(v) for v in eq_params],
            lambda x, p: D.parametric_eq(x, SR, *p, filter_method="block")),
        # default = exact coupled path (stub effect, no parity default)
        "graphic_eq": (
            [jnp.zeros((bs, 10)) + 3.0],
            lambda x, p: D.graphic_eq(x, SR, *p)),
        "graphic_eq_block": (
            [jnp.zeros((bs, 10)) + 3.0],
            lambda x, p: D.graphic_eq(x, SR, *p, filter_method="block")),
        "graphic_eq_fsm": (
            [jnp.zeros((bs, 10)) + 3.0],
            lambda x, p: D.graphic_eq(x, SR, *p, filter_method="fsm")),
        "parametric_eq_coupled": (
            [f(v) for v in eq_params],
            lambda x, p: D.parametric_eq(x, SR, *p, filter_method="coupled")),
        "compressor_fsm": (dyn, lambda x, p: D.compressor(x, SR, *p, smoother="fsm")),
        "compressor_ballistics": (dyn, lambda x, p: D.compressor(x, SR, *p, smoother="parallel")),
        "compressor_pallas": (dyn, lambda x, p: D.compressor(x, SR, *p, smoother="pallas")),
        "compressor_block": (dyn, lambda x, p: D.compressor(x, SR, *p, smoother="block")),
        "compressor_exact_pallas": (dyn, lambda x, p: D.compressor(x, SR, *p, smoother="exact_pallas")),
        "expander": (dyn, lambda x, p: D.expander(x, SR, *p, smoother="parallel")),
        "sidechain_compressor": (
            dyn, lambda x, p: D.sidechain_compressor(
                x, SR, *p, sidechain=jnp.roll(x, 1000, axis=-1))),
        "noise_gate": (
            [f(-30.0), f(10.0), f(60.0), f(0.5), f(20.0), f(1.0)],
            lambda x, p: D.noise_gate(x, SR, *p, hold_ms=10.0)),
        "de_esser": (
            [f(5000.0), f(-40.0), f(8.0), f(1.0), f(50.0), f(3.0)],
            lambda x, p: D.de_esser(x, SR, *p)),
        "bitcrusher": (
            [f(6.0), f(8000.0), f(0.9)],
            lambda x, p: D.bitcrusher(x, SR, *p)),
        "transient_shaper": (
            [f(0.8), f(-0.5), f(0.0)],
            lambda x, p: D.transient_shaper(x, SR, *p)),
        "exciter": (
            [f(3000.0), f(12.0), f(0.5)],
            lambda x, p: D.exciter(x, SR, *p)),
        "spectral_gate": (
            [f(6.0), f(40.0), f(5.0), f(80.0)],
            lambda x, p: D.spectral_gate(x, SR, *p)),
        "clipper": (
            [f(-6.0), f(0.5)],
            lambda x, p: D.clipper(x, SR, *p)),
        "convolution_reverb": (
            [f(0.4)],
            lambda x, p: D.convolution_reverb(
                x, SR, *p,
                ir=jnp.asarray(rng.standard_normal((bs, 2, 65536)).astype(np.float32)
                               * np.exp(-np.arange(65536, dtype=np.float32) / 22050.0)))),
        "reverb": (rev, lambda x, p: D.noise_shaped_reverberation(x, SR, *p, key=key)),
        "reverb_freq_noise": (
            rev,
            lambda x, p: D.noise_shaped_reverberation(x, SR, *p, key=key, noise_mode="frequency")),
        "stereo_widener": ([f(0.7)], lambda x, p: D.stereo_widener(x, SR, *p)),
        "stereo_imager": (
            [f(250.0), f(2500.0), f(0.2), f(0.5), f(0.8)],
            lambda x, p: D.stereo_imager(x, SR, *p)),
        "wow_flutter": (
            [f(0.8), f(0.2), f(0.8), f(8.0)],
            lambda x, p: D.wow_flutter(x, SR, *p, key=key)),
        "delay": (
            [f(120.0), f(0.5), f(0.5)],
            lambda x, p: D.delay(x, SR, *p)),
        "modulated_delay": (
            [f(1.5), f(5.0), f(15.0), f(0.5)],
            lambda x, p: D.modulated_delay(x, SR, *p)),
        "modulated_delay_matmul": (
            [f(1.5), f(5.0), f(15.0), f(0.5)],
            lambda x, p: D.modulated_delay(x, SR, *p, max_delay_ms=20.0)),
        "pitch_shift": (
            [f(4.0), f(1.0)],
            lambda x, p: D.pitch_shift(x, SR, *p)),
        "pitch_shift_gather": (
            [f(4.0), f(1.0)],
            lambda x, p: D.pitch_shift(x, SR, *p, matmul=False)),
        "pitch_shift_pv": (
            [f(0.0)],  # dummy (the PV shift is static); p keeps the
                       # timing harness's grad path alive
            lambda x, p: D.pitch_shift_pv(x + 0.0 * p[0].reshape(-1, 1, 1), SR, 4.0)),
        "pitch_shift_pv_diff": (
            [f(4.0)],  # differentiable traced shift (max_semitones mode)
            lambda x, p: D.pitch_shift_pv(x, SR, p[0], max_semitones=7.0)),
        "time_stretch": (
            [f(1.25)],  # differentiable traced rate, fixed output length
            lambda x, p: D.time_stretch(x, SR, p[0], out_len=x.shape[-1])),
        "loudness_normalize": (
            [f(-14.0)],  # exercises utils.integrated_loudness end-to-end
            lambda x, p: D.utils.loudness_normalize(x, SR, *p)),
        "tremolo": ([f(4.0), f(0.8)], lambda x, p: D.tremolo(x, SR, *p)),
        "ring_modulator": (
            [f(440.0), f(0.8)],
            lambda x, p: D.ring_modulator(x, SR, *p)),
        "dynamic_eq": (
            [jnp.tile(jnp.asarray([[200.0, 1500.0, 6000.0]]), (bs, 1)),
             jnp.full((bs, 3), 2.0), jnp.full((bs, 3), -24.0),
             jnp.full((bs, 3), 4.0), jnp.full((bs, 3), 5.0),
             jnp.full((bs, 3), 80.0)],
            lambda x, p: D.dynamic_eq(x, SR, *p)),
        "phaser": (
            [f(0.8), f(0.7), f(800.0), f(0.4), f(0.5)],
            lambda x, p: D.phaser(x, SR, *p)),
        "auto_wah": (
            [f(5.0), f(5.0), f(50.0), f(200.0), f(2000.0), f(4.0), f(1.0)],
            lambda x, p: D.auto_wah(x, SR, *p)),
        "limiter_ballistics": (
            [f(-12.0), f(2.0), f(120.0), f(3.0), f(2.0)],
            lambda x, p: D.limiter(x, SR, *p, smoother="parallel")),
        "limiter_block": (
            [f(-12.0), f(2.0), f(120.0), f(3.0), f(2.0)],
            lambda x, p: D.limiter(x, SR, *p, smoother="block")),
        "multiband_compressor": (
            [f(250.0), f(2500.0)]
            + [f(-25.0), f(4.0), f(5.0), f(60.0), f(1.0)]
            + [f(-20.0), f(3.0), f(5.0), f(60.0), f(0.5)]
            + [f(-15.0), f(2.0), f(5.0), f(60.0), f(0.0)]
            + [f(4.0)],
            # default = the fast exact paths (coupled crossovers + block smoother)
            lambda x, p: D.multiband_compressor(x, SR, *p)),
        "multiband_compressor_fsm": (
            [f(250.0), f(2500.0)]
            + [f(-25.0), f(4.0), f(5.0), f(60.0), f(1.0)]
            + [f(-20.0), f(3.0), f(5.0), f(60.0), f(0.5)]
            + [f(-15.0), f(2.0), f(5.0), f(60.0), f(0.0)]
            + [f(4.0)],
            lambda x, p: D.multiband_compressor(
                x, SR, *p, smoother="fsm", filter_method="fsm")),
    }

    # shape-changing stereo effects need their own input shapes and a
    # carry adapter mapping the output back to the input shape
    tracks = 4
    x_tracks = jnp.asarray(rng.standard_normal((bs, tracks, T)).astype(np.float32) * 0.25)
    x_multi = jnp.asarray(rng.standard_normal((bs, 2, tracks, T)).astype(np.float32) * 0.25)
    special = {
        "stereo_panner": (
            x_tracks,
            [jnp.full((bs, tracks), 0.3)],
            lambda x, p: D.stereo_panner(x, SR, *p),
            lambda y: 0.5 * (y[:, 0] + y[:, 1]),  # (bs,2,tracks,T) -> (bs,tracks,T)
        ),
        "stereo_bus": (
            x_multi,
            [jnp.full((bs, tracks), -3.0)],
            lambda x, p: D.stereo_bus(x, SR, *p),
            lambda y: jnp.repeat(y[:, :, None, :], tracks, 2) / tracks,
        ),
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
            "chained fori_loop timing with scalar readback (the only method "
            "that survives the remote-execution tunnel's early-completion "
            "artifacts); grad rows differentiate w.r.t. BOTH audio and effect "
            "parameters (the training-relevant cost); every row carries a "
            "small additive overhead from the RMS renorm + loop plumbing, so "
            "sub-5ms rows are upper bounds. Rows vary up to ~70% between "
            "sessions from tunnel congestion — compare rows within one "
            "report, not across reports. '*_gather' rows and the bare "
            "'modulated_delay' row measure the unbounded-delay GATHER "
            "fallback (TPU gathers run on the scalar core); the shipped "
            "defaults are the matmul rows ('pitch_shift', "
            "'modulated_delay_matmul' — what the Chorus/Flanger/PitchShifter "
            "module wrappers use, which always have a static delay bound). "
            "The full adjoint-strategy A/B for this family lives in "
            "fdt_ab_report.json."
        ),
        "processors": {},
    }

    runs = {name: (x0, params, fn, None) for name, (params, fn) in cases.items()}
    runs.update(special)
    if args.only or args.missing:
        if os.path.exists(args.out):  # merge partial measurements
            with open(args.out) as fjson:
                report["processors"] = json.load(fjson).get("processors", {})
        if args.only:
            pats = [p.strip() for p in args.only.split(",") if p.strip()]
            runs = {n: r for n, r in runs.items() if any(p in n for p in pats)}
        if args.missing:
            done = {n for n, row in report["processors"].items()
                    if "error" not in row}
            runs = {n: r for n, r in runs.items() if n not in done}
            print(f"measuring {len(runs)} missing rows: {sorted(runs)}",
                  file=sys.stderr, flush=True)
    for name, (xc, params, fn, chain) in runs.items():
        try:
            t_fwd = timed(fn, xc, params, iters=args.iters, chain=chain)
            t_grad = timed(fn, xc, params, iters=args.iters, grad=True)
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
