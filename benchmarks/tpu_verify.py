"""On-device verification gate: exact fast paths vs reference paths ON TPU.

The CI suite forces the CPU backend (tests/conftest.py) and Pallas
defaults to interpret mode off-TPU, so bf16/Mosaic behavior — exactly
where past NaN incidents lived (ops/iir.py precision pins; CLAUDE.md) —
was only ever hand-checked during benching. This gate runs ON THE REAL
CHIP and asserts, writing pass/fail rows to
``benchmarks/tpu_verify_report.json``:

* every parametric-EQ SOS fast path (block / coupled / pallas / fsm)
  against a float64 scipy.signal.sosfilt ground truth, plus tight
  mutual-agreement rows that detect dropped precision pins (a bf16
  matmul in the block operators or a Mosaic change in the Pallas kernel
  moves them by >1e-2). Sequential lax.scan paths are excluded: 32k-step
  scans stall the remote TPU compiler, and f64 truth supersedes them;
* the gain smoothers (Pallas branching ballistics, block/Pallas one-pole,
  the 'parallel' approximation) against exact float64 host recursions,
  plus compressor-level mutual agreement;
* the LR4 crossover split across methods + allpass-sum sanity;
* streaming serving chains against their offline renders (EQ->comp->
  limiter StreamChain, spectral gate, phase-vocoder time stretch);
* finite, nonzero gradients of the full style-transfer render chain at
  the reference training scale.

Run directly or as ``python bench.py --verify``; ``--cpu`` validates the
harness off-chip. Exit code 0 iff every row passes.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

REPORT = os.path.join(HERE, "tpu_verify_report.json")


def eprint(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="harness self-check on CPU")
    ap.add_argument("--length", type=int, default=32768)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import dasp_tpu.functional as F

    dev = jax.devices()[0]
    eprint(f"verify device: {dev.platform} ({dev.device_kind})")

    rows = []

    def check(name, got, want, tol, note=""):
        scale = float(jnp.max(jnp.abs(want))) or 1.0
        err = float(jnp.max(jnp.abs(got - want))) / scale
        ok = bool(np.isfinite(err) and err <= tol)
        rows.append({"name": name, "max_rel_err": err, "tol": tol,
                     "pass": ok, **({"note": note} if note else {})})
        eprint(f"  {'PASS' if ok else 'FAIL'} {name}: {err:.3g} (tol {tol:g})")

    def check_flag(name, ok, note=""):
        rows.append({"name": name, "pass": bool(ok),
                     **({"note": note} if note else {})})
        eprint(f"  {'PASS' if ok else 'FAIL'} {name}" + (f" ({note})" if note else ""))

    rng = np.random.default_rng(7)
    sr = 44100.0
    bs, chs, T = 4, 2, args.length
    x = jnp.asarray(rng.standard_normal((bs, chs, T)).astype(np.float32) * 0.25)

    # --- 1. parametric EQ: every fast SOS path vs f64 scipy ---------------
    eprint("[1/5] parametric EQ SOS paths")
    eq_p = [jnp.asarray(rng.uniform(lo, hi, (bs,)).astype(np.float32))
            for lo, hi in [(-12, 12), (40, 1000), (0.3, 4.0),
                           (-12, 12), (80, 2000), (0.3, 4.0),
                           (-12, 12), (2000, 8000), (0.3, 4.0),
                           (-12, 12), (8000, 12000), (0.3, 4.0),
                           (-12, 12), (12000, 16000), (0.3, 4.0),
                           (-12, 12), (4000, 16000), (0.3, 4.0)]]

    def eq(method):
        t0 = time.time()
        y = jax.jit(lambda x: F.parametric_eq(
            x, sr, *eq_p, filter_method=method))(x)
        y.block_until_ready()
        eprint(f"    eq[{method}] ran in {time.time()-t0:.1f}s")
        return y

    # ground truth: float64 scipy.signal.sosfilt on the same SOS —
    # the fp32 sequential scan ("exact") is itself the NOISIEST path for
    # low-frequency bands (the reason the coupled form exists), so it
    # cannot serve as the reference
    import scipy.signal

    sos_np = np.asarray(F.parametric_eq_sos(bs, jnp.float32, sr, *eq_p),
                        dtype=np.float64)
    # TPU divides via reciprocal-multiply, so a0 lands at 1 +- 1 ulp;
    # scipy's validator wants exact ones — renormalize in f64
    sos_np = sos_np / sos_np[:, :, 3:4]
    x_np = np.asarray(x, dtype=np.float64)
    y_f64 = np.stack([
        np.stack([scipy.signal.sosfilt(np.ascontiguousarray(sos_np[b]),
                                       np.ascontiguousarray(x_np[b, c]))
                  for c in range(chs)]) for b in range(bs)
    ]).astype(np.float32)

    y_block = eq("block")
    # absolute accuracy: every fp32 time-domain path carries ~1e-3 state
    # rounding on the 40-1000 Hz bands at this length (the FSM path works
    # in the frequency domain and sits ~5e-5 from f64). The sequential
    # lax.scan path is NOT run here: 32k-step scans stall the remote TPU
    # compiler for >10 min (the f64 truth supersedes it anyway).
    for m, y_m, tol in [("block", y_block, 5e-3), ("coupled", eq("coupled"), 5e-3),
                        ("pallas", eq("pallas"), 5e-3),
                        ("fsm", eq("fsm"), 2e-2)]:
        check(f"eq/{m}_vs_f64", y_m, y_f64, tol)
    # mutual agreement: the TPU-regression detector — a dropped precision
    # pin (bf16 matmul in the block/coupled operators or the Pallas
    # kernel) moves these by >1e-2 (CLAUDE.md NaN incidents)
    check("eq/coupled_vs_block", eq("coupled"), y_block, 2e-3)
    check("eq/pallas_vs_block", eq("pallas"), y_block, 2e-3)

    # --- 2. gain smoothers vs float64 host recursions ---------------------
    # (the sequential lax.scan modes stall the remote TPU compiler at this
    # length, so the ground truth is the same recursion in f64 numpy)
    eprint("[2/5] gain smoothers (ballistics / one-pole kernels)")
    from dasp_tpu.ops.iir import (
        ballistics_smooth, lfilter1_blockmat, onepole_ba,
    )
    from dasp_tpu.ops.pallas_ballistics import ballistics_pallas
    from dasp_tpu.ops.pallas_iir import lfilter1_pallas

    g_curve = -jnp.abs(jnp.asarray(  # dB gain-reduction-like curve <= 0
        np.cumsum(rng.standard_normal((bs, 1, T)).astype(np.float32) * 0.3,
                  axis=-1) / 8.0))
    a_att = jnp.asarray(rng.uniform(0.9, 0.99, (bs, 1, 1)).astype(np.float32))
    a_rel = jnp.asarray(rng.uniform(0.995, 0.999, (bs, 1, 1)).astype(np.float32))

    g64 = np.asarray(g_curve, np.float64)
    aa64 = np.asarray(a_att, np.float64)
    ar64 = np.asarray(a_rel, np.float64)
    y_bal64 = np.zeros_like(g64)
    y_att64 = np.zeros_like(g64)
    yb = np.zeros_like(g64[..., 0])
    ya = np.zeros_like(g64[..., 0])
    for n in range(T):  # exact branching + attack-only recursions, f64
        gn = g64[..., n]
        al = np.where(gn < yb, aa64[..., 0], ar64[..., 0])
        yb = (1.0 - al) * gn + al * yb
        ya = (1.0 - aa64[..., 0]) * gn + aa64[..., 0] * ya
        y_bal64[..., n] = yb
        y_att64[..., n] = ya

    check("smoother/exact_pallas_vs_f64",
          jax.jit(lambda g: ballistics_pallas(g, a_att, a_rel))(g_curve),
          y_bal64.astype(np.float32), 5e-4,
          note="true branching ballistics in the Pallas kernel")
    check("smoother/parallel_vs_f64",
          jax.jit(lambda g: ballistics_smooth(g, a_att, a_rel, mode="parallel"))(g_curve),
          y_bal64.astype(np.float32), 4e-1,
          note="'parallel' is the documented two-pass approximation; this "
               "synthetic random-walk curve is adversarial for it — the "
               "compressor-level row below bounds realistic program error")
    b1, a1 = onepole_ba(a_att.reshape(bs, 1))
    check("smoother/block_onepole_vs_f64",
          jax.jit(lambda g: lfilter1_blockmat(g, b1, a1))(g_curve),
          y_att64.astype(np.float32), 5e-4)
    check("smoother/pallas_onepole_vs_f64",
          jax.jit(lambda g: lfilter1_pallas(g, b1, a1))(g_curve),
          y_att64.astype(np.float32), 5e-4)

    # compressor-level mutual agreement across the fast smoothers
    cp = [jnp.full((bs,), v, np.float32)
          for v in (-24.0, 6.0, 8.0, 80.0, 4.0, 2.0)]

    def comp(sm):
        return jax.jit(lambda x: F.compressor(x, sr, *cp, smoother=sm))(x)

    y_cb = comp("block")
    check("comp/pallas_vs_block", comp("pallas"), y_cb, 2e-4)
    check("comp/fsm_vs_block", comp("fsm"), y_cb, 2e-2,
          note="reference-parity FSM smoother; loose by design")
    check("comp/exact_pallas_vs_parallel", comp("exact_pallas"),
          comp("parallel"), 1e-1,
          note="true ballistics vs its parallel approximation")

    # --- 3. LR4 crossover split: fast paths vs exact, and reconstruction -
    eprint("[3/5] LR4 crossover")

    def split(method):
        return jax.jit(lambda x: F._lr4_three_band_split(
            x, jnp.full((bs,), 200.0), jnp.full((bs,), 2000.0), sr, method))(x)

    lo_c, mid_c, hi_c = split("coupled")  # tightest fp32 path = anchor
    for m, tol in [("block", 1e-3), ("fsm", 2e-2)]:
        lo, mid, hi = split(m)
        check(f"crossover/{m}_vs_coupled", lo + mid + hi, lo_c + mid_c + hi_c,
              tol)
    # LR4 trees are allpass-complementary: the band sum is an ALLPASS of
    # the input — flat magnitude, rotated phase — so compare spectra.
    # Per-bin ratios on a finite noise realization also carry the filter
    # edge transients, so this is a sanity row, not a precision row.
    mag_sum = jnp.abs(jnp.fft.rfft(lo_c + mid_c + hi_c, axis=-1))
    mag_in = jnp.abs(jnp.fft.rfft(x, axis=-1))
    check("crossover/reconstruction_magnitude", mag_sum, mag_in, 1.5e-1,
          note="allpass-complementary sum: flat magnitude, rotated phase; "
               "per-bin FFT on finite noise includes edge transients")

    # --- 4. streaming serving chains vs offline --------------------------
    eprint("[4/5] streaming vs offline")
    from dasp_tpu import streaming

    def stream_all(step, sig, chunk):
        outs, state = [], None
        for i in range(0, sig.shape[-1], chunk):
            y, state = step(sig[..., i:i + chunk], state)
            outs.append(y)
        return jnp.concatenate(outs, axis=-1)

    lp = [jnp.full((bs,), v, np.float32) for v in (-8.0, 1.0, 120.0, 2.0, 0.0)]
    chain = streaming.StreamChain([
        ("eq", lambda c, s: streaming.parametric_eq_stream(
            c, sr, *eq_p, zi=s, filter_method="coupled")),
        ("comp", lambda c, s: streaming.compressor_stream(c, sr, *cp, zi=s,
                                                          smoother="block")),
        ("lim", lambda c, s: streaming.limiter_stream(c, sr, *lp, zi=s)),
    ])

    @jax.jit
    def chain_offline(x):
        y = F.parametric_eq(x, sr, *eq_p, filter_method="coupled")
        y = F.compressor(y, sr, *cp, smoother="block")
        return F.limiter(y, sr, *lp, smoother="parallel")

    check("stream/eq_comp_lim_chain", stream_all(jax.jit(chain), x, 2048),
          chain_offline(x), 2e-4)

    # spectral gate (WOLA machinery), measured profile, causal detector
    fsz, hop = 2048, 512
    noise_only = jnp.asarray(rng.standard_normal((bs, chs, 16384)).astype(np.float32) * 0.05)
    prof = jax.jit(lambda n: F.spectral_noise_profile(n, fsz, hop))(noise_only)
    sg_kw = dict(threshold_db=jnp.full((bs,), 6.0), range_db=jnp.full((bs,), 24.0),
                 attack_ms=jnp.full((bs,), 5.0), release_ms=jnp.full((bs,), 80.0),
                 noise_profile_db=prof)
    off = jax.jit(lambda x: F.spectral_gate(
        x, sr, **sg_kw, det_smooth_mode="causal", frame_size=fsz, hop=hop))(x)
    got = stream_all(jax.jit(lambda c, s: streaming.spectral_gate_stream(
        c, sr, **sg_kw, frame_size=fsz, hop=hop, state=s)), x, 2048)
    left = fsz - hop
    check("stream/spectral_gate", got[..., left:], off[..., :T - left], 2e-4)

    # phase vocoder time stretch (whole chunks; K_in must divide by 5
    # so K_out = K_in / 1.25 is an integer)
    rate = 1.25
    k_in = 20 if T >= 40 * hop else 5
    chunk_ts = k_in * hop
    x_ts = x[..., : (T // chunk_ts) * chunk_ts]
    off_ts = jax.jit(lambda x: F.time_stretch(x, sr, rate, fsz, hop))(x_ts)
    got_ts = stream_all(jax.jit(lambda c, s: streaming.time_stretch_stream(
        c, sr, rate, fsz, hop, state=s)), x_ts, chunk_ts)
    delay = (fsz - hop) + hop  # D = 1 at rate 1.25
    n = min(off_ts.shape[-1], got_ts.shape[-1] - delay) - fsz
    check("stream/time_stretch", got_ts[..., delay:delay + n],
          off_ts[..., :n], 2e-4)

    # --- 5. finite grads at training scale --------------------------------
    eprint("[5/5] training-scale gradients")
    from dasp_tpu.models import apply_style_chain, make_style_processors
    from dasp_tpu.utils import multi_resolution_stft_loss

    if args.cpu:  # harness self-check: shrink the training-scale section
        procs = make_style_processors(int(sr), reverb_num_samples=4096)
        bs_t, half = 2, 16384
    else:
        procs = make_style_processors(int(sr), reverb_num_samples=65536)
        bs_t, half = 8, 131072
    xt = jnp.asarray(rng.standard_normal((bs_t, 1, half)).astype(np.float32) * 0.25)
    ref = jnp.asarray(rng.standard_normal((bs_t, 1, half)).astype(np.float32) * 0.25)
    p0 = {k: jnp.asarray(rng.uniform(0.05, 0.95, (bs_t, procs[k].num_params))
                         .astype(np.float32))
          for k in ("equalizer", "compressor", "reverb", "gain")}

    @jax.jit
    def loss_fn(p):
        out = apply_style_chain(procs, xt, p, jax.random.PRNGKey(3))
        return multi_resolution_stft_loss(out, jnp.tile(ref, (1, out.shape[1], 1)))

    loss, grads = jax.value_and_grad(loss_fn)(p0)
    leaves = jax.tree.leaves(grads)
    finite = bool(np.isfinite(float(loss))) and all(
        bool(jnp.isfinite(g).all()) for g in leaves)
    nonzero = all(float(jnp.abs(g).sum()) > 0 for g in leaves)
    check_flag("grads/style_chain_training_scale", finite and nonzero,
               note=f"loss={float(loss):.4f}, {len(leaves)} grad leaves "
                    f"finite={finite} nonzero={nonzero}")

    ok = all(r["pass"] for r in rows)
    report = {
        "device": f"{dev.platform} ({dev.device_kind})",
        "length": T,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "ok": ok,
        "rows": rows,
    }
    with open(REPORT, "w") as f:
        json.dump(report, f, indent=1)
    eprint(f"{'ALL PASS' if ok else 'FAILURES'} -> {REPORT}")
    print(json.dumps({"metric": "tpu_verify_rows_passed",
                      "value": sum(r["pass"] for r in rows),
                      "unit": f"of {len(rows)}", "ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
