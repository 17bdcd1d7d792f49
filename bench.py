"""Headline benchmark: style-transfer grad steps/sec on the default device.

Runs the full self-supervised style-transfer training step at the
reference workload scale (style_transfer.py:383-409: batch 8, 262144-sample
clips split into 131072-sample A/B halves, 65536-sample reverb IR, 8M-param
encoder, MR-STFT loss) and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": R}

vs_baseline divides our step rate by the PyTorch reference executing the
equivalent step on this host (measured by benchmarks/measure_reference.py,
cached in benchmarks/ref_baseline.json — the reference publishes no
benchmark numbers and no GPU is attached to this host, so the same-host
CPU reference is the only directly measurable baseline).

    python bench.py [--steps 8] [--smoke]
"""

import argparse
import json
import functools
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))
REF_CACHE = os.path.join(HERE, "benchmarks", "ref_baseline.json")


def eprint(*a):
    print(*a, file=sys.stderr, flush=True)


class _PhaseTimeout(Exception):
    pass


class _phase_deadline:
    """Best-effort watchdog for the SECONDARY bench phases.

    The driver runs bench.py unattended at round end; a transient
    remote-tunnel stall inside an optional phase (input-pipeline /
    host-streamed / reservoir measurements) must not take the primary
    headline measurement down with it. SIGALRM interrupts Python-level
    waits (queue gets, iteration loops); a stall inside an
    uninterruptible C call can still wedge the process — this narrows
    the exposure window, it cannot close it.
    """

    def __init__(self, seconds: int, label: str):
        self.seconds, self.label = seconds, label

    def __enter__(self):
        import signal, threading
        self._armed = (os.name == "posix" and hasattr(signal, "SIGALRM")
                       and threading.current_thread() is threading.main_thread())
        if self._armed:
            def _raise(signum, frame):
                raise _PhaseTimeout(self.label)
            self._old = signal.signal(signal.SIGALRM, _raise)
            signal.alarm(self.seconds)
        return self

    def __exit__(self, *exc):
        if self._armed:
            import signal
            signal.alarm(0)
            signal.signal(signal.SIGALRM, self._old)
        return False


def _round_or_none(v, ndigits=4):
    return round(v, ndigits) if isinstance(v, (int, float)) and np.isfinite(v) else None


def _pct_or_none(num, den, ndigits=1):
    if not (isinstance(num, (int, float)) and isinstance(den, (int, float)) and den):
        return None
    return round(100.0 * num / den, ndigits)


def get_reference_baseline(target_bs: int) -> float:
    """steps/sec of the torch reference at the target batch size (cached)."""
    if not os.path.exists(REF_CACHE):
        eprint("measuring torch reference baseline (one-time, cached)...")
        try:
            subprocess.run(
                [sys.executable, os.path.join(HERE, "benchmarks", "measure_reference.py"),
                 "--steps", "2", "--batch-size-target", str(target_bs)],
                check=True, timeout=1800, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        except Exception as e:  # torch missing / too slow: no baseline
            eprint(f"reference measurement failed: {e}")
            return float("nan")
    with open(REF_CACHE) as f:
        ref = json.load(f)
    # rescale if the cache was computed for a different batch size
    return ref["bs1_steps_per_sec"] / target_bs


def build_style_workload(batch_size: int = 8, length: int = 262144,
                         bf16: bool = True, eq_method: str = "block",
                         comp_smoother: str = "block", smoke: bool = False):
    """Construct the reference-scale style-transfer training workload.

    Returns a dict with the jitted steps (device-resident input,
    on-device synthesis, i16-wire input), the initialized training
    state, and the host-side input factories — shared by this script's
    phases and benchmarks/stream_ab.py (the streamed-input A/B).
    Reference workload: /root/reference/examples/style_transfer.py:383-409.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from dasp_tpu.models import (StyleTransferNet, apply_style_chain,
                                 make_style_processors)
    from dasp_tpu.utils import (BatchPacker, multi_resolution_stft_loss,
                                wire_decode)

    sr = 44100
    dtype = jnp.bfloat16 if bf16 else None
    proc_opts = dict(eq_filter_method=eq_method, compressor_smoother=comp_smoother)
    if smoke:
        processors = make_style_processors(sr, reverb_num_samples=2048, **proc_opts)
        net = StyleTransferNet(embed_dim=32, ch_dim=8, encoder_dilations=(1, 2, 4), dtype=dtype)
    else:
        processors = make_style_processors(sr, reverb_num_samples=65536, **proc_opts)
        net = StyleTransferNet(dtype=dtype)

    bs, half = batch_size, length // 2

    x0 = jnp.zeros((bs, 1, half), jnp.float32)
    variables = jax.jit(lambda k: net.init(k, x0, x0, train=False))(jax.random.PRNGKey(0))
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    def _step_core(params, batch_stats, opt_state, x, rand, key):
        k_ref, k_out = jax.random.split(key)
        ref = processors["equalizer"].process_normalized(x, rand["eq"], clip_params=True)
        ref = processors["compressor"].process_normalized(ref, rand["comp"], clip_params=True)
        ref = processors["reverb"].process_normalized(ref, rand["reverb"], clip_params=True, key=k_ref)
        peak = jnp.max(jnp.abs(ref), axis=-1, keepdims=True)
        ref = ref / (peak + 1e-9)
        ref = ref * 10.0 ** (-rand["g1"] / 20.0)
        x = x * 10.0 ** (-rand["g2"] / 20.0)
        input_a, _ = jnp.split(x, 2, axis=-1)
        ref_a, ref_b = jnp.split(ref, 2, axis=-1)

        def loss_fn(params):
            p, updates = net.apply(
                {"params": params, "batch_stats": batch_stats},
                input_a, jnp.mean(ref_b, axis=1, keepdims=True),
                train=True, mutable=["batch_stats"])
            out_a = apply_style_chain(processors, input_a, p, k_out)
            return multi_resolution_stft_loss(out_a, ref_a), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, x, rand, key):
        return _step_core(params, batch_stats, opt_state, x, rand, key)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def synth_train_step(params, batch_stats, opt_state, key):
        """Device-synthesis feeding mode: the batch (audio + corruption
        params) is generated ON DEVICE from one PRNG key — the
        host-independent input path. The corruption chain already runs on
        device; synthesizing the raw audio there too removes the host
        from the steady-state loop entirely (keys are O(bytes))."""
        ks = jax.random.split(key, 7)
        x = 0.25 * jax.random.normal(ks[0], (bs, 1, 2 * half), jnp.float32)
        rand = {
            "eq": jax.random.uniform(ks[1], (bs, 18)),
            "comp": jax.random.uniform(ks[2], (bs, 6)),
            "reverb": jax.random.uniform(ks[3], (bs, 25)),
            "g1": jax.random.uniform(ks[4], (bs, 1, 1), maxval=24.0),
            "g2": jax.random.uniform(ks[5], (bs, 1, 1), maxval=24.0),
        }
        return _step_core(params, batch_stats, opt_state, x, rand, ks[6])

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step_wire(params, batch_stats, opt_state, enc, key):
        """Streamed-input step: decode the i16-wire batch INSIDE the jit
        (one device dispatch per step; XLA fuses the dequant into the
        batch's first consumer)."""
        x, rand = wire_decode(enc)
        return _step_core(params, batch_stats, opt_state, x, rand, key)

    # The packed streamed path models FILE-BACKED training faithfully:
    # audio datasets are 16-bit PCM on disk, so the host ships the raw
    # int16 samples (encode = memcpy, no float quantization pass — on a
    # contended 1-core host the f32->i16 quantize alone was measured at
    # 4-77 ms/batch depending on host load) and the device does the one
    # exact /32768 dequant inside the step.
    example = (np.zeros((bs, 1, 2 * half), np.int16),
               {"eq": np.zeros((bs, 18), np.float32),
                "comp": np.zeros((bs, 6), np.float32),
                "reverb": np.zeros((bs, 25), np.float32),
                "g1": np.zeros((bs, 1, 1), np.float32),
                "g2": np.zeros((bs, 1, 1), np.float32)})
    packer = BatchPacker(example)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def train_step_pack(params, batch_stats, opt_state, key, buf):
        """Packed-wire streamed step: the whole batch arrives as ONE
        int16 buffer (one transfer op — robust to link congestion, see
        utils.pipeline.BatchPacker) and the PRNG key is CARRIED through
        the step, so the steady-state loop issues zero per-step host->
        device ops beyond the batch buffer itself (an eager per-step
        ``PRNGKey(i)`` is a device round trip on this tunnel)."""
        key, k_step = jax.random.split(key)
        x, rand = packer.decode(buf)
        x = x.astype(jnp.float32) / 32768.0  # exact PCM16 dequant
        out = _step_core(params, batch_stats, opt_state, x, rand, k_step)
        return out, key

    def source_pcm(wid):
        """Host PCM batch producer: int16 audio the way a wav dataset
        loader delivers it (uniform ±0.25 full-scale noise here; real
        training swaps in utils.audio.load_clip_batch)."""
        srng = np.random.default_rng(2000 + wid)
        while True:
            x = srng.integers(-8192, 8192, (bs, 1, 2 * half), dtype=np.int16)
            rand = {
                "eq": srng.uniform(0, 1, (bs, 18)).astype(np.float32),
                "comp": srng.uniform(0, 1, (bs, 6)).astype(np.float32),
                "reverb": srng.uniform(0, 1, (bs, 25)).astype(np.float32),
                "g1": srng.uniform(0, 24, (bs, 1, 1)).astype(np.float32),
                "g2": srng.uniform(0, 24, (bs, 1, 1)).astype(np.float32),
            }
            yield x, rand

    # Reservoir-streamed path: the host streams only FRESH fresh clips
    # per step; the batch is gathered from an R-clip device-resident ring
    # buffer (utils.pipeline.reservoir_put/_sample — the on-device
    # shuffle-buffer). Wire bytes drop bs/FRESH-fold, lifting the
    # link-bandwidth cap on the step rate; each clip trains ~bs/FRESH
    # times with independently redrawn corruption params (the reference
    # redraws params per step too, ref style_transfer.py:274-299, so no
    # training pair ever repeats). Corruption params are drawn ON DEVICE
    # from the carried key, exactly as the reference does on the GPU.
    from dasp_tpu.utils import reservoir_put, reservoir_sample

    FRESH = max(1, bs // 2)
    R_CLIPS = 8 * bs
    res_packer = BatchPacker(np.zeros((FRESH, 1, 2 * half), np.int16))

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5))
    def train_step_reservoir(params, batch_stats, opt_state, key, store, ptr, buf):
        fresh = res_packer.decode(buf)
        store, ptr = reservoir_put(store, fresh, ptr)
        key, k_idx, k_rand, k_step = jax.random.split(key, 4)
        x = reservoir_sample(store, k_idx, bs).astype(jnp.float32) / 32768.0
        ks = jax.random.split(k_rand, 5)
        rand = {
            "eq": jax.random.uniform(ks[0], (bs, 18)),
            "comp": jax.random.uniform(ks[1], (bs, 6)),
            "reverb": jax.random.uniform(ks[2], (bs, 25)),
            "g1": jax.random.uniform(ks[3], (bs, 1, 1), maxval=24.0),
            "g2": jax.random.uniform(ks[4], (bs, 1, 1), maxval=24.0),
        }
        out = _step_core(params, batch_stats, opt_state, x, rand, k_step)
        return out, key, store, ptr

    def source_reservoir(wid):
        """Host producer for the reservoir path: FRESH int16 clips/pull."""
        srng = np.random.default_rng(3000 + wid)
        while True:
            yield srng.integers(-8192, 8192, (FRESH, 1, 2 * half), dtype=np.int16)

    rng = np.random.default_rng(0)

    def make_inputs(i):
        x = jnp.asarray(rng.standard_normal((bs, 1, 2 * half)).astype(np.float32) * 0.25)
        rand = {
            "eq": jnp.asarray(rng.uniform(0, 1, (bs, 18)).astype(np.float32)),
            "comp": jnp.asarray(rng.uniform(0, 1, (bs, 6)).astype(np.float32)),
            "reverb": jnp.asarray(rng.uniform(0, 1, (bs, 25)).astype(np.float32)),
            "g1": jnp.asarray(rng.uniform(0, 24, (bs, 1, 1)).astype(np.float32)),
            "g2": jnp.asarray(rng.uniform(0, 24, (bs, 1, 1)).astype(np.float32)),
        }
        return x, rand, jax.random.PRNGKey(i)

    def source(wid):
        """Host batch producer (one per pipeline worker thread)."""
        srng = np.random.default_rng(1000 + wid)
        while True:
            x = (srng.standard_normal((bs, 1, 2 * half)).astype(np.float32) * 0.25)
            rand = {
                "eq": srng.uniform(0, 1, (bs, 18)).astype(np.float32),
                "comp": srng.uniform(0, 1, (bs, 6)).astype(np.float32),
                "reverb": srng.uniform(0, 1, (bs, 25)).astype(np.float32),
                "g1": srng.uniform(0, 24, (bs, 1, 1)).astype(np.float32),
                "g2": srng.uniform(0, 24, (bs, 1, 1)).astype(np.float32),
            }
            yield x, rand

    return dict(bs=bs, half=half, n_params=n_params,
                params=params, batch_stats=batch_stats, opt_state=opt_state,
                train_step=train_step, synth_train_step=synth_train_step,
                train_step_wire=train_step_wire,
                train_step_pack=train_step_pack, packer=packer,
                make_inputs=make_inputs, source=source,
                source_pcm=source_pcm,
                train_step_reservoir=train_step_reservoir,
                source_reservoir=source_reservoir, res_packer=res_packer,
                reservoir_clips=R_CLIPS, fresh_clips=FRESH)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50, help="timed steps")
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--length", type=int, default=262144)
    ap.add_argument("--smoke", action="store_true", help="tiny shapes, no baseline")
    ap.add_argument("--verify", action="store_true",
                    help="run the on-device verification gate instead of the "
                         "throughput bench (benchmarks/tpu_verify.py): exact "
                         "fast paths vs f64/exact references, streaming vs "
                         "offline, training-scale grads; writes "
                         "benchmarks/tpu_verify_report.json")
    ap.add_argument("--bf16", action="store_true", default=True,
                    help="bf16 encoder convolutions (MXU mixed precision; the "
                         "TPU-native default — fp32 params/statistics)")
    ap.add_argument("--f32", dest="bf16", action="store_false",
                    help="full fp32 encoder (reference-precision configuration)")
    ap.add_argument("--prefetch", type=int, default=8,
                    help="distinct batches staged on device for the throughput loop")
    ap.add_argument("--profile", type=str, default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the timed loop into DIR "
                         "(view with xprof/tensorboard; effects appear as "
                         "named_scope 'dasp.*' regions)")
    ap.add_argument("--eq-method", default="block",
                    choices=["fsm", "exact", "pallas", "block", "coupled"],
                    help="parametric EQ filter path inside the train step (block = "
                         "exact block-state MXU formulation, fastest; fsm = "
                         "reference-parity)")
    ap.add_argument("--comp-smoother", default="block",
                    choices=["fsm", "parallel", "attack_only", "pallas", "block",
                             "exact_pallas"],
                    help="compressor envelope smoother (block = exact one-pole via the "
                         "block-state formulation, fastest; fsm = reference-parity FFT "
                         "approximation)")
    args = ap.parse_args()

    if args.verify:
        # delegate before importing jax (the gate owns the device; this
        # process never initializes a second TPU client)
        rc = subprocess.call(
            [sys.executable, os.path.join(HERE, "benchmarks", "tpu_verify.py")])
        sys.exit(rc)

    import jax

    if args.smoke:
        args.batch_size, args.length = 2, 16384
    w = build_style_workload(args.batch_size, args.length, bf16=args.bf16,
                             eq_method=args.eq_method,
                             comp_smoother=args.comp_smoother, smoke=args.smoke)
    bs, half = w["bs"], w["half"]
    dev = jax.devices()[0]
    eprint(f"device: {dev.platform} ({dev.device_kind}); bs={bs}, half={half}")
    eprint(f"model: {w['n_params']/1e6:.2f}M params")
    params, batch_stats, opt_state = w["params"], w["batch_stats"], w["opt_state"]
    train_step, synth_train_step = w["train_step"], w["synth_train_step"]
    train_step_pack, packer = w["train_step_pack"], w["packer"]
    make_inputs, source = w["make_inputs"], w["source"]
    source_pcm = w["source_pcm"]

    eprint("compiling + warmup...")
    t0 = time.time()
    for i in range(args.warmup):
        x, rand, key = make_inputs(i)
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, x, rand, key)
    jax.block_until_ready(loss)
    eprint(f"warmup done in {time.time()-t0:.1f}s (loss {float(loss):.4f})")

    # --- primary: sustained throughput over pre-staged device batches -----
    # Batches are staged on the device and rotated; the param-donation chain
    # forces strictly sequential step execution, and we block on the full
    # final state after `steps` steps (loss visibly decreases across the
    # run, confirming real training). Host-streamed input (generation +
    # transfer through this harness's tunnel) is reported secondarily —
    # real deployments hide input transfer behind compute.
    staged = []
    for i in range(args.prefetch):
        x, rand, key = make_inputs(100 + i)
        staged.append((jax.device_put(x), jax.tree.map(jax.device_put, rand), key))
    jax.block_until_ready(staged[-1][0])

    if args.profile:
        jax.profiler.start_trace(args.profile)
    t0 = time.time()
    for i in range(args.steps):
        x, rand, key = staged[i % len(staged)]
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, x, rand, key)
    jax.block_until_ready((params, opt_state, loss))
    # value fetch as the true barrier: through the axon tunnel,
    # block_until_ready alone has returned before the dispatch chain
    # finished; float() must have the bytes, so it cannot early-complete
    final_loss = float(loss)
    if args.profile:
        jax.profiler.stop_trace()
        eprint(f"profiler trace written to {args.profile}")
    dt = (time.time() - t0) / args.steps
    steps_per_sec = 1.0 / dt
    eprint(f"device throughput: {steps_per_sec:.3f} steps/s ({dt*1e3:.2f} ms/step), "
           f"final loss {final_loss:.4f}")

    # --- MFU: model FLOPs per step (XLA cost analysis of the compiled
    # program) / measured step time / chip peak. The denominator is the
    # chip's bf16 matmul peak — conservative for this step, whose DSP
    # matmuls run fp32 (multi-pass on the MXU, so the hardware does MORE
    # work per logical FLOP than the ratio credits).
    _PEAK_BF16_TFLOPS = {
        # per-chip dense bf16 peaks (public TPU specs)
        "TPU v5 lite": 197.0, "TPU v5e": 197.0,
        "TPU v5": 459.0, "TPU v5p": 459.0,
        "TPU v4": 275.0, "TPU v6 lite": 918.0, "TPU v6e": 918.0,
    }
    flops_per_step = achieved_tflops = mfu = None
    try:
      with _phase_deadline(600, "cost analysis / MFU"):
        x, rand, key = staged[0]
        ca = train_step.lower(
            params, batch_stats, opt_state, x, rand, key).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops_per_step = float(ca.get("flops", 0.0)) or None
        if flops_per_step:
            achieved_tflops = flops_per_step / dt / 1e12
            peak = _PEAK_BF16_TFLOPS.get(dev.device_kind)
            mfu = achieved_tflops / peak if peak else None
            eprint(f"cost analysis: {flops_per_step/1e12:.3f} TFLOP/step -> "
                   f"{achieved_tflops:.1f} TFLOP/s achieved"
                   + (f", MFU {100*mfu:.1f}% of {peak:.0f} TFLOP/s bf16 peak"
                      if mfu is not None else ""))
    except Exception as e:
        eprint(f"WATCHDOG: cost-analysis phase abandoned ({e!r})")

    # The primary (headline) number is measured. Everything below is a
    # SECONDARY phase: each runs under a best-effort watchdog and a
    # phase that stalls or dies reports None instead of wedging the run
    # (the driver consumes the final JSON line unattended).
    synth_sps = feed_rate = streamed = res_streamed = None
    host_stats = {}

    # The secondary phases donate (params, batch_stats, opt_state) into
    # their jitted steps; a watchdog _PhaseTimeout that fires mid-call can
    # leave those names bound to already-donated (deleted) buffers, which
    # would cascade deleted-buffer errors through every later phase.
    # Snapshot the state once (never donated) and restore by copy in each
    # phase's failure handler.
    _copy_tree = jax.jit(lambda t: jax.tree.map(lambda a: a + 0, t))
    state_snap = None
    try:
      with _phase_deadline(300, "state snapshot"):
        state_snap = _copy_tree((params, batch_stats, opt_state))
        jax.block_until_ready(state_snap)
    except Exception as e:
        eprint(f"WATCHDOG: state snapshot skipped ({e!r})")

    def _restore_state():
        if state_snap is None:  # no snapshot: keep whatever is bound
            return params, batch_stats, opt_state
        return _copy_tree(state_snap)

    # --- secondary A: device-synthesis feeding (host-independent) ----------
    # The batch is generated on device inside the jitted step; the host
    # only ships a PRNG key per step. This is the production feeding mode
    # for synthetic/self-supervised corruption training — by construction
    # it cannot be host-bound.
    try:
      with _phase_deadline(900, "device-synthesis"):
        for i in range(2):
            params, batch_stats, opt_state, loss = synth_train_step(
                params, batch_stats, opt_state, jax.random.PRNGKey(200 + i))
        jax.block_until_ready(loss)
        n_s = args.steps
        t0 = time.time()
        for i in range(n_s):
            params, batch_stats, opt_state, loss = synth_train_step(
                params, batch_stats, opt_state, jax.random.PRNGKey(210 + i))
        jax.block_until_ready((params, loss))
        float(loss)  # value-fetch barrier (see the primary loop)
        synth_sps = n_s / (time.time() - t0)
        eprint(f"device-synthesis training: {synth_sps:.3f} steps/s "
               f"({100.0 * synth_sps / steps_per_sec:.0f}% of device-resident)")
    except Exception as e:
        eprint(f"WATCHDOG: device-synthesis phase abandoned ({e!r})")
        params, batch_stats, opt_state = _restore_state()

    # --- secondary B: host-streamed input pipeline -------------------------
    # N producer threads synthesize batches (N adapts to the host's cores
    # — a constant oversubscribes small hosts); device_prefetch
    # double-buffers async device_put (utils.pipeline — the reference's
    # DataLoader(num_workers=8) analogue). Per-stage costs are measured
    # and recorded so the achievable feed rate is explainable from the
    # host, not asserted.
    from dasp_tpu.utils import (device_prefetch, threaded_iterator,
                                wire_decode, wire_encode)

    nproc = os.cpu_count() or 1
    n_workers = max(1, min(8, nproc - 1))
    PREFETCH, DEPTH, UPLOAD_THREAD = 6, 3, False
    WIRE = packer
    n2 = min(args.steps, 32)
    warm2 = PREFETCH + DEPTH

    try:
      with _phase_deadline(900, "input-pipeline stages"):
        # per-stage: (1) one worker's synthesis time per batch
        gen_it = source(0)
        next(gen_it)  # warm allocators
        t0 = time.time()
        for _ in range(3):
            host_batch = next(gen_it)
        gen_s = (time.time() - t0) / 3
        # per-stage: (2) host->device transfer time / bandwidth, fp32 vs the
        # int16 wire (utils.pipeline.wire_encode — bit-exact for PCM16 data)
        batch_bytes = host_batch[0].nbytes + sum(v.nbytes for v in host_batch[1].values())
        jax.block_until_ready(jax.device_put(host_batch))  # warm transfer path
        t0 = time.time()
        for _ in range(3):
            jax.block_until_ready(jax.device_put(host_batch))
        put_s = (time.time() - t0) / 3
        enc_batch = wire_encode(host_batch, "i16")
        enc_bytes = sum(v.nbytes for v in jax.tree.leaves(enc_batch))
        jax.block_until_ready(jax.device_put(enc_batch))  # warm the i16 path too
        t0 = time.time()
        for _ in range(3):
            jax.block_until_ready(jax.device_put(enc_batch))
        put_i16_s = (time.time() - t0) / 3
        t0 = time.time()
        for _ in range(3):
            wire_encode(host_batch, "i16")
        enc_s = (time.time() - t0) / 3
        # conservative estimate: workers generate in parallel; transfers
        # taken fully serialized at the blocking per-put cost (the async
        # device_put path pipelines transfers, so the measured feed rate can
        # exceed this — the blocking measurement includes tunnel RTT)
        est = min(n_workers / gen_s, 1.0 / put_i16_s) if gen_s > 0 and put_i16_s > 0 else float("inf")
        eprint(f"pipeline stages (nproc={nproc}, workers={n_workers}): "
               f"generate {gen_s*1e3:.0f} ms/batch/worker, blocking device_put "
               f"fp32 {put_s*1e3:.0f} ms ({batch_bytes / put_s / 1e9:.3f} GB/s) / "
               f"i16 wire {put_i16_s*1e3:.0f} ms ({enc_bytes / put_i16_s / 1e9:.3f} GB/s, "
               f"encode {enc_s*1e3:.0f} ms) -> "
               f"serialized estimate ~{est:.2f} batches/s (async puts pipeline past it)")
        host_stats = {
            "nproc": nproc,
            "num_workers": n_workers,
            "generate_s_per_batch_per_worker": round(gen_s, 4),
            "device_put_s_per_batch_f32": round(put_s, 4),
            "device_put_s_per_batch_i16": round(put_i16_s, 4),
            "wire_encode_s_per_batch": round(enc_s, 4),
            "transfer_GB_per_s_f32": round(batch_bytes / put_s / 1e9, 3),
            "transfer_GB_per_s_i16": round(enc_bytes / put_i16_s / 1e9, 3),
            "batch_bytes_f32": batch_bytes,
            "batch_bytes_i16": enc_bytes,
            "serialized_feed_estimate_batches_per_sec": round(est, 3),
        }
    except Exception as e:
        eprint(f"WATCHDOG: input-pipeline stage measurement abandoned ({e!r})")

    # steady-state measurement: consume well past the buffer depth before
    # timing, so the rate reflects sustained production, not buffer drain.
    # The int16 wire halves bytes on the host->device link (bit-exact for
    # PCM16-sourced audio); DEPTH=3 keeps multiple puts in flight. Decode
    # happens INSIDE the consumer's jitted step (decode_on_yield=False) —
    # a separate per-batch decode dispatch serializes with the transfers
    # on this high-latency tunnel and halves the streamed rate. The
    # PACKED wire ships the whole batch as ONE int16 buffer (one
    # transfer op per step) and the step carries its own PRNG key — the
    # configuration that measured both fastest and robust to tunnel
    # congestion (benchmarks/stream_ab.py; the per-leaf i16 wire hit
    # 92.8% of resident in a quiet window but fell to 27% under
    # congestion, while raw bandwidth was unchanged — per-transfer-op
    # overhead is the congestion-sensitive term).
    try:
      with _phase_deadline(900, "input-pipeline feed rate"):
        pipe = device_prefetch(threaded_iterator(source_pcm, num_workers=n_workers, prefetch=PREFETCH),
                               size=DEPTH, wire=WIRE, decode_on_yield=False,
                               upload_thread=UPLOAD_THREAD)
        for _ in range(warm2):
            jax.block_until_ready(next(pipe))
        t0 = time.time()
        # block once on everything delivered: per-batch sync would add one
        # host<->device round trip per pull and measure RTT, not throughput
        delivered = [next(pipe) for _ in range(n2)]
        jax.block_until_ready(delivered)
        # value-fetch barrier on the last batch's smallest leaf (puts are
        # FIFO through the tunnel, so this bounds all earlier transfers)
        np.asarray(min(jax.tree.leaves(delivered[-1]), key=lambda a: a.size))
        feed_rate = n2 / (time.time() - t0)
        del delivered
        eprint(f"input pipeline alone: {feed_rate:.3f} batches/s "
               f"({'not ' if feed_rate < steps_per_sec else ''}able to feed "
               f"{steps_per_sec:.2f} steps/s compute; use device-synthesis mode "
               f"when the host is the bottleneck)")
    except Exception as e:
        eprint(f"WATCHDOG: input-pipeline feed-rate phase abandoned ({e!r})")

    try:
      with _phase_deadline(900, "host-streamed training"):
        pipe = device_prefetch(threaded_iterator(source_pcm, num_workers=n_workers, prefetch=PREFETCH),
                               size=DEPTH, wire=WIRE, decode_on_yield=False,
                               upload_thread=UPLOAD_THREAD)
        skey = jax.random.PRNGKey(290)
        for i in range(warm2):
            (params, batch_stats, opt_state, loss), skey = train_step_pack(
                params, batch_stats, opt_state, skey, next(pipe))
        jax.block_until_ready(loss)
        t0 = time.time()
        for i in range(n2):
            (params, batch_stats, opt_state, loss), skey = train_step_pack(
                params, batch_stats, opt_state, skey, next(pipe))
        jax.block_until_ready((params, loss))
        float(loss)  # value-fetch barrier (see the primary loop)
        streamed = n2 / (time.time() - t0)
        eprint(f"host-streamed training: {streamed:.3f} steps/s")
    except Exception as e:
        eprint(f"WATCHDOG: host-streamed phase abandoned ({e!r})")
        params, batch_stats, opt_state = _restore_state()

    # --- secondary C: reservoir-streamed training ---------------------------
    # Device-resident clip reservoir (utils.pipeline.reservoir_put/_sample):
    # only FRESH clips stream per step; the batch gathers from R resident
    # clips, so wire bytes/step shrink bs/FRESH-fold — the fix for
    # link-bandwidth-capped real-data training. Each clip is reused
    # ~bs/FRESH times with freshly drawn corruption params (never the
    # same training pair; the reference's own epochs reuse clips too).
    train_step_res = w["train_step_reservoir"]
    source_res = w["source_reservoir"]
    res_packer = w["res_packer"]
    R_CLIPS, FRESH = w["reservoir_clips"], w["fresh_clips"]
    try:
      with _phase_deadline(900, "reservoir-streamed training"):
        skey = jax.random.PRNGKey(291)
        rng0 = np.random.default_rng(4000)
        store = jax.device_put(
            rng0.integers(-8192, 8192, (R_CLIPS, 1, 2 * half), dtype=np.int16))
        ptr = jax.device_put(np.int32(0))
        pipe = device_prefetch(
            threaded_iterator(source_res, num_workers=n_workers, prefetch=PREFETCH),
            size=DEPTH, wire=res_packer, decode_on_yield=False,
            upload_thread=UPLOAD_THREAD)
        for i in range(warm2):
            (params, batch_stats, opt_state, loss), skey, store, ptr = train_step_res(
                params, batch_stats, opt_state, skey, store, ptr, next(pipe))
        jax.block_until_ready(loss)
        t0 = time.time()
        for i in range(n2):
            (params, batch_stats, opt_state, loss), skey, store, ptr = train_step_res(
                params, batch_stats, opt_state, skey, store, ptr, next(pipe))
        jax.block_until_ready((params, loss))
        float(loss)  # value-fetch barrier (see the primary loop)
        res_streamed = n2 / (time.time() - t0)
        del store
        eprint(f"reservoir-streamed training: {res_streamed:.3f} steps/s "
               f"({FRESH} fresh clips/step into {R_CLIPS} resident, "
               f"reuse ~{bs / FRESH:.0f}x, "
               f"{100.0 * res_streamed / steps_per_sec:.0f}% of device-resident)")
    except Exception as e:
        eprint(f"WATCHDOG: reservoir-streamed phase abandoned ({e!r})")
        params, batch_stats, opt_state = _restore_state()

    report = {
        "device_resident_steps_per_sec": round(steps_per_sec, 4),
        "device_synth_steps_per_sec": _round_or_none(synth_sps),
        "device_synth_pct_of_resident": _pct_or_none(synth_sps, steps_per_sec),
        "input_pipeline_batches_per_sec": _round_or_none(feed_rate),
        "host_streamed_steps_per_sec": _round_or_none(streamed),
        "reservoir_streamed_steps_per_sec": _round_or_none(res_streamed),
        "reservoir_streamed_pct_of_resident": _pct_or_none(
            res_streamed, steps_per_sec),
        "batch_size": bs, "clip_len": 2 * half,
        "host": host_stats,
        "pipeline": {"num_workers": n_workers, "prefetch": PREFETCH,
                     "device_prefetch": DEPTH,
                     "wire": "packed-pcm16 (BatchPacker, one transfer op/step, int16 PCM source)",
                     "upload_thread": UPLOAD_THREAD,
                     "reservoir": {"clips": R_CLIPS, "fresh_per_step": FRESH,
                                   "reuse_factor": round(bs / FRESH, 1),
                                   "wire_bytes_per_step": res_packer.nbytes}},
    }
    # never overwrite the reference-scale report with smoke numbers, nor a
    # complete prior report with a watchdog-degraded one (host_stats empty
    # means the per-stage phase was abandoned even if the rates survived)
    degraded = (not host_stats) or any(
        v is None for v in (synth_sps, feed_rate, streamed, res_streamed))
    if not args.smoke and not degraded:
        try:
            with open(os.path.join(HERE, "benchmarks", "input_pipeline_report.json"), "w") as f:
                json.dump(report, f, indent=1)
        except OSError:
            pass

    if args.smoke:
        vs = float("nan")
    else:
        ref_sps = get_reference_baseline(bs)
        vs = steps_per_sec / ref_sps if np.isfinite(ref_sps) else float("nan")
        eprint(f"reference (torch, this host CPU): {ref_sps:.5f} steps/s -> {vs:.1f}x")

    # Honest baselines, side by side (BASELINE.md): the same-host torch
    # number is directly measured but the host is a small CPU; the A100
    # numbers are the analytic speed-of-light (1.40 steps/s: every ref
    # FLOP at dense-TF32 peak, zero overhead) and realistic (0.50
    # steps/s) bounds for the reference on an A100-SXM-80GB.
    A100_SOL_STEPS = 1.40 * 8 / bs
    A100_REALISTIC_STEPS = 0.50 * 8 / bs
    print(json.dumps({
        "metric": "style_transfer_grad_steps_per_sec",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(vs, 2) if np.isfinite(vs) else None,
        "vs_a100_sol": (round(steps_per_sec / A100_SOL_STEPS, 2)
                        if not args.smoke else None),
        "vs_a100_realistic": (round(steps_per_sec / A100_REALISTIC_STEPS, 2)
                              if not args.smoke else None),
        "baseline_kinds": {
            "vs_baseline": "torch reference, same host (CPU), measured",
            "vs_a100_sol": "analytic A100 speed-of-light bound, BASELINE.md",
            "vs_a100_realistic": "analytic A100 realistic estimate, BASELINE.md",
        },
        "host_streamed_steps_per_sec": _round_or_none(streamed),
        "device_synth_steps_per_sec": _round_or_none(synth_sps),
        "host_streamed_pct_of_resident": _pct_or_none(streamed, steps_per_sec),
        "reservoir_streamed_steps_per_sec": _round_or_none(res_streamed),
        "reservoir_streamed_pct_of_resident": _pct_or_none(
            res_streamed, steps_per_sec),
        "flops_per_step": _round_or_none(flops_per_step, 0),
        "achieved_tflops": _round_or_none(achieved_tflops, 2),
        "mfu": _round_or_none(mfu, 4),
    }))


if __name__ == "__main__":
    # The remote-TPU tunnel occasionally drops a compile RPC mid-flight
    # (JaxRuntimeError: "response body closed before all bytes were
    # read"). The driver runs this script unattended at round end, so a
    # transient failure must not cost the whole benchmark: retry the run
    # a couple of times before surfacing the error.
    for _attempt in range(3):
        try:
            main()
            break
        except Exception as e:
            if _attempt == 2:
                raise
            eprint(f"bench attempt {_attempt + 1} failed ({e!r}); retrying in 30s")
            time.sleep(30)
