"""A/B the host-streamed input-pipeline configuration at reference scale.

The headline bench (bench.py) reports one streamed-training number with
the shipped configuration; this script compiles the SAME workload once
and sweeps pipeline variants (wire format, device prefetch depth,
dedicated upload thread) so configuration choices are set by
measurement, not guesswork. One table row per variant:

    python benchmarks/stream_ab.py [--steps 24] [--smoke]

Serialize with other TPU work — concurrent processes corrupt timings.
"""

import argparse
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from bench import build_style_workload, eprint  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import jax

    bs, length = (2, 16384) if args.smoke else (8, 262144)
    w = build_style_workload(bs, length, smoke=args.smoke)
    from dasp_tpu.utils import device_prefetch, threaded_iterator

    params, batch_stats, opt_state = w["params"], w["batch_stats"], w["opt_state"]
    step_wire, step = w["train_step_wire"], w["train_step"]
    step_pack, packer = w["train_step_pack"], w["packer"]
    make_inputs, source = w["make_inputs"], w["source"]
    source_pcm = w["source_pcm"]

    # compile + device-resident baseline
    for i in range(2):
        x, rand, key = make_inputs(i)
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state, x, rand, key)
    float(loss)
    staged = [make_inputs(100 + i) for i in range(4)]
    jax.block_until_ready(staged[-1][0])
    t0 = time.time()
    for i in range(args.steps):
        x, rand, key = staged[i % 4]
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state, x, rand, key)
    # Sync via a VALUE fetch: through the axon tunnel, block_until_ready
    # alone has returned before the dispatch chain finished (576 "steps/s"
    # at a 97 ms/step workload); float() must have the bytes, so it waits.
    float(loss)
    resident = args.steps / (time.time() - t0)
    eprint(f"{'device-resident':40s} {resident:7.3f} steps/s (100.0%)")

    n_workers = max(1, min(8, (os.cpu_count() or 1) - 1))
    variants = [
        # packed rows pull int16 PCM from source_pcm — the file-backed
        # data shape (encode = memcpy); the per-leaf rows pull float32
        # synthetic batches from source (encode = quantize per leaf)
        ("packed-pcm16 depth=3 consumer puts", dict(size=3, wire=packer, upload_thread=False)),
        ("packed-pcm16 depth=3 upload-thread", dict(size=3, wire=packer, upload_thread=True)),
        ("i16 depth=3 consumer-thread puts", dict(size=3, wire="i16", upload_thread=False)),
        ("i16 depth=3 upload-thread", dict(size=3, wire="i16", upload_thread=True)),
        ("f32 depth=3 upload-thread", dict(size=3, wire="f32", upload_thread=True)),
    ]
    results = {}
    for name, cfg in variants:
        src = source_pcm if cfg["wire"] is packer else source
        pipe = device_prefetch(
            threaded_iterator(src, num_workers=n_workers, prefetch=6),
            decode_on_yield=False, **cfg)
        packed = cfg["wire"] is packer
        use_wire = (not packed) and cfg["wire"] != "f32"
        warm = 6 + cfg["size"]
        skey = jax.random.PRNGKey(0)
        for i in range(warm):
            b = next(pipe)
            if packed:
                (params, batch_stats, opt_state, loss), skey = step_pack(
                    params, batch_stats, opt_state, skey, b)
            elif use_wire:
                params, batch_stats, opt_state, loss = step_wire(
                    params, batch_stats, opt_state, b, jax.random.PRNGKey(i))
            else:
                x, rand = b
                params, batch_stats, opt_state, loss = step(
                    params, batch_stats, opt_state, x, rand, jax.random.PRNGKey(i))
        float(loss)
        t0 = time.time()
        for i in range(args.steps):
            b = next(pipe)
            if packed:
                (params, batch_stats, opt_state, loss), skey = step_pack(
                    params, batch_stats, opt_state, skey, b)
            elif use_wire:
                params, batch_stats, opt_state, loss = step_wire(
                    params, batch_stats, opt_state, b, jax.random.PRNGKey(50 + i))
            else:
                x, rand = b
                params, batch_stats, opt_state, loss = step(
                    params, batch_stats, opt_state, x, rand, jax.random.PRNGKey(50 + i))
        float(loss)  # value fetch: see the resident-loop comment
        sps = args.steps / (time.time() - t0)
        results[name] = sps
        eprint(f"{name:40s} {sps:7.3f} steps/s ({100.0 * sps / resident:5.1f}%)")

    best = max(results, key=results.get)
    eprint(f"best: {best} ({results[best]:.3f} steps/s, "
           f"{100.0 * results[best] / resident:.1f}% of resident)")


if __name__ == "__main__":
    main()
