"""Summarize a jax.profiler trace (Perfetto JSON) by op attribution.

    python bench.py --profile /tmp/prof --steps 10
    python benchmarks/analyze_trace.py /tmp/prof

Aggregates device op durations from the "XLA Ops" thread of the TPU
process track (the step/module threads mirror the same time and must
NOT be counted again), grouping by the framework attribution in each
op's `tf_op` arg — which carries the `dasp.*` named_scope prefixes the
effects emit and the jvp/transpose(jvp(...)) autodiff context — so the
next bottleneck in a training step is visible without opening xprof.
"""

import collections
import glob
import gzip
import json
import sys


def load_events(trace_dir):
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    path = max(paths)  # latest capture
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return path, data.get("traceEvents", [])


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof"
    path, events = load_events(trace_dir)

    # find the device process and its "XLA Ops" thread: per-op complete
    # events live there; tid "Steps"/"XLA Modules" hold one event per step
    # covering the same wall time (double counting if included)
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tid_names[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")

    device_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    op_tracks = {k for k, n in tid_names.items() if n == "XLA Ops" and k[0] in device_pids}
    step_tracks = {k for k, n in tid_names.items() if n == "Steps" and k[0] in device_pids}

    n_steps = sum(
        1 for e in events
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in step_tracks
    )

    buckets = collections.Counter()
    examples = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if (e.get("pid"), e.get("tid")) not in op_tracks:
            continue
        name = e.get("name", "")
        args = e.get("args", {}) or {}
        tf_op = args.get("tf_op", "")
        key = None
        for part in tf_op.split("/"):
            if "dasp." in part:
                key = part
                break
        if key is None and tf_op:
            key = "/".join(tf_op.split("/")[:2])
        if key is None:
            key = f"[{args.get('hlo_category', 'unattributed')}]"
        dur = e["dur"] / 1e3  # us -> ms
        buckets[key] += dur
        total += dur
        if key not in examples:
            examples[key] = name[:60]

    print(f"trace: {path}")
    print(f"{'bucket':52s} {'ms':>9s} {'%':>6s}  example op")
    for key, ms in buckets.most_common(30):
        print(f"{key:52s} {ms:9.2f} {100*ms/total:6.1f}  {examples[key]}")
    line = f"{'TOTAL (device op-ms over capture)':52s} {total:9.2f}"
    if n_steps:
        line += f"   = {total/n_steps:.2f} ms/step over {n_steps} steps"
    print(line)


if __name__ == "__main__":
    main()
