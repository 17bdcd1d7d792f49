"""Summarize a jax.profiler trace (Perfetto JSON) by op category.

    python bench.py --profile /tmp/prof --steps 10
    python benchmarks/analyze_trace.py /tmp/prof

Aggregates XLA op durations on the device track, grouping by the
`dasp.*` named_scope prefixes the effects emit (plus fusion/conv/fft
buckets), so the next bottleneck in the training step is visible
without opening xprof.
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

    # device-side complete events: pid/tid tracks named like "/device:TPU:0"
    # in trace viewer; fall back to all 'X' events with args.long_name
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")

    device_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}

    buckets = collections.Counter()
    examples = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        args = e.get("args", {}) or {}
        scope = args.get("name", "") or args.get("long_name", "") or name
        # bucket by dasp named_scope if present, else by op family
        key = None
        for part in scope.split("/"):
            if part.startswith("dasp."):
                key = part
                break
        if key is None:
            low = name.lower()
            for fam in ("fft", "conv", "dot", "custom-call", "fusion", "copy",
                        "all-gather", "all-reduce", "reduce", "scan", "while"):
                if fam in low:
                    key = f"[{fam}]"
                    break
            else:
                key = "[other]"
        dur = e["dur"] / 1e3  # us -> ms
        buckets[key] += dur
        total += dur
        if key not in examples:
            examples[key] = name[:70]

    print(f"trace: {path}")
    print(f"{'bucket':34s} {'ms':>10s} {'%':>6s}  example op")
    for key, ms in buckets.most_common(25):
        print(f"{key:34s} {ms:10.2f} {100*ms/total:6.1f}  {examples[key]}")
    print(f"{'TOTAL (device op-ms over capture)':34s} {total:10.2f}")


if __name__ == "__main__":
    main()
