"""Count the collectives in the compiled dp x sp training step.

Round-4 review asked for proof that the sharded chain stays sp-resident
between stages (EQ -> compressor -> reverb) instead of resharding at
each boundary — on a virtual CPU mesh redundant reshards are invisible
in wall-clock, but on a real pod they are the difference between sp
scaling and sp thrashing. This script compiles the SAME dp x sp style-
transfer train step the multi-chip dryrun runs (tiny shapes; the
collective COUNT is shape-independent), walks the optimized HLO, and
attributes every collective op to the jax named_scope that emitted it
(the `dasp.*` effect scopes / loss / gradient psum).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarks/collectives_audit.py [--shape 4 2]

Writes benchmarks/collectives_report.json.
"""

import argparse
import json
import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COLLECTIVE_OPS = (
    "all-gather", "all-reduce", "reduce-scatter", "collective-permute",
    "all-to-all", "collective-broadcast",
)


def build_step(n_devices, shape):
    """The dryrun's dp x sp train step + example args (tiny shapes) —
    imported from __graft_entry__.build_dpsp_step so the audit counts
    the collectives of the SAME program the dryrun validates."""
    from __graft_entry__ import build_dpsp_step

    w = build_dpsp_step(n_devices, shape)
    return w["train_step"], w["args"]


def scope_of(meta_line: str) -> str:
    """Compress an HLO op_name metadata string to its leading dasp scope
    (or coarse phase) for attribution."""
    m = re.search(r'op_name="([^"]*)"', meta_line)
    if not m:
        return "(no metadata)"
    name = m.group(1)
    s = re.search(r"(dasp\.[A-Za-z0-9_.]+)", name)
    tag = s.group(1) if s else None
    transpose = "transpose" in name or "backward" in name
    if tag is None:
        for k, lab in (("multi_resolution", "loss"), ("stft", "loss"),
                       ("adam", "optimizer"), ("Encoder", "encoder"),
                       ("shard_map", "shard_map(unscoped)")):
            if k in name:
                tag = lab
                break
    if tag is None:
        tag = name.split("/")[-1][:40] or "(unnamed)"
    return f"{tag}{'[bwd]' if transpose else ''}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=2, default=(4, 2))
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "collectives_report.json"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    n = args.shape[0] * args.shape[1]
    assert len(jax.devices()) >= n, (
        f"need {n} devices; run with XLA_FLAGS=--xla_force_host_platform_"
        f"device_count={n}")

    step, call_args = build_step(n, tuple(args.shape))
    print("lowering + compiling the dp x sp train step...", flush=True)
    txt = jax.jit(step).lower(*call_args).compile().as_text()

    counts = Counter()
    by_scope = defaultdict(Counter)
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"[%\w.\-]*\s*=\s*\S+\s+(" + "|".join(COLLECTIVE_OPS) + r")[\(-]", ls)
        # HLO ops appear as e.g. `%ag = f32[...] all-gather(...)`;
        # match the op keyword right before its open-paren
        op = None
        for c in COLLECTIVE_OPS:
            if re.search(r"\b" + c + r"(-start|-done)?\(", ls):
                op = c
                break
        if op is None:
            continue
        if re.search(r"\b" + op + r"-done\(", ls):
            continue  # count start+done pairs once
        counts[op] += 1
        by_scope[scope_of(ls)][op] += 1

    total = sum(counts.values())
    print(f"total collectives in the compiled step: {total}")
    for op, c in counts.most_common():
        print(f"  {op:20s} {c}")
    print("\nby scope:")
    scope_rows = {}
    for scope, ops in sorted(by_scope.items(), key=lambda kv: -sum(kv[1].values())):
        scope_rows[scope] = dict(ops)
        print(f"  {scope:44s} {dict(ops)}")

    report = {
        "mesh_shape": {"dp": args.shape[0], "sp": args.shape[1]},
        "backend": jax.default_backend(),
        "total_collectives": total,
        "by_op": dict(counts),
        "by_scope": scope_rows,
        "note": ("compiled HLO of the dryrun-equivalent dp x sp style-transfer "
                 "train step (forward+backward+Adam); counts are static "
                 "program properties, independent of the tiny dryrun shapes"),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
