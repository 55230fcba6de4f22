"""Summarize a jax.profiler trace: per-op device time for one step.

Usage: python scripts/trace_summary.py <trace_dir|vm.trace.json.gz> [top_n]

Reads the chrome-trace JSON that ``jax.profiler.trace`` writes (the
GSCREAM_TRACE hook, utils/trace.py), aggregates TPU-device event
durations by op name over the whole capture, and prints the top ops
with their per-iteration cost (total / #occurrences of the top-level
jit step, inferred from the most-repeated long op).  This replaces
wall-clock-subtraction attribution (VERDICT r3 item 7).
"""
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def find_trace_json(path):
    if os.path.isfile(path):
        return path
    hits = []
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".trace.json.gz") or f.endswith(".trace.json"):
                hits.append(os.path.join(root, f))
    if not hits:
        raise SystemExit(f"no .trace.json(.gz) under {path}")
    return max(hits, key=os.path.getmtime)


def load_events(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def device_pids(events):
    """pids whose process name looks like a TPU/device core (not host)."""
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e.get("args", {}).get("name", "")
    dev = {p for p, n in names.items()
           if re.search(r"TPU|/device:|Chip|Core", n, re.I)
           and not re.search(r"host", n, re.I)}
    return dev or set(names)


def main():
    path = find_trace_json(sys.argv[1] if len(sys.argv) > 1 else ".")
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    events = load_events(path)
    dev = device_pids(events)
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        name = e.get("name", "")
        # skip trace-viewer grouping rows
        if name.startswith(("XLA Modules", "Steps", "XLA Ops ")):
            continue
        tot[name] += e.get("dur", 0.0)
        cnt[name] += 1
    if not tot:
        raise SystemExit("no device events found")
    # infer #iterations: the op names carry fusion ids; the modal count
    # of the 20 most expensive ops is the per-capture repetition
    top = sorted(tot.items(), key=lambda kv: -kv[1])
    counts = [cnt[k] for k, _ in top[:20]]
    iters = max(1, sorted(counts)[len(counts) // 2])
    total_us = sum(tot.values())
    print(f"# {path}")
    print(f"# device total {total_us / 1e3:.1f} ms over capture, "
          f"inferred iters={iters} -> {total_us / iters / 1e3:.2f} "
          f"ms/iter\n")
    print(f"{'ms/iter':>8}  {'count':>5}  op")
    for name, us in top[:top_n]:
        print(f"{us / iters / 1e3:8.3f}  {cnt[name]:5d}  {name[:110]}")
    rest = sum(us for _, us in top[top_n:])
    print(f"{rest / iters / 1e3:8.3f}  {'':5}  (+{len(top) - top_n} more)")


if __name__ == "__main__":
    main()
