"""Summarize the tpu_queue_r3 A/B log into one table.

Parses every bench JSON line out of /tmp/tpu_r3.log (or argv[1]),
labels it with the env flags echoed by the queue script's `set -x`
context if present, and prints ms/rays/vs_baseline sorted by speed.
"""
import json
import re
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_r3.log"
    rows = []
    label = "default"
    for line in open(path, errors="replace"):
        m = re.search(r"(GSCREAM_\w+=\S+)", line)
        if m and "python bench.py" in line:
            label = m.group(1)
        if line.startswith("{") and "rays_per_s" in line:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            rows.append((label, rec))
            label = "default"
    rows.sort(key=lambda r: r[1].get("iter_ms") or 1e9)
    print(f"{'config':34s} {'ms':>8s} {'Mrays/s':>9s} {'vs_base':>8s} "
          f"{'inst':>9s} {'cap':>9s}")
    for lab, r in rows:
        if r.get("value") is None:
            print(f"{lab:34s} {'—':>8s}  status={r.get('status')}")
            continue
        print(f"{lab:34s} {r.get('iter_ms', 0):8.1f} "
              f"{r['value'] / 1e6:9.2f} {r.get('vs_baseline', 0):8.3f} "
              f"{r.get('instances', 0):9d} {r.get('capacity', 0):9d}")


if __name__ == "__main__":
    main()
