"""Format `bench.py --all` output into the versioned per-family matrix
artifact (VERDICT r4 missing #3): BENCH_MATRIX.json at the repo root,
one record per family, with the exact command and geometry recorded so
every fps claim in the docs traces to a run.

Usage:
    python bench.py --all > /tmp/bench_all.log 2>&1
    python scripts/bench_matrix.py /tmp/bench_all.log
"""

import json
import re
import sys
import time


def main(log_path: str, out: str = "BENCH_MATRIX.json"):
    recs = []
    for line in open(log_path):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if rec.get("unit") == "frames/sec":
            recs.append(rec)
    if not recs:
        raise SystemExit(f"no bench records in {log_path}")
    doc = {
        "command": "python bench.py --all",
        "date": time.strftime("%Y-%m-%d"),
        "geometry": "LR 180x320 -> HR 720x1280 (x4), bf16, one v5e chip",
        "results": recs,
    }
    with open(out, "wt") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out}:")
    for r in recs:
        m = re.search(r"\((\w+) ", r["metric"])
        print(f"  {m.group(1) if m else '?':10s} {r.get('value')} fps"
              f"  (vs_baseline {r.get('vs_baseline')})"
              + (f"  ERROR {r['error']}" if "error" in r else ""))


if __name__ == "__main__":
    if not 2 <= len(sys.argv) <= 3:
        raise SystemExit(
            "usage: bench_matrix.py <bench_all.log> [out.json]")
    main(*sys.argv[1:])
