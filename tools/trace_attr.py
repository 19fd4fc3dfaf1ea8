"""Parse a jax.profiler trace dir and print per-kernel device time.

Usage: python tools/trace_attr.py DIR [top_n]
Sums durations of XLA ops on the device track from the perfetto-format
trace (plugins/profile/*/\*.trace.json.gz), grouped by (shortened) op
name, so kernel-level attribution (P1 tile kernel vs merge/fold/concat
vs coefficient fusions) comes from the profiler rather than slope
timing.  Divide by the number of traced iterations yourself.
"""

import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path


def load_events(trace_dir):
    paths = sorted(Path(trace_dir).glob("**/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace files under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    events = load_events(trace_dir)

    # Identify device-side process ids (TPU tracks are labeled like
    # "/device:TPU:0" or "TPU:0" in process_name metadata).
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "device" in name.lower():
                dev_pids.add(e["pid"])

    totals = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        totals[name] += e.get("dur", 0.0)
        counts[name] += 1

    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    total = sum(totals.values())
    print(f"{'us total':>12} {'n':>6}  name")
    for name, us in rows[:top_n]:
        print(f"{us:12.0f} {counts[name]:6d}  {name[:110]}")
    print(f"{total:12.0f}         TOTAL (all tracks summed)")


if __name__ == "__main__":
    main()
