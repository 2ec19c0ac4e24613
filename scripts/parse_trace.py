"""Summarizes a jax.profiler perfetto trace: top device ops by total time.

Usage:
  python scripts/parse_trace.py /tmp/tpu_cfd_trace_b128
Finds the newest trace.json.gz under the directory and prints per-op-name
aggregate durations, longest first — enough to see where a solver step's
milliseconds go without TensorBoard.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys


def find_trace(root: str) -> str:
    paths = glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                      recursive=True)
    paths += glob.glob(os.path.join(root, "**", "trace.json.gz"),
                       recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {root}")
    return max(paths, key=os.path.getmtime)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_cfd_trace"
    path = find_trace(root)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # pid/tid -> thread name, to separate device streams from host threads
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[(e.get("pid"), None)] = e["args"].get("name", "")

    per_op = collections.Counter()
    per_op_n = collections.Counter()
    lanes = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        dur = e.get("dur", 0)  # microseconds
        lane = names.get((e.get("pid"), e.get("tid")), "") or names.get(
            (e.get("pid"), None), ""
        )
        lanes[lane] += dur
        # device lanes on TPU traces are usually named like "/device:TPU:0"
        # or "TensorFlow Op"; keep everything, let the lane column explain
        key = (lane, e.get("name", "?"))
        per_op[key] += dur
        per_op_n[key] += 1

    print(f"trace: {path}\n")
    print("== total time per lane (ms) ==")
    for lane, dur in lanes.most_common(12):
        print(f"{dur/1e3:10.3f}  {lane}")
    print("\n== top ops by total duration (ms) ==")
    for (lane, op), dur in per_op.most_common(40):
        n = per_op_n[(lane, op)]
        print(f"{dur/1e3:10.3f}  x{n:<5d} [{lane[:28]:28s}] {op[:90]}")


if __name__ == "__main__":
    main()
