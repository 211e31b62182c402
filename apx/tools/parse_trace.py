"""Summarize a jax.profiler trace into a per-op device-time table.

`bench.py --profile DIR` captures a trace; this tool turns its chrome
JSON into the table that drove the round-3 optimization work (the
LOCKSTEP cond copies, the issue-bound glimpse, the autoreset map-gather
— each was found by reading exactly this output; PERF.md).

Usage:
    python -m apx.tools.parse_trace DIR_OR_TRACE_JSON_GZ [--top N]
    python -m apx.tools.parse_trace /tmp/apx_trace --all-processes

Device-only is the default; --all-processes adds the host/python rows.

Works on any device's trace (the TPU relay included): device ops live
under the process named like "/device:TPU:0"; host rows are the python
stack. Durations are summed per op name with occurrence counts so
per-step costs read off directly (divide by the step count).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def load_trace(path: str) -> dict:
    """path: a trace .json(.gz) file OR a profile dir (picks the newest)."""
    if os.path.isdir(path):
        cands = sorted(
            glob.glob(os.path.join(path, "plugins/profile/*/*.trace.json.gz"))
            + glob.glob(os.path.join(path, "*.trace.json.gz"))
        )
        if not cands:
            raise FileNotFoundError(f"no trace.json.gz under {path}")
        path = cands[-1]
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return json.load(f)


def summarize(trace: dict, device_only: bool = True):
    """Returns [(process, op_name, total_us, count)] sorted by time desc."""
    events = trace.get("traceEvents", [])
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", str(e["pid"]))
    tot: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        proc = proc_names.get(e["pid"], str(e["pid"]))
        if device_only and "/device:" not in proc:
            continue
        key = (proc, e.get("name", "?"))
        tot[key] += e.get("dur", 0)
        cnt[key] += 1
    return [
        (proc, name, us, cnt[(proc, name)])
        for (proc, name), us in tot.most_common()
    ]


def device_busy_us(trace: dict) -> float:
    """Total device-busy microseconds in the trace: the summed span durations
    of the device process's "XLA Modules" lane. The "XLA Ops" lane NESTS
    (while/conditional ops span their children in the same lane), so summing
    it double-counts every loop body; module executions are disjoint
    top-level spans, and on TPU the device is busy for a module's whole span
    (in-module bubbles are stalls, not idle). Fallback when no lane is named
    like "modules": the smallest nonzero lane sum (nesting only inflates).
    Feeds bench.py's device_busy_us_per_step roofline field."""
    events = trace.get("traceEvents", [])
    proc_names: dict = {}
    thread_names: dict = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", str(e["pid"]))
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    lanes: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        if "/device:" not in proc_names.get(e["pid"], str(e["pid"])):
            continue
        lanes[(e["pid"], e.get("tid"))] += e.get("dur", 0)
    if not lanes:
        raise ValueError("no device lanes in trace")
    module_lanes = {
        k: v
        for k, v in lanes.items()
        if "module" in thread_names.get(k, "").lower()
    }
    if module_lanes:
        return float(max(module_lanes.values()))
    return float(min(v for v in lanes.values() if v > 0))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("path", help="profile dir or trace.json(.gz)")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument(
        "--all-processes", action="store_true",
        help="include host rows (default: device ops only)",
    )
    args = ap.parse_args(argv)
    rows = summarize(load_trace(args.path), device_only=not args.all_processes)
    print(f"{'total ms':>10}  {'count':>7}  process / op")
    for proc, name, us, n in rows[: args.top]:
        print(f"{us/1e3:10.2f}  {n:7d}  {proc}  {name[:90]}")


if __name__ == "__main__":
    main()
