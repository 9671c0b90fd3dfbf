"""Parse a jax.profiler trace into a per-op cost table.

Usage: python benchmarks/parse_trace.py /tmp/jax-trace [top_n]

Finds the newest .trace.json.gz under the log dir, aggregates complete
events on the device tracks (pid whose process name mentions TPU/device
XLA ops), and prints total/self duration per op name — the poor man's
TensorBoard for a tunneled chip.
"""
import collections
import glob
import gzip
import json
import os
import sys


def load_trace(log_dir):
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace under {log_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        return json.load(fh), path


def summarize(trace, top_n=30):
    events = trace["traceEvents"]
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            if e.get("name") == "thread_name":
                tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    device_pids = {pid for pid, name in pid_names.items()
                   if "TPU" in name or "/device" in name.lower()}

    total = collections.Counter()
    count = collections.Counter()
    tracks = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        # XLA op tracks; skip step/meta tracks
        if "step" in tname.lower():
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0)
        total[name] += dur
        count[name] += 1
        tracks[tname] += dur

    print("== tracks (us) ==")
    for t, d in tracks.most_common(12):
        print(f"{d:12.0f}  {t}")
    print(f"\n== top {top_n} ops by total us ==")
    for name, d in total.most_common(top_n):
        print(f"{d:10.0f} us  x{count[name]:<5d} {name[:120]}")


if __name__ == "__main__":
    log_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax-trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    trace, path = load_trace(log_dir)
    print(f"trace: {path}")
    summarize(trace, top_n)
