"""Summarize a jax.profiler trace without xprof (protobuf clash on this box).

Reads the newest ``*.trace.json.gz`` under PROFILE_DIR (default
/tmp/ldmseg_profile), aggregates TPU-lane event durations by op name, and
prints the top categories — the empirical input for kernel work
(BENCHMARKS.md). Usage:

    python tools/analyze_trace.py [trace_dir] [top_n]
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def load_events(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return path, data


def tpu_pid_names(data):
    """pid -> process name from trace metadata."""
    names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            names[ev["pid"]] = ev.get("args", {}).get("name", "")
    return names


_STRIP = re.compile(r"[.\-]\d+$")


def canon(name: str) -> str:
    """fusion.123 -> fusion; %convolution.42 -> convolution."""
    name = name.split("%")[-1]
    base = _STRIP.sub("", name)
    return base


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "PROFILE_DIR", "/tmp/ldmseg_profile")
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    path, data = load_events(trace_dir)
    pid_names = tpu_pid_names(data)
    device_pids = {
        pid for pid, n in pid_names.items()
        if "TPU" in n or "/device" in n.lower()
    }

    by_name = defaultdict(float)
    by_exact = defaultdict(float)
    total = 0.0
    n_events = 0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        # XLA op lanes carry 'args' with long_name/hlo info; thread name
        # filtering is loose on purpose — dominated by op events anyway
        dur = ev["dur"]
        name = ev.get("name", "?")
        by_name[canon(name)] += dur
        by_exact[name] += dur
        total += dur
        n_events += 1

    print(f"trace: {path}")
    print(f"{n_events} events, {total / 1e6:.3f}s total device-lane time")
    print(f"\n-- top {top_n} by canonical op name --")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{dur / 1e6:9.4f}s  {100 * dur / max(total, 1e-9):5.1f}%  {name}")
    print(f"\n-- top {top_n} exact ops --")
    for name, dur in sorted(by_exact.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{dur / 1e6:9.4f}s  {100 * dur / max(total, 1e-9):5.1f}%  {name}")


if __name__ == "__main__":
    main()
