"""Summarize a jax.profiler trace directory: device time by op category.

Usage: python tools/trace_summary.py /tmp/train_trace [top_n=25]

Reads the .trace.json.gz files jax.profiler.trace writes (Chrome trace
format), keeps device-lane complete events, and aggregates wall time by
event name — enough to answer "what fraction of the train step is decoder
attention / encoder GEMMs / optimizer", without Perfetto.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys


def load_events(trace_dir: str):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no .trace.json.gz under {trace_dir}")
    events, pid_names = [], {}
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            ph = ev.get("ph")
            if ph == "M" and ev.get("name") == "process_name":
                pid_names[ev.get("pid")] = ev.get("args", {}).get("name", "")
            elif ph == "X":
                events.append(ev)
    return events, pid_names


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    events, pid_names = load_events(trace_dir)

    # device lanes: the TPU/accelerator processes (not python/runtime threads)
    dev_pids = {pid for pid, name in pid_names.items()
                if any(s in name.lower() for s in ("tpu", "device", "xla"))
                and "python" not in name.lower()}
    by_name = collections.Counter()
    total = 0.0
    for ev in events:
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        dur = float(ev.get("dur", 0.0))
        if dur <= 0:
            continue
        by_name[ev.get("name", "?")] += dur
        total += dur
    if not by_name:
        raise SystemExit("no complete events found on device lanes "
                         f"(pids seen: {pid_names})")

    print(f"{len(events)} events, device total {total / 1e3:.2f} ms "
          f"(lanes: {sorted(pid_names.get(p, str(p)) for p in dev_pids) or 'all'})")
    for name, dur in by_name.most_common(top_n):
        print(f"{dur / 1e3:10.2f} ms  {100 * dur / total:5.1f}%  {name[:100]}")


if __name__ == "__main__":
    main()
