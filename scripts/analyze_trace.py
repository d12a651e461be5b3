"""Aggregate a jax.profiler Chrome-trace (vm.trace.json.gz) into an op table.

The round-4 verdict required trace-derived attribution of the production
CycleGAN step instead of XLA cost-model estimates (VERDICT r4 #2). The
axon relay DOES export a real device trace (process '/device:TPU:0',
thread 'XLA Ops'), captured by scripts/perf_r5_step.py ARMS=trace around
one 32-step scan execution.

Usage: python scripts/analyze_trace.py <vm.trace.json.gz> [n_steps]
Prints total device-busy time, per-category and per-op-family tables
(durations divided by n_steps, default 32).
"""

import gzip
import json
import re
import sys
from collections import defaultdict


def classify(name: str) -> str:
    """Coarse family for an XLA/Mosaic op name."""
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "mosaic" in n:
        return "pallas custom-call"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion"
    if "convolution" in n or "conv" in n:
        return "convolution"
    if "dot" in n:
        return "dot"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/transpose"
    if "dynamic-slice" in n or "slice" in n or "dynamic-update" in n:
        return "slice/update"
    if "reduce" in n:
        return "reduce"
    if "rng" in n or "threefry" in n:
        return "rng"
    if "all-reduce" in n or "collective" in n:
        return "collective"
    return "other"


def main():
    path = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    with gzip.open(path) as f:
        t = json.load(f)
    ev = t["traceEvents"]

    # pid/tid of the device "XLA Ops" lanes
    pid_dev = None
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name" and \
                e["args"].get("name", "").startswith("/device:TPU"):
            pid_dev = e["pid"]
    tids_ops = set()
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name" and \
                e.get("pid") == pid_dev and e["args"].get("name") in (
                    "XLA Ops",):
            tids_ops.add(e["tid"])

    ops = [e for e in ev
           if e.get("ph") == "X" and e.get("pid") == pid_dev
           and e.get("tid") in tids_ops]
    if not ops:
        print("no device XLA Ops found"); return
    t0 = min(e["ts"] for e in ops)
    t1 = max(e["ts"] + e.get("dur", 0) for e in ops)

    # SELF time: events nest (the scan's `while` wraps the whole program;
    # Mosaic emits per-kernel `block_` containers) — walk each thread's
    # events as a properly nested interval tree and subtract child spans.
    self_us = defaultdict(float)
    counts = defaultdict(int)
    for tid in tids_ops:
        lane = sorted((e for e in ops if e["tid"] == tid),
                      key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (end_ts, event, child_total)
        for e in lane:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and ts >= stack[-1][0]:
                end, pe, ch = stack.pop()
                self_us[pe["name"]] += pe.get("dur", 0) - ch
                counts[pe["name"]] += 1
                if stack:
                    stack[-1][2] += pe.get("dur", 0)
            if stack:
                pass  # child begins inside parent
            stack.append([ts + dur, e, 0.0])
        while stack:
            end, pe, ch = stack.pop()
            self_us[pe["name"]] += pe.get("dur", 0) - ch
            counts[pe["name"]] += 1
            if stack:
                stack[-1][2] += pe.get("dur", 0)

    busy = sum(self_us.values())
    print(f"{len(ops)} device ops; span {(t1 - t0)/1e3:.1f} ms, "
          f"self-busy {busy/1e3:.1f} ms "
          f"({busy/(t1-t0)*100:.1f}% occupancy), "
          f"{(t1 - t0)/1e3/n_steps:.2f} ms/step span, "
          f"{busy/1e3/n_steps:.2f} ms/step self-busy")

    by_cat = defaultdict(float)
    by_op = defaultdict(lambda: [0.0, 0])
    for name, d in self_us.items():
        by_cat[classify(name)] += d
        # family: strip trailing .N / digits so repeated scan bodies merge
        fam = re.sub(r"[.\d]+$", "", name)
        by_op[fam][0] += d
        by_op[fam][1] += counts[name]

    print("\nper-category (ms/step):")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {k:22s} {v/1e3/n_steps:7.2f}  ({v/busy*100:4.1f}%)")

    print("\ntop-30 op families (ms/step):")
    for k, (v, c) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:30]:
        print(f"  {v/1e3/n_steps:7.3f}  n={c:5d}  {k[:90]}")


if __name__ == "__main__":
    main()
