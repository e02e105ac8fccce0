"""Aggregate a jax.profiler perfetto trace into a per-op-category device
breakdown (the docs/BENCH.md "full-model decomposition" tables).

Usage: python tools/trace_breakdown.py /tmp/eng_trace_r4 [n_steps]
Finds plugins/profile/*/\*.trace.json.gz under the dir, keeps TensorCore
(device) complete events, groups durations by HLO-name category, and
prints totals plus per-step (default n_steps: the sum of all chained
steps traced -- pass the true count for per-step math).
"""
import collections
import glob
import gzip
import json
import os
import sys


def categorize(name: str) -> str:
    n = name.lower()
    if "palu_flash_decode" in n or "palu_decode" in n:
        return "v4 decode kernel"
    if "mlp_gemv" in n or "gemv_int8" in n:
        return "fused int8 MLP GEMV"
    if "append_token" in n or "cache_append" in n:
        return "fused append kernel"
    if "prefill_flash" in n:
        return "prefill flash kernel"
    if "fusion" in n or "multiply_reduce" in n or "dot" in n or "convert" in n:
        return "XLA fusions/GEMVs"
    if "dynamic-update-slice" in n or "dynamic_update_slice" in n:
        return "cache DUS writes"
    if "dynamic-slice" in n or "dynamic_slice" in n or "slice" in n:
        return "cache slice reads"
    if "select" in n:
        return "selects"
    if "copy" in n or "bitcast" in n or "reshape" in n or "transpose" in n:
        return "copies/reshapes"
    if "all-reduce" in n or "collective" in n:
        return "collectives"
    return "other"


def main():
    d = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    files = glob.glob(os.path.join(d, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        raise SystemExit(f"no .trace.json.gz under {d}")
    cats = collections.defaultdict(float)
    ops = collections.defaultdict(float)
    total = 0.0
    span_min, span_max = float("inf"), 0.0
    for f in files:
        data = json.load(gzip.open(f, "rt"))
        events = data.get("traceEvents", [])
        # device lanes: pid whose process_name mentions TPU/TensorCore
        dev_pids = set()
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                nm = e.get("args", {}).get("name", "")
                if "TPU" in nm or "TensorCore" in nm or "/device:" in nm:
                    dev_pids.add(e.get("pid"))
        for e in events:
            if e.get("ph") != "X" or e.get("pid") not in dev_pids:
                continue
            name = e.get("name", "")
            dur = float(e.get("dur", 0.0))
            ts = float(e.get("ts", 0.0))
            cats[categorize(name)] += dur
            ops[name.split(".")[0]] += dur
            total += dur
            span_min = min(span_min, ts)
            span_max = max(span_max, ts + dur)
    span = span_max - span_min if total else 0.0
    print(f"device op time total: {total/1e3:.2f} ms  wall span: "
          f"{span/1e3:.2f} ms  gaps: {(span-total)/1e3:.2f} ms")
    for c, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        line = f"  {c:26s} {us/1e3:10.2f} ms"
        if n_steps:
            line += f"  {us/n_steps:8.1f} us/step"
        print(line)
    print("top ops:")
    for name, us in sorted(ops.items(), key=lambda kv: -kv[1])[:12]:
        line = f"  {name[:70]:70s} {us/1e3:9.2f} ms"
        if n_steps:
            line += f"  {us/n_steps:8.1f} us/step"
        print(line)


if __name__ == "__main__":
    main()
