"""Profile the steady-state bench train step on the TPU and print a
device-time breakdown (top ops by total duration + category rollup).

Usage:  python experiments/profile_bench.py [--model clip|wrn|cnn32]
                                            [--logdir /tmp/eoe_prof]
(--model defaults to EOE_TPU_BENCH_MODEL, then "clip".) Writes the raw
jax.profiler trace under --logdir and prints the parsed summary used for
the roofline notes in PARITY.md.

Caveat: on long-lived tunneled-TPU sessions the server's op-level profiler
can degrade (the trace then shows "Steps" events but an empty "XLA Ops"
thread — "device busy 0.0ms"). A fresh tunnel/session restores it; the
epoch rates printed alongside stay valid either way.
"""

import argparse
import glob
import gzip
import json
import os.path as pt
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, pt.dirname(pt.dirname(pt.abspath(__file__))))


def run_profiled_epochs(steps: int, logdir: str, model: str = "clip"):
    import os
    import jax
    import jax.random as jrandom

    import bench
    from eoe_tpu.main import _enable_compile_cache
    from eoe_tpu.utils.logger import Logger
    from eoe_tpu.utils.profiling import profile

    # Cache discipline: the packed all-epochs index-plan shape is baked into
    # the epoch program, so profiling MUST run with the same epoch count (and
    # chunking) as the bench — otherwise every profile run recompiles the
    # model from scratch (~15-20 min for WRN@224) instead of hitting the
    # persistent cache the bench already populated.
    _enable_compile_cache()
    trainer, ds = bench.build_trainer(model, Logger("/tmp/eoe_tpu_prof_run", active=False))
    # full warmup run: compiles (or cache-loads) + reaches steady state
    trainer.train_cls(ds, 0, "warmup", 0, jrandom.key(0))
    with profile(logdir):
        trainer.train_cls(ds, 0, "profiled", 0, jrandom.key(0))
    print(f"steady-state epoch rates: {[round(r) for r in trainer.epoch_rates]}")


def parse_trace(logdir: str, topk: int = 25):
    traces = sorted(glob.glob(pt.join(logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    assert traces, f"no trace under {logdir}"
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]
    # device pids: process_name metadata containing 'TPU' but not transfers
    pid_names = {e["pid"]: e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n and "transfer" not in n.lower()}
    # within a device pid, threads are hierarchical ("XLA Modules" > "Steps" >
    # "XLA Ops"); only the op thread carries leaf per-op events — counting the
    # others double-counts every module/step span
    tid_names = {(e["pid"], e["tid"]): e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"
                 and "args" in e and "tid" in e}
    op_tids = {k for k, n in tid_names.items() if "XLA Ops" in n}
    if not op_tids:  # fallback: every device thread
        op_tids = {k for k in tid_names if k[0] in dev_pids}
    op_total = defaultdict(float)
    op_count = defaultdict(int)
    cats = defaultdict(float)
    cat_flops = defaultdict(float)
    cat_bytes = defaultdict(float)
    total = 0.0
    tmin, tmax = float("inf"), 0.0
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e
                and (e["pid"], e.get("tid")) in op_tids):
            name = e["name"]
            # control-flow wrappers (the whole-epoch scan's while) span their
            # children, which are ALSO emitted as leaf events — counting both
            # double-counts every op inside the epoch loop
            if name.startswith(("while", "conditional")):
                continue
            op_total[name] += e["dur"]
            op_count[name] += 1
            total += e["dur"]
            tmin = min(tmin, e["ts"])
            tmax = max(tmax, e["ts"] + e["dur"])
            # category accounting PER EVENT (same-named ops from different
            # XLA modules can differ, so no name-level arg caching)
            a = e.get("args", {})
            c = a.get("hlo_category", "?")
            if c == "convolution fusion":
                c = ("conv dW(+update) fusion"
                     if name.split(".")[0] == "multiply_add_fusion"
                     else "conv/GEMM fusion (fwd/dX + epilogues)")
            cats[c] += e["dur"]
            try:
                cat_flops[c] += float(a.get("model_flops", 0) or 0)
                cat_bytes[c] += float(a.get("raw_bytes_accessed", 0) or 0)
            except (TypeError, ValueError):
                pass
    span = tmax - tmin
    print(f"\ndevice busy {total / 1e3:.1f}ms over a {span / 1e3:.1f}ms span "
          f"({100 * total / max(span, 1):.0f}% busy)")
    print(f"{'op':64s} {'count':>5s} {'total_ms':>9s} {'%':>5s}")
    for name, dur in sorted(op_total.items(), key=lambda kv: -kv[1])[:topk]:
        print(f"{name[:64]:64s} {op_count[name]:5d} {dur / 1e3:9.2f} {100 * dur / total:5.1f}")

    # category rollup keyed by the profiler's own hlo_category (NOT op-name
    # heuristics: dW conv fusions are named multiply_add_fusion and bare-name
    # matching misfiled them as elementwise — the round-2/round-3 WRN
    # accounting discrepancy documented in PARITY.md), with achieved FLOP/s
    # and raw bandwidth from model_flops / raw_bytes_accessed. For fusion
    # categories the dW-vs-forward split is by the multiply_add_fusion prefix
    # (the fused-SGD dW emitters).
    if cats.get("?", 0.0) > 0.5 * max(total, 1):
        print("\nWARNING: most op events carry no hlo_category — the rollup "
              "below is unreliable (degraded profiler trace? see the module "
              "docstring's caveat); per-op durations above remain valid.")
    print("\ncategory rollup (hlo_category):")
    print(f"  {'category':38s} {'total_ms':>9s} {'%':>5s} {'TFLOP/s':>8s} {'GB/s':>6s}")
    for c, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
        fl = cat_flops[c] / (dur * 1e-6) / 1e12 if dur else 0.0
        bw = cat_bytes[c] / (dur * 1e-6) / 1e9 if dur else 0.0
        print(f"  {c:38s} {dur / 1e3:9.2f} {100 * dur / total:5.1f} {fl:8.1f} {bw:6.0f}")


if __name__ == "__main__":
    import os
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--model", type=str,
                    default=os.environ.get("EOE_TPU_BENCH_MODEL", "clip"))
    ap.add_argument("--logdir", type=str, default="/tmp/eoe_prof")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        run_profiled_epochs(args.steps, args.logdir, args.model)
    parse_trace(args.logdir)
