"""Itemize the CLIP train step's layout copies (VERDICT r3 item 6).

PARITY.md's round-3 rollup leaves ~3.5ms/step of `copy`-category device time
unattributed in the 55.9ms CLIP step. This script attributes it per copy:

1. re-runs the profiled bench epoch (same shapes as bench.py so the
   persistent compile cache hits) with an XLA HLO text dump enabled,
2. parses the trace's "XLA Ops" thread for events whose hlo_category is
   copy-like (copy / transpose / bitcast / all-reduce excluded), and
3. greps each trace op name in the dumped optimized HLO to recover the
   exact instruction: result shape+layout, operand shape+layout, and the
   producer/consumer ops around it.

Usage:
  python experiments/copy_study.py            # profile + parse + attribute
  python experiments/copy_study.py --parse-only --logdir /tmp/eoe_copy_prof
"""

import argparse
import glob
import gzip
import json
import os
import os.path as pt
import re
import sys
from collections import defaultdict

sys.path.insert(0, pt.dirname(pt.dirname(pt.abspath(__file__))))

HLO_DUMP = "/tmp/eoe_copy_hlo"


def run(logdir: str, model: str = "clip"):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_dump_to={HLO_DUMP}"
                               + " --xla_dump_hlo_as_text").strip()
    # --xla_dump_to only captures LOCALLY-compiled modules; tunneled chips
    # compile on the remote PJRT server, so the trainer additionally writes
    # the compiled epoch program via compile().as_text() (attribute() prefers
    # this file — module-local op names like copy.888 collide across modules)
    os.makedirs(HLO_DUMP, exist_ok=True)
    os.environ["EOE_TPU_DUMP_EPOCH_HLO"] = pt.join(
        HLO_DUMP, "zz_epoch.after_optimizations.txt")
    import jax.random as jrandom

    import bench
    from eoe_tpu.main import _enable_compile_cache
    from eoe_tpu.utils.logger import Logger
    from eoe_tpu.utils.profiling import profile

    _enable_compile_cache()
    trainer, ds = bench.build_trainer(
        model, Logger("/tmp/eoe_tpu_copy_run", active=False))
    trainer.train_cls(ds, 0, "warmup", 0, jrandom.key(0))
    with profile(logdir):
        trainer.train_cls(ds, 0, "profiled", 0, jrandom.key(0))
    print(f"epoch rates: {[round(r) for r in trainer.epoch_rates]}")


def _load_trace(logdir: str):
    traces = sorted(glob.glob(
        pt.join(logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    assert traces, f"no trace under {logdir}"
    with gzip.open(traces[-1]) as f:
        return json.load(f)["traceEvents"]


def copy_events(logdir: str):
    """(name -> [total_us, count, args]) for copy-category leaf ops."""
    events = _load_trace(logdir)
    pid_names = {e["pid"]: e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n and "transfer" not in n.lower()}
    tid_names = {(e["pid"], e["tid"]): e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"
                 and "args" in e and "tid" in e}
    op_tids = {k for k, n in tid_names.items() if "XLA Ops" in n}
    out = defaultdict(lambda: [0.0, 0, {}])
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e
                and (e["pid"], e.get("tid")) in op_tids):
            name = e["name"]
            if name.startswith(("while", "conditional")):
                continue
            a = e.get("args", {})
            cat = a.get("hlo_category", "")
            base = name.split(".")[0]
            if cat == "copy" or base in ("copy", "transpose", "bitcast",
                                         "copy_fusion"):
                rec = out[name]
                rec[0] += e["dur"]
                rec[1] += 1
                rec[2] = a
    return out


def count_steps(logdir: str) -> int:
    """Per-step normalization from the trace itself: scan-body fusions repeat
    once per step, so the MODE of the per-name repeat counts over device
    fusion events is the step count (robust against the handful of
    once-per-dispatch prologue/epilogue ops). Returns 0 when undeterminable
    (caller falls back to --steps)."""
    events = _load_trace(logdir)
    pid_names = {e["pid"]: e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n and "transfer" not in n.lower()}
    counts = defaultdict(int)
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e
                and e.get("name", "").split(".")[0] == "fusion"):
            counts[e["name"]] += 1
    if not counts:
        return 0
    freq = defaultdict(int)
    for c in counts.values():
        freq[c] += 1
    return max(freq.items(), key=lambda kv: (kv[1], kv[0]))[0]


def attribute(names, hlo_dump=HLO_DUMP):
    """name -> matching HLO instruction line(s) from the optimized dump.
    The trainer-written epoch module (zz_epoch...) is searched FIRST: op
    names are module-local, so a copy.N from another dumped module would
    attribute the wrong instruction."""
    files = sorted(glob.glob(pt.join(hlo_dump, "*after_optimizations.txt")),
                   key=lambda f: (0 if "zz_epoch" in f else 1, f))
    lines = {}
    for f in files:
        with open(f) as fh:
            text = fh.read()
        for name in names:
            if name in lines:
                continue
            # instruction definition: "  name = shape{layout} copy(operand)"
            m = re.search(rf"^\s+(%?{re.escape(name)} = .+)$", text, re.M)
            if m:
                lines[name] = (pt.basename(f), m.group(1).strip())
    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/eoe_copy_prof")
    ap.add_argument("--model", default="clip")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--steps", type=int, default=None,
                    help="steps per epoch for per-step normalization "
                         "(default: inferred from the trace's modal fusion "
                         "repeat count; 96 if undeterminable)")
    args = ap.parse_args()
    if not args.parse_only:
        run(args.logdir, args.model)
    ev = copy_events(args.logdir)
    if args.steps is None:
        inferred = count_steps(args.logdir)
        args.steps = inferred or 96
        print(f"steps/epoch: {args.steps} "
              f"({'inferred from trace' if inferred else 'fallback default'})")
    total = sum(v[0] for v in ev.values())
    print(f"\ncopy-category device time: {total / 1e3:.2f}ms over the epoch "
          f"(~{total / 1e3 / args.steps:.3f}ms/step at {args.steps} steps)")
    print(f"{'op':44s} {'count':>5s} {'tot_ms':>8s} {'us/step':>8s}  shape")
    attr = attribute(list(ev))
    for name, (dur, count, a) in sorted(ev.items(), key=lambda kv: -kv[1][0]):
        shape = a.get("shape", "")
        print(f"{name[:44]:44s} {count:5d} {dur / 1e3:8.2f} "
              f"{dur / args.steps:8.1f}  {shape}")
        if name in attr:
            f, line = attr[name]
            print(f"    {line[:150]}")
    if not attr:
        print("\n(no HLO dump matched — run without --parse-only or point "
              f"XLA_FLAGS --xla_dump_to at {HLO_DUMP})")


if __name__ == "__main__":
    main()
