"""Derive a per-step device phase table from a jax.profiler trace.

SURVEY §5.1 names ``jax.profiler`` traces as this build's structured
profiling answer (the reference has only ad-hoc wall-clock prints,
/root/reference/run_convdr_inference.py:181-189). ``bench.py
--profile_dir DIR`` / driver ``--profile_dir`` capture a trace; this
script aggregates the device timeline slices into phase buckets
(XLA fusions, flash-attention fwd/bwd Pallas kernels, copies, control
overhead) so the numbers in PARITY.md are reproducible:

    python scripts/trace_phases.py /tmp/prof_mfu --steps 8

``--steps`` divides totals by the in-jit loop trip count (bench.py times
N steps inside one ``fori_loop`` because per-dispatch host timing
measures the tunnel, not the kernel -- CLAUDE.md "Round-3 gotchas").
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(
        os.path.join(path, "plugins", "profile", "*", "*.trace.json.gz")
    ))
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {path}")
    return hits[-1]  # latest capture


def categorize(name: str) -> str:
    if name.startswith("flash_mha_bwd"):
        return "attention bwd (flash Pallas)"
    if name.startswith("flash_attention") or name.startswith("flash_mha"):
        return "attention fwd (flash Pallas)"
    if "fusion" in name:
        return "XLA fusions (matmuls + fused elementwise)"
    if name.startswith("copy") or "transpose" in name:
        return "copies / transposes"
    if name.startswith("dynamic"):
        return "dynamic slice / update"
    return "other (small ops, infeed, control)"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("trace", help="profile dir (from --profile_dir) or .trace.json.gz")
    p.add_argument("--steps", type=int, default=1,
                   help="in-jit loop trip count to divide by")
    p.add_argument("--top", type=int, default=0,
                   help="also print the TOP largest individual ops")
    args = p.parse_args(argv)

    with gzip.open(find_trace(args.trace)) as f:
        trace = json.load(f)

    device_pids = {
        e["pid"]
        for e in trace["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in e["args"]["name"]
    }
    slices = [
        e for e in trace["traceEvents"]
        if e.get("ph") == "X" and e.get("pid") in device_pids
    ]
    # envelope slices (the jit program and its while loop) double-count
    # their children; drop anything that individually spans >20% of the
    # total module time
    total_all = sum(e.get("dur", 0) for e in slices)
    leaf = [e for e in slices if e.get("dur", 0) < 0.2 * total_all]

    agg = collections.Counter()
    cnt = collections.Counter()
    for e in leaf:
        c = categorize(e["name"])
        agg[c] += e.get("dur", 0)
        cnt[c] += 1
    tot = sum(agg.values())
    if not tot:
        print("no device slices found")
        return
    print(f"device op time: {tot / 1e3:.1f} ms "
          f"({tot / args.steps / 1e3:.2f} ms/step over {args.steps} steps)")
    for c, d in agg.most_common():
        print(f"{d / args.steps / 1e3:9.2f} ms/step  {d / tot * 100:5.1f}%  "
              f"n={cnt[c]:6d}  {c}")

    if args.top:
        big = collections.Counter()
        for e in leaf:
            big[e["name"]] += e.get("dur", 0)
        print("\nlargest individual ops:")
        for name, d in big.most_common(args.top):
            print(f"{d / args.steps / 1e3:9.2f} ms/step  {name[:90]}")


if __name__ == "__main__":
    main()
