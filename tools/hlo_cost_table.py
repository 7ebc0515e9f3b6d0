"""Rank a compiled XLA program's ops by the TPU compiler's own
estimated_cycles (backend_config), grouped by source op_name. The
device-time profile aggregates every XLA fusion under one "fusion" row;
this splits that row by module/op so the tax is attributable.

Usage:
  python tools/hlo_cost_table.py /tmp/decode_hlo.txt [--top 30]
"""

import argparse
import json
import re
import sys
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("hlo_path")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--by", choices=["op", "kind"], default="op")
    args = ap.parse_args()

    # entry-computation ops only: skip fused_computation bodies (their
    # cycles are counted at the calling fusion op)
    agg = defaultdict(float)
    kind_re = re.compile(r"%(\w+?)(?:\.\d+)? = ")
    in_fused = False
    for line in open(args.hlo_path):
        if line.startswith("%fused_computation") or line.startswith("%region"):
            in_fused = True
            continue
        if in_fused:
            if line.startswith("}"):
                in_fused = False
            continue
        m = re.search(r'"estimated_cycles":"(\d+)"', line)
        if not m:
            continue
        cycles = int(m.group(1))
        op = re.search(r'op_name="([^"]*)"', line)
        kmatch = kind_re.search(line)
        kind = kmatch.group(1) if kmatch else "?"
        if args.by == "kind":
            key = kind
        else:
            name = op.group(1) if op else "(no-metadata)"
            # strip jit wrapper and param ids for grouping
            name = re.sub(r"^jit\([^)]*\)/", "", name)
            key = f"{kind:24s} {name}"
        agg[key] += cycles
    total = sum(agg.values())
    if not total:
        sys.exit("no estimated_cycles found (is this a compiled HLO dump?)")
    # v5e TensorCore ~940 MHz
    print(f"total estimated cycles: {total/1e6:.2f} M "
          f"(~{total/940e3:.2f} ms at 940 MHz)")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {v/940e3:8.3f} ms  {100*v/total:5.1f}%  {k[:150]}")


if __name__ == "__main__":
    main()
