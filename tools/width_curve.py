"""Single-chip WIDTH-SCALING curve (VERDICT r4 next-step 9).

Proves the flagship gate set at FIXED rows across widths 32 -> 130 -> 605
(warm, cells/s) on the one real TPU chip. This is the evidence BASELINE.md
promised for the column-sharding decision: where per-chip throughput
saturates in width is exactly what a column-sharded multi-chip prove would
relieve (parallel/ shards columns; __graft_entry__.dryrun_multichip shows
the transcript-identical sharded prove).

Rows default to 2^16 (the MainVM production row count at width 605 —
main_vm_geometry_for_capacity(5585), BASELINE.md round-3) so the 605-point
matches the real product shape; the flagship gate set is identical across
widths, so the curve isolates the width axis.

Usage: timeout 7200 python tools/width_curve.py [--logn 16] [--widths 32,130,605]
Each width runs in-process (one TPU client); record results in BASELINE.md.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zkevm_harness_tpu.circuits import flagship as fl  # noqa: E402
from zkevm_harness_tpu.prover import plonkish as pk  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=16)
    ap.add_argument("--widths", default="32,130,605")
    ap.add_argument("--queries", type=int, default=40)
    args = ap.parse_args()
    cfg = pk.PlonkishConfig(rate=2, cap_size=16, num_queries=args.queries,
                            final_fri_size=512)
    curve = []
    for width in (int(w) for w in args.widths.split(",")):
        t0 = time.time()
        ir = fl.flagship_ir(log_n=args.logn, width=width)
        setup = fl.flagship_setup(ir, cfg)
        witness = fl.flagship_witness(ir)
        proof = pk.prove(ir, setup, witness, cfg)  # compile + warm
        t_cold = time.time() - t0
        t0 = time.time()
        proof = pk.prove(ir, setup, witness, cfg)
        dt = time.time() - t0
        assert pk.verify(ir, setup.vk(), proof, cfg)
        cps = (1 << args.logn) * width / dt
        point = {"log_n": args.logn, "width": width,
                 "warm_s": round(dt, 2), "cells_per_sec": round(cps, 1),
                 "cold_s": round(t_cold, 1)}
        curve.append(point)
        print("WIDTH_POINT " + json.dumps(point), flush=True)
    print("WIDTH_CURVE " + json.dumps(curve), flush=True)


if __name__ == "__main__":
    main()
