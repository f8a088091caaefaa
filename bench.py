"""Benchmark: PLONKish proving throughput on the real TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload: the flagship MainVM-shaped circuit (degree-8 gate set, copy
permutation in chunks of 4, 2^16 range-check lookup) at the PRODUCTION
shape — 2^20 rows x 130 columns (the reference MainVM instance geometry:
vm_main.rs 130 copy columns, TARGET_CIRCUIT_TRACE_LENGTH 2^20) — trace
commit, copy/lookup stages, coset-streamed quotient, streamed DEEP, FRI.
Reported as trace cells/sec (rows x columns per second, warm) so runs at
different shapes stay comparable; falls back to smaller shapes only if the
full one cannot run (the fallback is visible in the metric name).

vs_baseline: the reference publishes no numbers and its Rust toolchain is
not present in this image (BASELINE.md); the anchor is a 60 s CPU proof of
a 2^20x130 instance (2.3M cells/s) pending a measured run.
"""

import json
import time

CPU_ANCHOR_CELLS_PER_SEC = float((1 << 20) * 130) / 60.0
SHAPES = [(20, 130), (19, 130), (18, 32)]  # preferred first


def _run(log_n: int, width: int):
    from zkevm_harness_tpu.circuits import flagship as fl
    from zkevm_harness_tpu.prover import plonkish as pk

    cfg = pk.PlonkishConfig(rate=2, cap_size=16, num_queries=40,
                            final_fri_size=64)
    ir = fl.flagship_ir(log_n=log_n, width=width)
    setup = fl.flagship_setup(ir, cfg)
    witness = fl.flagship_witness(ir)
    proof = pk.prove(ir, setup, witness, cfg)  # warm-up / compile
    t0 = time.time()
    proof = pk.prove(ir, setup, witness, cfg)
    dt = time.time() - t0
    assert pk.verify(ir, setup.vk(), proof, cfg), "proof must verify"
    return (1 << log_n) * width / dt


def main():
    last_err = None
    for log_n, width in SHAPES:
        try:
            cells_per_sec = _run(log_n, width)
        except Exception as e:  # device-memory flakiness insurance
            last_err = e
            continue
        print(json.dumps({
            "metric": f"plonkish_prove_cells_per_sec_w{width}_2e{log_n}",
            "value": round(cells_per_sec, 1),
            "unit": "cells/s",
            "vs_baseline": round(cells_per_sec / CPU_ANCHOR_CELLS_PER_SEC,
                                 3),
        }))
        return
    raise SystemExit(f"all bench shapes failed: {last_err}")


if __name__ == "__main__":
    main()
