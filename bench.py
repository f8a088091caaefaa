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

Each shape runs in its OWN subprocess: a device OOM poisons the client
process and can wedge the remote-TPU tunnel, so fallbacks must start from
a clean runtime (and wait for the tunnel to heal first).

vs_baseline: the reference publishes no numbers and its Rust toolchain is
not present in this image (BASELINE.md). The anchor is 60 s per 2^20x130
CPU proof (2.3M cells/s) — DERIVED, not guessed: the boojum workload's
arithmetic floor alone (~45 NTTs of 2^21 + 8-coset quotient + ~2^22
Poseidon2 hashes at an optimistic 1e9 muladd/s/core x 16 cores) is 25-40 s,
so 60 s end-to-end is a favorable (hard-to-beat) CPU anchor (BASELINE.md
"Anchor derivation").
"""

import json
import os
import subprocess
import sys
import time

CPU_ANCHOR_CELLS_PER_SEC = float((1 << 20) * 130) / 60.0
SHAPES = [(20, 130), (19, 130), (18, 32)]  # preferred first
_CHILD_TIMEOUT_S = 4200  # first-ever compile of a big shape is many minutes


def _run_shape_inline(log_n: int, width: int):
    """Child-process entry: prove the shape twice (compile+warm), print
    the warm cells/s on the last stdout line."""
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
    print(f"CELLS_PER_SEC {(1 << log_n) * width / dt}", flush=True)


def _tunnel_ready(deadline_s: float = 900.0) -> bool:
    """Probe the TPU with a tiny op until it responds (an OOM can wedge
    the tunnel for minutes); each probe is its own subprocess."""
    t0 = time.time()
    while time.time() - t0 < deadline_s:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax,jax.numpy as jnp;print(int((jnp.arange(8)**2).sum()))"],
                capture_output=True, timeout=180, text=True)
        except subprocess.TimeoutExpired:
            # a wedged tunnel hangs the probe — that's a failed probe, not a
            # crash (round-2 bench died here: BENCH_r02.json rc=1)
            time.sleep(30)
            continue
        if r.returncode == 0 and "140" in r.stdout:
            return True
        time.sleep(30)
    return False


def main():
    last_err = None
    for i, (log_n, width) in enumerate(SHAPES):
        if i > 0 and not _tunnel_ready():
            last_err = "tunnel did not heal after previous shape"
            break
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--shape", str(log_n), str(width)],
                capture_output=True, timeout=_CHILD_TIMEOUT_S, text=True)
        except subprocess.TimeoutExpired as e:
            last_err = f"shape 2^{log_n}x{width} timed out"
            continue
        if r.returncode != 0:
            last_err = (r.stdout + r.stderr).strip().splitlines()[-1:] or "?"
            continue
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("CELLS_PER_SEC")][-1]
        cells_per_sec = float(line.split()[1])
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
    if len(sys.argv) > 1 and sys.argv[1] == "--shape":
        _run_shape_inline(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
