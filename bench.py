"""Benchmark: PLONKish proving throughput on the real TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload: the flagship MainVM-shaped circuit (degree-8 gate set, copy
permutation in chunks of 4, 2^16 range-check lookup) at production WIDTH —
the default headline shape is 2^19 rows x 130 columns (reference MainVM
geometry: vm_main.rs 130 copy columns); the full production shape
2^20 x 130 (TARGET_CIRCUIT_TRACE_LENGTH 2^20) runs as an UPGRADE attempt
after the headline exists (opt-out via ZKTPU_BENCH_UPGRADE=0 for sessions
with a cold compile cache — see UPGRADE_SHAPES). Pipeline measured: trace
commit, copy/lookup stages, coset-streamed quotient, streamed DEEP, FRI.
Reported as trace cells/sec (rows x columns per second, warm) so runs at
different shapes stay comparable; falls back to smaller shapes only if the
headline shape cannot run (the fallback is visible in the metric name).

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
# Warm-cache-expected shape FIRST so the headline JSON is flushed within the
# first child window (r3 lesson: BENCH_r03 rc=124 with an EMPTY tail because
# the one JSON line printed only after every child finished). The bigger
# 2^20 shape is attempted as an UPGRADE after a headline exists.
SHAPES = [(19, 130, 3000), (18, 32, 1500)]
# The 2^20x130 upgrade shape sits at the single-chip HBM edge: a device OOM
# can wedge the remote-TPU tunnel for HOURS (CLAUDE.md), and its kernels are
# shape-keyed so a cold cache means a 60-90 min remote compile — either one
# blows the driver's window AFTER a good headline already exists. The upgrade
# only ever improves an existing headline (failures append to "notes"), so it
# runs by default; opt OUT via ZKTPU_BENCH_UPGRADE=0 for cold-cache sessions.
UPGRADE_SHAPES = ([(20, 130, 3600)]
                  if os.environ.get("ZKTPU_BENCH_UPGRADE") != "0" else [])
_MAINVM_TIMEOUT_S = 3000


def _run_mainvm_inline():
    """Child-process entry: prove ONE real MainVM instance (type 1) at the
    production capacity 5585 (geometry_config.rs cycles_per_vm_snapshot)
    from a traced block — the PRODUCT metric, not the synthetic flagship
    (VERDICT r2 'the bench proves a synthetic circuit'). Prints witness-gen
    time and warm prove cycles/s."""
    import time as _t
    from zkevm_harness_tpu.circuits import main_vm_circuit as mvc
    from zkevm_harness_tpu.circuits.types import testing_geometry
    from zkevm_harness_tpu.prover import plonkish as pk
    from zkevm_harness_tpu.vm import isa
    from zkevm_harness_tpu.vm.environment import (
        DefaultPrecompilesProcessor, InMemoryEventSink, InMemoryStorage,
        SimpleDecommitter, SimpleMemory)
    from zkevm_harness_tpu.vm.interpreter import run_vm
    from zkevm_harness_tpu.vm.state import (BlockProperties, ProvingToolset,
                                            create_vm)
    from zkevm_harness_tpu.witness import main_vm as wmv
    from zkevm_harness_tpu.witness.tracer import WitnessTracer

    I, R = isa.imm, isa.reg
    # ~5600-cycle block: arithmetic + storage + events + heap + near calls
    body = [
        isa.BinOp("add", R(1), I(1), dst=1),
        isa.BinOp("add", R(1), R(2), dst=2),
        isa.Div(R(2), I(7), dst_quot=3, dst_rem=4),
        isa.HeapWrite(I(3), R(2)),
        isa.HeapRead(I(3), 5),
        isa.StorageWrite(I(5), R(5)),
        isa.Event(I(6), R(3)),
        isa.BinOp("sub", R(2), R(3), dst=6),
    ]
    prog = []
    for _ in range(697):  # 697*8 + tail ~= 5585 cycles
        prog.extend(body)
    prog += [isa.Nop()] * (5584 - len(prog)) + [isa.Ret()]
    tracer = WitnessTracer(10_000)
    tools = ProvingToolset(
        storage=InMemoryStorage(), memory=SimpleMemory(),
        decommitter=SimpleDecommitter(), event_sink=InMemoryEventSink(),
        precompiles=DefaultPrecompilesProcessor(), tracer=tracer,
        geometry=testing_geometry())
    vm = create_vm(tools, BlockProperties(block_number=1), 0xAA, code_page=0)
    cycles = run_vm(vm, prog, 10_000)
    assert vm.finished and cycles >= 5585 - 16, cycles
    t0 = time.time()
    from zkevm_harness_tpu.prover import layers as ly
    # production register geometry: u16 x 16 limbs (full u256) at 2^16 rows
    # (the u8 x 32 CPU-test geometry's gate graph is ~1.7x larger and
    # SIGKILLs the remote TPU compiler)
    geo = ly.main_vm_geometry_for_capacity(5585, limb_bits=16)
    art = wmv.compute_main_vm_artifacts(tracer, geo, capacity=5585)
    inst = art.instances[0]
    ir = mvc.main_vm_ir(geo)
    W = mvc.main_vm_witness(ir, geo, inst)
    t_wit = time.time() - t0
    print(f"WITNESS_SECONDS {t_wit}", flush=True)
    cfg = pk.PlonkishConfig(rate=2, cap_size=16, num_queries=50,
                            final_fri_size=512)
    setup = mvc.main_vm_setup(ir, geo, cfg)
    proof = pk.prove(ir, setup, W, cfg)  # compile + warm cache
    t0 = time.time()
    proof = pk.prove(ir, setup, W, cfg)
    dt = time.time() - t0
    assert pk.verify(ir, setup.vk(), proof, cfg), "MainVM proof must verify"
    print(f"MAINVM_CYCLES_PER_SEC {5585.0 / dt} width {ir.num_witness}",
          flush=True)


def _run_shape_inline(log_n: int, width: int):
    """Child-process entry: prove the shape twice (compile+warm), print
    the warm cells/s on the last stdout line."""
    from zkevm_harness_tpu.circuits import flagship as fl
    from zkevm_harness_tpu.prover import plonkish as pk

    # final_fri_size 512: each extra FRI round costs a fold+commit+challenge
    # round-trip over the tunnel; stopping 3 rounds earlier trades it for a
    # 512-coeff final poly (host eval cost negligible, same rate/soundness)
    cfg = pk.PlonkishConfig(rate=2, cap_size=16, num_queries=40,
                            final_fri_size=512)
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


def _run_mainvm_child():
    """Secondary metric: a REAL MainVM instance at capacity 5585 (the
    product, not the flagship). Failure is non-fatal to the headline."""
    try:
        r = subprocess.run(
            [sys.executable, __file__, "--mainvm"],
            capture_output=True, timeout=_MAINVM_TIMEOUT_S, text=True)
    except subprocess.TimeoutExpired:
        return {"error": "main_vm_real timed out"}
    if r.returncode != 0:
        tail = (r.stdout + r.stderr).strip().splitlines()[-1:]
        return {"error": f"main_vm_real failed: {tail}"}
    out = {}
    for ln in r.stdout.splitlines():
        if ln.startswith("WITNESS_SECONDS"):
            out["main_vm_witness_seconds"] = round(float(ln.split()[1]), 2)
        if ln.startswith("MAINVM_CYCLES_PER_SEC"):
            out["main_vm_real_cycles_per_sec"] = round(float(ln.split()[1]),
                                                       1)
            out["main_vm_width"] = int(ln.split()[3])
    return out


def _try_shape(log_n: int, width: int, timeout_s: int):
    """Run one shape in a child; return (cells_per_sec, None) or (None, err)."""
    try:
        r = subprocess.run(
            [sys.executable, __file__, "--shape", str(log_n), str(width)],
            capture_output=True, timeout=timeout_s, text=True)
    except subprocess.TimeoutExpired:
        return None, f"shape 2^{log_n}x{width} timed out"
    if r.returncode != 0:
        tail = (r.stdout + r.stderr).strip().splitlines()[-1:] or ["?"]
        return None, f"shape 2^{log_n}x{width} failed: {tail}"
    lines = [ln for ln in r.stdout.splitlines()
             if ln.startswith("CELLS_PER_SEC")]
    if not lines:
        return None, f"shape 2^{log_n}x{width}: no CELLS_PER_SEC line"
    return float(lines[-1].split()[1]), None


def _emit(headline):
    """Print-and-FLUSH the headline JSON line. Called the moment the first
    shape succeeds and again after every enrichment, so a driver timeout at
    ANY later point still captures a parseable result line (the r3 failure
    mode was an empty tail). The LAST JSON line is the most complete one."""
    print(json.dumps(headline), flush=True)


def main():
    last_err = None
    headline = None
    for i, (log_n, width, tmo) in enumerate(SHAPES):
        if i > 0 and not _tunnel_ready():
            last_err = "tunnel did not heal after previous shape"
            break
        cps, err = _try_shape(log_n, width, tmo)
        if cps is None:
            last_err = err
            continue
        headline = {
            "metric": f"plonkish_prove_cells_per_sec_w{width}_2e{log_n}",
            "value": round(cps, 1),
            "unit": "cells/s",
            "vs_baseline": round(cps / CPU_ANCHOR_CELLS_PER_SEC, 3),
        }
        _emit(headline)  # headline is now on stdout no matter what follows
        break
    if headline is None:
        raise SystemExit(f"all bench shapes failed: {last_err}")

    # secondary: the real-MainVM product metric (non-fatal). A wedged
    # tunnel can take far longer than 10 min to heal (CLAUDE.md) — keep
    # probing up to 30 min and RETRY the child once after a re-heal
    # (BENCH_r04's secondary died exactly here)
    if _tunnel_ready(1800):
        sec = _run_mainvm_child()
        if "error" in sec and _tunnel_ready(900):
            sec = _run_mainvm_child()
        headline["secondary"] = sec
    else:
        headline["secondary"] = {"error": "tunnel wedged before main_vm_real"}
    _emit(headline)

    # upgrade attempts: bigger shapes only improve the headline, never lose it
    for log_n, width, tmo in UPGRADE_SHAPES:
        if not _tunnel_ready(600):
            break
        cps, err = _try_shape(log_n, width, tmo)
        if cps is None:
            headline.setdefault("notes", []).append(err)
            _emit(headline)
            continue
        headline["metric"] = f"plonkish_prove_cells_per_sec_w{width}_2e{log_n}"
        headline["value"] = round(cps, 1)
        headline["vs_baseline"] = round(cps / CPU_ANCHOR_CELLS_PER_SEC, 3)
        _emit(headline)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--shape":
        _run_shape_inline(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--mainvm":
        _run_mainvm_inline()
    else:
        main()
