"""Prove the PRODUCTION-parameter verifier circuit on the TPU.

VERDICT r4 next-step 2: the 50-query verifier-of-a-base-proof circuit
(one leaf slot of a production base proof) was synthesized in round 4
(2^18 x 60) but never PROVEN. This script:

  1. proves a RAM-permutation base instance at a production-shaped config
     (rate 2, cap 16, num_queries=50, final_fri_size=512) at `--inner-logn`
     (default 2^14 — a reduced-row instance of the production gate set; the
     full 2^20 instance's verifier has the same circuit STRUCTURE, only
     more Merkle levels: +6 poseidon2 rows per query path);
  2. synthesizes the verifier circuit over that proof at the SAME 50-query
     config (the production leaf-slot statement);
  3. proves the verifier circuit on the TPU at the production config and
     verifies it.

Usage:  timeout 5400 python tools/prove_prod_verifier.py [--inner-logn 14]
Writes timings to stdout; record them in BASELINE.md.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from zkevm_harness_tpu.circuits import leaf_circuit as lc  # noqa: E402
from zkevm_harness_tpu.circuits import ram_permutation_circuit as rc  # noqa: E402
from zkevm_harness_tpu.ops import goldilocks as gl  # noqa: E402
from zkevm_harness_tpu.prover import plonkish as pk  # noqa: E402
from zkevm_harness_tpu.vm.environment import (MemoryLocation,  # noqa: E402
                                              MemoryQuery)
from zkevm_harness_tpu.witness import ram_permutation as rp  # noqa: E402


def _ram_instance(geo, seed=5):
    """A RAM-consistent instance filling the geometry capacity."""
    rng = np.random.default_rng(seed)
    mem = {}
    qs = []
    for i in range(geo.capacity):
        page = int(rng.integers(1, 4))
        index = int(rng.integers(0, 64))
        write = bool(rng.integers(0, 2))
        if write:
            value = int.from_bytes(rng.bytes(25), "little")
            mem[(page, index)] = value
        else:
            value = mem.get((page, index), 0)
        qs.append(MemoryQuery(timestamp=8 + 2 * i,
                              location=MemoryLocation(page, index),
                              value=value, rw_flag=write))
    art = rp.compute_ram_circuit_snapshots(qs, capacity=geo.capacity)
    return rc.instance_inputs(art.instances[0], art.challenges)


def arity32(inner_logn: int, queries: int):
    """The production-ARITY axis: one leaf verifying 32 REAL base proofs
    (RECURSION_ARITY=32, recursion_layer/mod.rs:25). Reduced FRI per slot
    keeps the outer circuit within single-chip HBM; the 50-query soundness
    axis is covered by the single-slot run (main)."""
    cfg = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=queries,
                            final_fri_size=8)
    log_n = inner_logn
    ir = rc.ram_ir(log_n, 1)
    geo = rc.RamGeometry(log_n, 1)
    setup = rc.ram_setup(ir, geo, cfg)
    proofs = []
    t0 = time.time()
    for i in range(32):
        inst = _ram_instance(geo, seed=100 + i)
        W = rc.ram_witness(ir, geo, inst)
        p = pk.prove(ir, setup, W, cfg)
        assert pk.verify(ir, setup.vk(), p, cfg)
        proofs.append(p)
        if i in (0, 31):
            print(f"base[{i}] proven ({time.time()-t0:.1f}s cum)",
                  flush=True)
    t0 = time.time()
    b, lay = lc.synthesize_leaf(ir, cfg, arity=32, base_circuit_type=8)
    built = b.finalize()
    print(f"arity-32 leaf synth {time.time()-t0:.1f}s -> "
          f"2^{built.ir.log_n} x {built.ir.num_witness}", flush=True)
    t0 = time.time()
    vsetup = built.setup(cfg)
    print(f"leaf setup {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    W = b.fill_witness(lc.leaf_assignments(lay, setup.vk(), proofs))
    print(f"leaf fill {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    lproof = pk.prove(built.ir, vsetup, W, cfg)
    print(f"leaf prove (cold) {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    lproof = pk.prove(built.ir, vsetup, W, cfg)
    dt = time.time() - t0
    assert pk.verify(built.ir, vsetup.vk(), lproof, cfg)
    expect = lc.leaf_public_inputs(lay, setup.vk(), proofs)
    assert [int(v) for v in lproof.public_inputs] == \
        [int(v) % gl.P for v in expect]
    print(f"ARITY32_LEAF_OK warm {dt:.1f}s "
          f"(2^{built.ir.log_n} x {built.ir.num_witness})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner-logn", type=int, default=14)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--arity32", action="store_true",
                    help="prove ONE leaf over 32 real base proofs "
                         "(reduced per-slot FRI) instead")
    args = ap.parse_args()
    if args.arity32:
        return arity32(8, 2)

    cfg = pk.PlonkishConfig(rate=2, cap_size=16, num_queries=args.queries,
                            final_fri_size=512)

    # -- 1. a base proof of the RAM gate set at the production config -----
    log_n = args.inner_logn
    tiles = 1
    ir = rc.ram_ir(log_n, tiles)
    geo = rc.RamGeometry(log_n, tiles)
    t0 = time.time()
    setup = rc.ram_setup(ir, geo, cfg)
    print(f"inner setup {time.time()-t0:.1f}s "
          f"(2^{log_n} x {ir.num_witness})", flush=True)
    inst = _ram_instance(geo)
    W = rc.ram_witness(ir, geo, inst)
    t0 = time.time()
    proof = pk.prove(ir, setup, W, cfg)
    print(f"inner prove (cold) {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    proof = pk.prove(ir, setup, W, cfg)
    print(f"inner prove (warm) {time.time()-t0:.1f}s", flush=True)
    assert pk.verify(ir, setup.vk(), proof, cfg)

    # -- 2. the 50-query verifier circuit over it -------------------------
    t0 = time.time()
    b, lay = lc.synthesize_leaf(ir, cfg, arity=1, base_circuit_type=8)
    built = b.finalize()
    print(f"verifier synth+finalize {time.time()-t0:.1f}s -> "
          f"2^{built.ir.log_n} x {built.ir.num_witness}", flush=True)

    # -- 3. prove the verifier circuit at the production config -----------
    t0 = time.time()
    vsetup = built.setup(cfg)
    print(f"verifier setup {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    vW = b.fill_witness(lc.leaf_assignments(lay, setup.vk(), [proof]))
    print(f"verifier fill {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    vproof = pk.prove(built.ir, vsetup, vW, cfg)
    print(f"verifier prove (cold) {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    vproof = pk.prove(built.ir, vsetup, vW, cfg)
    dt = time.time() - t0
    print(f"verifier prove (warm) {dt:.1f}s", flush=True)
    assert pk.verify(built.ir, vsetup.vk(), vproof, cfg), \
        "50-query verifier circuit proof must verify"
    cells = (1 << built.ir.log_n) * built.ir.num_witness
    print(f"PROD_VERIFIER_OK cells/s {cells/dt:.0f} "
          f"queries {args.queries}", flush=True)


if __name__ == "__main__":
    main()
