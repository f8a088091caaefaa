"""Per-kernel throughput benchmarks vs speed-of-light (BASELINE.md targets).

Measures the engine-room kernels on the attached device and compares against
a roofline estimate: these u32-limb kernels are VPU-bound (no MXU path for
modular arithmetic yet), so speed-of-light = VPU lanes * clock / u32-ops-per-
field-op, and HBM-bound for streaming ops.

Run: python tools/kernel_bench.py  (prints one JSON line per kernel)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

# v5e per-chip peaks (public spec): 394 bf16 TFLOPs MXU; VPU is 8x128 lanes
# at ~0.94 GHz, 4 SIMD units -> ~3.9e12 u32 ops/s upper bound; HBM ~819 GB/s.
VPU_U32_OPS = 3.9e12
HBM_BYTES = 819e9

# u32-op cost per field op (from the kernel code): mul ~45, add ~12,
# poseidon2 permutation ~ (8 ext rounds * (12 pow7*3mul + M_E ~48 mul_small)
# + 22 int rounds * (pow7 + 12 mul + adds)) ~ 3,800 muls-equivalent
COST = {"gl_mul": 45, "gl_add": 12, "poseidon2": 3800 * 45 / 12 / 12}


def bench_chained(fn, x, iters=20):
    """Feed the output back as input so iterations cannot be elided or
    overlapped-away; measures steady-state per-call latency."""
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(out)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    from zkevm_harness_tpu.ops import goldilocks as gl
    from zkevm_harness_tpu.ops import merkle as mk
    from zkevm_harness_tpu.ops import ntt as nt
    from zkevm_harness_tpu.ops import poseidon2 as p2

    rng = np.random.default_rng(0)
    results = []

    n = 1 << 22
    a = gl.from_u64(rng.integers(0, 1 << 63, size=n, dtype=np.uint64))
    b = gl.from_u64(rng.integers(0, 1 << 63, size=n, dtype=np.uint64))
    dt = bench_chained(lambda x: gl.mul(x, b), a)
    ops = n / dt
    results.append({"kernel": "goldilocks_mul", "elems_per_s": round(ops),
                    "sol_frac": round(ops / (VPU_U32_OPS / COST["gl_mul"]), 4)})
    dt = bench_chained(lambda x: gl.add(x, b), a)
    ops = n / dt
    results.append({"kernel": "goldilocks_add", "elems_per_s": round(ops),
                    "sol_frac": round(ops / (VPU_U32_OPS / COST["gl_add"]), 4)})

    states = gl.from_u64(rng.integers(0, 1 << 63, size=(1 << 16, 12),
                                      dtype=np.uint64))
    dt = bench_chained(p2.permute, states)
    perms = (1 << 16) / dt
    # poseidon2 ~ 660 gl_mul + ~2500 gl_add per permutation
    sol = VPU_U32_OPS / (660 * COST["gl_mul"] + 2500 * COST["gl_add"])
    results.append({"kernel": "poseidon2_permute", "perms_per_s": round(perms),
                    "sol_frac": round(perms / sol, 4)})

    from zkevm_harness_tpu.ops import pallas_kernels as pks
    if pks.HAVE_PALLAS and jax.default_backend() == "tpu":
        # plumbing check: pallas VMEM-resident kernel vs the XLA scan path
        want = gl.to_u64(p2._permute_xla(states))
        got = gl.to_u64(pks.pallas_poseidon2_permute(states))
        ok = bool(np.array_equal(want, got))
        dt = bench_chained(pks.pallas_poseidon2_permute, states)
        perms = (1 << 16) / dt
        results.append({"kernel": "poseidon2_permute_pallas",
                        "perms_per_s": round(perms),
                        "sol_frac": round(perms / sol, 4),
                        "matches_xla": ok})

    cols = gl.from_u64(rng.integers(0, 1 << 63, size=(16, 1 << 16),
                                    dtype=np.uint64))
    dt = bench_chained(nt.ntt, cols)
    butterflies = 16 * (1 << 15) * 16  # cols * n/2 * log_n
    bf_per_s = butterflies / dt
    sol_bf = VPU_U32_OPS / (COST["gl_mul"] + 2 * COST["gl_add"])
    results.append({"kernel": "ntt_radix2_butterfly",
                    "butterflies_per_s": round(bf_per_s),
                    "sol_frac": round(bf_per_s / sol_bf, 4)})

    rows = gl.from_u64(rng.integers(0, 1 << 63, size=(1 << 14, 16),
                                    dtype=np.uint64))
    t0 = time.time()
    for _ in range(5):
        jax.block_until_ready(mk.commit(rows, 16).cap.lo)
    dt = (time.time() - t0) / 5
    leaves = (1 << 14) / dt
    results.append({"kernel": "merkle_commit_16col",
                    "leaves_per_s": round(leaves)})

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
