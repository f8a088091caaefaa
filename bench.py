"""Benchmark: STARK proving throughput on the real TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Round-1 metric: end-to-end STARK prove wall-clock on a 2^16-row, 32-column,
degree-2 AIR (trace commit + quotient + DEEP + FRI), reported as trace
rows/sec. vs_baseline is measured against the reference harness's only
per-circuit anchor we can normalize to — the Rust CPU harness proves one
2^20-row base circuit in O(minutes); the recorded CPU anchor used here is
rows/sec equivalent of a 60 s per 2^20-row proof (17,476 rows/s), pending a
measured cargo run (BASELINE.md TODO).
"""

import json
import time

import numpy as np

CPU_ANCHOR_ROWS_PER_SEC = float(1 << 20) / 60.0


def main():
    from zkevm_harness_tpu.ops import goldilocks as gl
    from zkevm_harness_tpu.prover import stark as st

    P = gl.P
    log_n = 16
    width = 32
    cfg = st.StarkConfig(lde_factor=4, cap_size=16, num_queries=20,
                         final_fri_size=64)

    def eval_transitions(alg, row, nxt):
        out = []
        for j in range(width - 1):
            # x_{j}' = x_j * x_{j+1} + j  (degree 2, exercises mul+add)
            out.append(alg.sub(nxt[j], alg.add_int(alg.mul(row[j], row[j + 1]), j)))
        return out

    air = st.Air(width=width, log_n=log_n, constraint_degree=2,
                 num_transitions=width - 1, eval_transitions=eval_transitions,
                 boundary=tuple((0, j, 1) for j in range(width)))

    # build a satisfying trace host-side (exact ints)
    n = 1 << log_n
    cols = np.ones((width, n), dtype=object)
    for i in range(1, n):
        prev = cols[:, i - 1]
        cur = np.empty(width, dtype=object)
        for j in range(width - 1):
            cur[j] = (int(prev[j]) * int(prev[j + 1]) + j) % P
        cur[width - 1] = int(prev[width - 1])
        cols[:, i] = cur
    trace = gl.from_int(cols)

    # warm-up (compile)
    st.prove(air, trace, cfg)
    t0 = time.time()
    st.prove(air, trace, cfg)
    dt = time.time() - t0

    rows_per_sec = n / dt
    print(json.dumps({
        "metric": "stark_prove_rows_per_sec_w32_2e16",
        "value": round(rows_per_sec, 1),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_sec / CPU_ANCHOR_ROWS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
