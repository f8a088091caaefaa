"""End-to-end STARK prove + verify on toy AIRs (the minimum e2e slice)."""

import numpy as np
import pytest

from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import stark as st

P = gl.P


def fib_mul_air(log_n):
    """width 3: a' = b, b' = a + b, c' = c * b (degree 2)."""

    def eval_transitions(alg, row, nxt):
        a, b, c = row
        an, bn, cn = nxt
        return [
            alg.sub(an, b),
            alg.sub(bn, alg.add(a, b)),
            alg.sub(cn, alg.mul(c, b)),
        ]

    return st.Air(width=3, log_n=log_n, constraint_degree=2, num_transitions=3,
                  eval_transitions=eval_transitions,
                  boundary=((0, 0, 1), (0, 1, 1), (0, 2, 1)))


def build_trace(log_n):
    n = 1 << log_n
    a, b, c = 1, 1, 1
    cols = [[], [], []]
    for _ in range(n):
        cols[0].append(a)
        cols[1].append(b)
        cols[2].append(c)
        a, b, c = b, (a + b) % P, (c * b) % P
    return gl.from_int(np.array(cols, dtype=object))


CFG = st.StarkConfig(lde_factor=4, cap_size=4, num_queries=10, final_fri_size=16)


def test_prove_verify_roundtrip():
    air = fib_mul_air(6)
    trace = build_trace(6)
    proof = st.prove(air, trace, CFG)
    assert st.verify(air, proof, CFG)


def test_verify_rejects_tampered_ood():
    air = fib_mul_air(6)
    proof = st.prove(air, build_trace(6), CFG)
    bad = proof.ood_trace.copy()
    bad[0] = ((bad[0][0] + 1) % P, bad[0][1])
    proof.ood_trace = bad
    assert not st.verify(air, proof, CFG)


def test_verify_rejects_tampered_opening():
    air = fib_mul_air(6)
    proof = st.prove(air, build_trace(6), CFG)
    k = sorted(proof.trace_openings.keys())[0]
    row = list(proof.trace_openings[k])
    row[0] = (row[0] + 1) % P
    proof.trace_openings[k] = row
    assert not st.verify(air, proof, CFG)


def test_verify_rejects_wrong_trace():
    air = fib_mul_air(6)
    n = 1 << 6
    bad_trace = build_trace(6)
    # corrupt one cell mid-trace
    lo = np.asarray(bad_trace.lo).copy()
    lo[2, n // 2] ^= 1
    bad_trace = gl.GF(lo, np.asarray(bad_trace.hi))
    proof = st.prove(air, bad_trace, CFG)
    assert not st.verify(air, proof, CFG)
