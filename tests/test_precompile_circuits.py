"""Precompile circuit artifacts (types 5/6): instance chaining invariants
(host-level — the proving path is covered by the circuit test modules)."""

from zkevm_harness_tpu.witness.precompile_circuits import (
    compute_keccak_circuit_artifacts, compute_sha256_circuit_artifacts)


def test_keccak_instances_chain():
    art = compute_keccak_circuit_artifacts(
        [b"a" * 10, b"b" * 300, b"c"], capacity=2)
    assert art.total_invocations == 5  # 1 + 3 + 1 keccak-f permutations
    assert len(art.instances) == 3
    for a, b in zip(art.instances, art.instances[1:]):
        assert a.acc_out == b.acc_in
        assert a.cnt_out == b.cnt_in
    assert art.instances[0].acc_in == (1, 1)
    assert art.instances[-1].acc_out == art.final_accs
    assert art.instances[-1].cnt_out == art.total_invocations


def test_sha256_instances_chain():
    art = compute_sha256_circuit_artifacts([b"x" * 100, b"y" * 5],
                                           capacity=2)
    assert art.total_invocations == 3  # 2 + 1 compressions
    assert len(art.instances) == 2
    assert art.instances[0].acc_out == art.instances[1].acc_in
    assert art.instances[-1].acc_out == art.final_accs


def test_empty_call_stream_still_yields_one_instance():
    art = compute_keccak_circuit_artifacts([], capacity=4)
    assert len(art.instances) == 1
    assert art.instances[0].invocations == []
    assert art.final_accs == (1, 1)
