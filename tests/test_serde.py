"""Proof JSON serde roundtrip through the file data source."""

import json

import numpy as np

from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.prover import stark as st
from zkevm_harness_tpu.utils import serde
from zkevm_harness_tpu.utils.data_source import LocalFileDataSource


def _toy_proof():
    def eval_transitions(alg, row, nxt):
        return [alg.sub(nxt[0], row[0])]

    air = st.Air(width=1, log_n=4, constraint_degree=1, num_transitions=1,
                 eval_transitions=eval_transitions, boundary=((0, 0, 7),))
    trace = gl.from_int(np.full(16, 7, dtype=object).reshape(1, 16))
    cfg = st.StarkConfig(lde_factor=2, cap_size=2, num_queries=4,
                         final_fri_size=8)
    return air, st.prove(air, trace, cfg), cfg


def test_proof_json_roundtrip(tmp_path):
    air, proof, cfg = _toy_proof()
    data = serde.proof_to_json(proof)
    text = json.dumps(data)  # must be pure JSON
    back = serde.proof_from_json(json.loads(text), serde.default_registry())
    assert isinstance(back, st.StarkProof)
    assert back.ood_trace == proof.ood_trace
    assert back.fri.final_poly == proof.fri.final_poly
    assert list(back.trace_openings.keys()) == list(proof.trace_openings.keys())
    # the decoded proof still verifies
    assert st.verify(air, back, cfg)
    # and flows through the file data source
    ds = LocalFileDataSource(str(tmp_path))
    ds.set_base_layer_proof(data, 1, 0)
    again = serde.proof_from_json(ds.get_base_layer_proof(1, 0),
                                  serde.default_registry())
    assert st.verify(air, again, cfg)
