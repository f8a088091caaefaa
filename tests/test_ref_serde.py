"""Reference-dialect serde: schema compatibility + lossless round-trip.

The reference's artifacts (test_proofs/*.json, setup/base_layer/vk_*.json,
serde_json of boojum Proof/VerificationKey) define the interop schema
(SURVEY §4). ref_serde must emit that key set / nesting / digest shape, and
a round-tripped proof must verify unchanged.
"""

import json
import os

from zkevm_harness_tpu.circuits import flagship as fl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.utils import ref_serde, serde

ART = os.path.join(os.path.dirname(__file__), "..", "test_artifacts")
CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=8, final_fri_size=8)

# key set of a reference base-layer proof body
# (test_proofs/base_layer/basic_circuit_proof_10_0.json)
REFERENCE_PROOF_KEYS = {
    "proof_config", "public_inputs", "witness_oracle_cap",
    "stage_2_oracle_cap", "quotient_oracle_cap", "final_fri_monomials",
    "values_at_z", "values_at_z_omega", "values_at_0",
    "fri_base_oracle_cap", "fri_intermediate_oracles_caps",
    "queries_per_fri_repetition", "pow_challenge", "_marker",
}
REFERENCE_VK_KEYS = {"fixed_parameters", "setup_merkle_tree_cap"}
REFERENCE_FIXED_KEYS = {
    "parameters", "lookup_parameters", "domain_size", "total_tables_len",
    "public_inputs_locations", "extra_constant_polys_for_selectors",
    "table_ids_column_idxes", "quotient_degree", "selectors_placement",
    "fri_lde_factor", "cap_size",
}


def _golden():
    ir = fl.flagship_ir(log_n=6, width=8)
    with open(os.path.join(ART, "flagship_log6_proof.json")) as f:
        proof = serde.proof_from_json(json.load(f), serde.default_registry())
    with open(os.path.join(ART, "flagship_log6_vk.json")) as f:
        vk = json.load(f)
    return ir, vk, proof


def test_proof_export_matches_reference_schema():
    ir, vk, proof = _golden()
    doc = ref_serde.proof_to_reference_json(1, proof, CFG)
    assert list(doc.keys()) == ["MainVM"]
    body = doc["MainVM"]
    # every reference key present; extensions are explicit and documented
    assert REFERENCE_PROOF_KEYS <= set(body.keys())
    extras = set(body.keys()) - REFERENCE_PROOF_KEYS
    assert extras <= {"lookup_oracle_cap", "values_at_z_layout",
                      "query_positions"}
    # digest shape: [u64; 4]
    for row in body["witness_oracle_cap"]:
        assert len(row) == 4 and all(isinstance(v, int) for v in row)
    # ext-field encoding matches {"coeffs": [c0, c1], "_marker": null}
    v = body["values_at_z"][0]
    assert set(v.keys()) == {"coeffs", "_marker"} and len(v["coeffs"]) == 2
    # per-query structure
    q = body["queries_per_fri_repetition"][0]
    assert {"witness_query", "stage_2_query", "quotient_query",
            "setup_query", "fri_queries"} <= set(q.keys())
    # paired-leaf layout (lo ++ hi) with the hi path as an extension
    assert {"leaf_elements", "proof", "sibling_proof"} == \
        set(q["witness_query"].keys())
    assert {"leaf_elements", "proof"} == set(q["fri_queries"][0].keys())
    # proof_config mirrors the reference field set
    assert set(body["proof_config"].keys()) == {
        "fri_lde_factor", "merkle_tree_cap_size", "fri_folding_schedule",
        "security_level", "pow_bits"}
    # the whole document is plain-JSON serializable
    json.dumps(doc)


def test_proof_roundtrip_verifies():
    ir, vk, proof = _golden()
    doc = json.loads(json.dumps(ref_serde.proof_to_reference_json(
        1, proof, CFG)))
    ctype, back = ref_serde.reference_json_to_proof(doc)
    assert ctype == 1
    assert pk.verify(ir, vk, back, CFG)


def test_roundtrip_tamper_rejected():
    ir, vk, proof = _golden()
    doc = ref_serde.proof_to_reference_json(1, proof, CFG)
    doc["MainVM"]["values_at_z"][0]["coeffs"][0] ^= 1
    _, back = ref_serde.reference_json_to_proof(doc)
    assert not pk.verify(ir, vk, back, CFG)


def test_vk_export_matches_reference_schema():
    ir, vk, proof = _golden()
    setup = fl.flagship_setup(ir, CFG)
    doc = ref_serde.vk_to_reference_json(1, ir, setup, CFG)
    body = doc["MainVM"]
    assert set(body.keys()) == REFERENCE_VK_KEYS
    fixed = body["fixed_parameters"]
    assert set(fixed.keys()) == REFERENCE_FIXED_KEYS
    assert fixed["domain_size"] == 1 << ir.log_n
    assert fixed["parameters"]["num_columns_under_copy_permutation"] == \
        ir.num_witness
    assert len(body["setup_merkle_tree_cap"][0]) == 4
    # cap content equals the in-memory VK
    flat = [v for row in body["setup_merkle_tree_cap"] for v in row]
    assert flat == setup.vk()
    json.dumps(doc)


def test_names_match_reference_vk_files():
    # vk_{N}.json wrapper tags, confirmed against /root/reference/setup
    assert ref_serde.circuit_name(1) == "MainVM"
    assert ref_serde.circuit_name(8) == "RAMPermutation"
    assert ref_serde.circuit_name(13) == "L1MessagesHasher"
    for t in range(1, 14):
        assert ref_serde.circuit_type_of(ref_serde.circuit_name(t)) == t
