"""Reference-dialect JSON serialization of proofs and VKs.

The reference persists boojum `Proof`/`VerificationKey` structs with
serde_json (SURVEY §4: the artifacts under `setup/` and `test_proofs/` ARE
the interop contract; schema observed from
/root/reference/test_proofs/base_layer/basic_circuit_proof_10_0.json and
/root/reference/setup/base_layer/vk_1.json). This module emits OUR
PlonkishProof / PlonkishSetup in that schema so a reference-side consumer
sees the same field names, nesting, digest shapes ([u64; 4]), and
extension-field encodings ({"coeffs": [c0, c1], "_marker": null}).

Protocol-structure differences are represented honestly rather than
papered over:
  - our lookup argument commits helper columns in a separate stage-3 oracle
    (boojum folds them into stage 2); when present it exports under the
    extension keys `lookup_oracle_cap` / `lookup_query` / values appended
    to `values_at_z`;
  - `values_at_0` (boojum's logup grand-sum openings at zero) is emitted
    empty: our logup totals are checked inside the quotient identity;
  - `pow_challenge` is 0 (all reference configs use NoPow,
    src/prover_utils.rs prove_*::<NoPow>).

Loaders invert the mapping exactly, so round-tripped proofs verify
unchanged (pinned by tests/test_ref_serde.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from ..circuits.types import BaseLayerCircuitType
from ..prover import fri as fr
from ..prover import plonkish as pk

# Variant names from circuit_definitions base_layer/mod.rs:215-239, as they
# appear as the serde enum tag in setup/base_layer/vk_{1..13}.json.
BASE_CIRCUIT_NAMES: Dict[int, str] = {
    1: "MainVM",
    2: "CodeDecommittmentsSorter",
    3: "CodeDecommitter",
    4: "LogDemuxer",
    5: "KeccakRoundFunction",
    6: "Sha256RoundFunction",
    7: "ECRecover",
    8: "RAMPermutation",
    9: "StorageSorter",
    10: "StorageApplication",
    11: "EventsSorter",
    12: "L1MessagesSorter",
    13: "L1MessagesHasher",
}
_NAME_TO_TYPE = {v: k for k, v in BASE_CIRCUIT_NAMES.items()}


def circuit_name(circuit_type: int) -> str:
    return BASE_CIRCUIT_NAMES[int(BaseLayerCircuitType(circuit_type))]


def circuit_type_of(name: str) -> int:
    return _NAME_TO_TYPE[name]


def _cap(arr: np.ndarray) -> List[List[int]]:
    """(cap, 4) digest array -> [[u64; 4], ...]."""
    a = np.asarray(arr, dtype=object).reshape(-1, 4)
    return [[int(v) for v in row] for row in a]


def _uncap(rows: List[List[int]]) -> np.ndarray:
    return np.array([[int(v) for v in r] for r in rows], dtype=object)


def _ext(values: List[Tuple[int, int]]) -> List[Dict[str, Any]]:
    """[(c0, c1), ...] -> boojum ExtensionField serde form."""
    return [{"coeffs": [int(a), int(b)], "_marker": None} for a, b in values]


def _unext(values: List[Dict[str, Any]]) -> List[Tuple[int, int]]:
    return [(int(v["coeffs"][0]), int(v["coeffs"][1])) for v in values]


def _paths(p: np.ndarray) -> List[List[int]]:
    """(depth, 4) Merkle path -> [[u64; 4], ...] (reference `proof` field)."""
    return [[int(v) for v in row] for row in np.asarray(p, dtype=object)]


def _query(leaf: List[int], path: np.ndarray) -> Dict[str, Any]:
    return {"leaf_elements": [int(v) for v in leaf], "proof": _paths(path)}


def proof_to_reference_json(circuit_type: int, proof: pk.PlonkishProof,
                            cfg: pk.PlonkishConfig, *,
                            security_level: int = 100) -> Dict[str, Any]:
    """Emit a PlonkishProof in the reference test_proofs JSON schema."""
    has_lookup = proof.stage3_cap is not None

    values_at_z = (list(proof.ood_witness) + list(proof.ood_stage2)
                   + (list(proof.ood_stage3) if has_lookup else [])
                   + list(proof.ood_const) + list(proof.ood_sigma)
                   + list(proof.ood_table) + list(proof.ood_quotient))
    values_at_z_omega = (list(proof.ood_witness_next)
                         + list(proof.ood_stage2_next)
                         + (list(proof.ood_stage3_next) if has_lookup
                            else []))

    fri: fr.FriProof = proof.fri
    final_c0 = [int(c0) for c0, _ in fri.final_poly]
    final_c1 = [int(c1) for _, c1 in fri.final_poly]

    # One repetition per FRI query position (reference semantics). Boojum's
    # oracles pair the two fold siblings into ONE leaf (observed: leaf
    # widths are 2x the column counts); our trees commit single rows, so a
    # repetition's leaf_elements are lo-row ++ hi-row and the hi sibling's
    # Merkle path rides the documented `sibling_proof` extension.
    positions = [int(p) for p in fri.query_positions]
    depth = next(iter(proof.paths["witness"].values())).shape[0]
    h0 = (cfg.cap_size << depth) // 2  # half the commitment LDE domain

    def tree_query(tree: str, pos: int) -> Dict[str, Any]:
        lo, hi = pos % h0, pos % h0 + h0
        q = _query(proof.openings[tree][lo] + proof.openings[tree][hi],
                   proof.paths[tree][lo])
        q["sibling_proof"] = _paths(proof.paths[tree][hi])
        return q

    queries = []
    for qi, pos in enumerate(positions):
        entry = {
            "witness_query": tree_query("witness", pos),
            "stage_2_query": tree_query("stage2", pos),
            "quotient_query": tree_query("quotient", pos),
            "setup_query": tree_query("setup", pos),
            "fri_queries": [
                _query([int(v) for v in layer.leaves[qi]],
                       layer.paths[qi])
                for layer in fri.openings
            ],
        }
        if has_lookup:
            entry["lookup_query"] = tree_query("stage3", pos)
        queries.append(entry)

    body: Dict[str, Any] = {
        "proof_config": {
            "fri_lde_factor": cfg.rate,
            "merkle_tree_cap_size": cfg.cap_size,
            "fri_folding_schedule": None,
            "security_level": security_level,
            "pow_bits": 0,
        },
        "public_inputs": [int(v) for v in proof.public_inputs],
        "witness_oracle_cap": _cap(proof.witness_cap),
        "stage_2_oracle_cap": _cap(proof.stage2_cap),
        "quotient_oracle_cap": _cap(proof.quotient_cap),
        "final_fri_monomials": [final_c0, final_c1],
        "values_at_z": _ext(values_at_z),
        "values_at_z_omega": _ext(values_at_z_omega),
        "values_at_0": [],
        "fri_base_oracle_cap": _cap(fri.caps[0]),
        "fri_intermediate_oracles_caps": [_cap(c) for c in fri.caps[1:]],
        "queries_per_fri_repetition": queries,
        "pow_challenge": 0,
        "_marker": None,
    }
    if has_lookup:
        body["lookup_oracle_cap"] = _cap(proof.stage3_cap)
    # loader-side extensions: FRI query positions (the reference re-derives
    # them from the transcript at verify time, as does our verifier —
    # stored for structural round-trip only), and section widths to split
    # values_at_z unambiguously
    body["query_positions"] = positions
    body["values_at_z_layout"] = {
        "witness": len(proof.ood_witness),
        "stage_2": len(proof.ood_stage2),
        "lookup": len(proof.ood_stage3) if has_lookup else 0,
        "constants": len(proof.ood_const),
        "sigmas": len(proof.ood_sigma),
        "tables": len(proof.ood_table),
        "quotient": len(proof.ood_quotient),
    }
    return {circuit_name(circuit_type): body}


def reference_json_to_proof(doc: Dict[str, Any]) -> Tuple[int,
                                                          pk.PlonkishProof]:
    """Invert proof_to_reference_json. Returns (circuit_type, proof)."""
    (name, body), = doc.items()
    lay = body["values_at_z_layout"]
    vz = _unext(body["values_at_z"])
    vzw = _unext(body["values_at_z_omega"])
    has_lookup = "lookup_oracle_cap" in body

    pos = 0

    def take(k: int) -> List[Tuple[int, int]]:
        nonlocal pos
        out = vz[pos:pos + k]
        pos += k
        return out

    ood_witness = take(lay["witness"])
    ood_stage2 = take(lay["stage_2"])
    ood_stage3 = take(lay["lookup"])
    ood_const = take(lay["constants"])
    ood_sigma = take(lay["sigmas"])
    ood_table = take(lay["tables"])
    ood_quotient = take(lay["quotient"])
    assert pos == len(vz), "values_at_z length mismatch"

    ood_witness_next = vzw[:lay["witness"]]
    ood_stage2_next = vzw[lay["witness"]:lay["witness"] + lay["stage_2"]]
    ood_stage3_next = vzw[lay["witness"] + lay["stage_2"]:]
    assert len(ood_stage3_next) == lay["lookup"]

    tree_names = ["witness", "stage2", "quotient", "setup"]
    key_map = {"witness": "witness_query", "stage2": "stage_2_query",
               "quotient": "quotient_query", "setup": "setup_query"}
    if has_lookup:
        tree_names.insert(2, "stage3")
        key_map["stage3"] = "lookup_query"

    openings: Dict[str, Dict[int, List[int]]] = {t: {} for t in tree_names}
    paths: Dict[str, Dict[int, np.ndarray]] = {t: {} for t in tree_names}
    n_fri_layers = len(body["queries_per_fri_repetition"][0]["fri_queries"]) \
        if body["queries_per_fri_repetition"] else 0
    fri_leaves = [[] for _ in range(n_fri_layers)]
    fri_paths = [[] for _ in range(n_fri_layers)]
    positions = [int(p) for p in body["query_positions"]]
    reps = body["queries_per_fri_repetition"]
    depth = len(reps[0]["witness_query"]["proof"]) if reps else 0
    cap_size = int(body["proof_config"]["merkle_tree_cap_size"])
    h0 = (cap_size << depth) // 2
    for qi, entry in enumerate(reps):
        pos = positions[qi]
        lo, hi = pos % h0, pos % h0 + h0
        for t in tree_names:
            q = entry[key_map[t]]
            leaf = [int(v) for v in q["leaf_elements"]]
            half = len(leaf) // 2
            openings[t][lo], openings[t][hi] = leaf[:half], leaf[half:]
            paths[t][lo] = _uncap(q["proof"])
            paths[t][hi] = _uncap(q["sibling_proof"])
        for li, q in enumerate(entry["fri_queries"]):
            fri_leaves[li].append([int(v) for v in q["leaf_elements"]])
            fri_paths[li].append(_uncap(q["proof"]))

    caps = ([_uncap(body["fri_base_oracle_cap"])]
            + [_uncap(c) for c in body["fri_intermediate_oracles_caps"]])
    final_poly = list(zip(body["final_fri_monomials"][0],
                          body["final_fri_monomials"][1]))
    fri_openings = [
        fr.FriLayerOpening(
            leaves=np.array(fri_leaves[li], dtype=object),
            paths=np.array(fri_paths[li], dtype=object))
        for li in range(n_fri_layers)
    ]
    fri_proof = fr.FriProof(
        caps=caps, final_poly=[(int(a), int(b)) for a, b in final_poly],
        openings=fri_openings,
        query_positions=np.array(positions, dtype=np.int64))

    proof = pk.PlonkishProof(
        public_inputs=[int(v) for v in body["public_inputs"]],
        witness_cap=_uncap(body["witness_oracle_cap"]),
        stage2_cap=_uncap(body["stage_2_oracle_cap"]),
        quotient_cap=_uncap(body["quotient_oracle_cap"]),
        ood_witness=ood_witness, ood_witness_next=ood_witness_next,
        ood_stage2=ood_stage2, ood_stage2_next=ood_stage2_next,
        stage3_cap=(_uncap(body["lookup_oracle_cap"]) if has_lookup
                    else None),
        ood_stage3=ood_stage3, ood_stage3_next=ood_stage3_next,
        ood_table=ood_table, ood_const=ood_const, ood_sigma=ood_sigma,
        ood_quotient=ood_quotient,
        openings=openings, paths=paths, fri=fri_proof)
    return circuit_type_of(name), proof


def vk_to_reference_json(circuit_type: int, ir: pk.PlonkishIR,
                         setup: pk.PlonkishSetup,
                         cfg: pk.PlonkishConfig) -> Dict[str, Any]:
    """Emit VK data in the setup/base_layer/vk_N.json schema."""
    lookup_params: Any = "NoLookup"
    if ir.lookup_sets:
        widths = {len(cols) for _, cols in ir.lookup_sets}
        lookup_params = {
            "UseSpecializedColumnsWithTableIdAsConstant": {
                "width": max(widths),
                "num_repetitions": len(ir.lookup_sets),
                "share_table_id": True,
            }
        }
    return {circuit_name(circuit_type): {
        "fixed_parameters": {
            "parameters": {
                "num_columns_under_copy_permutation": ir.num_witness,
                "num_witness_columns": 0,
                "num_constant_columns": ir.num_const,
                "max_allowed_constraint_degree": ir.gate_degree,
            },
            "lookup_parameters": lookup_params,
            "domain_size": 1 << ir.log_n,
            "total_tables_len": int(sum(t.shape[0]
                                        for t in ir.lookup_tables)),
            "public_inputs_locations": [[int(c), int(r)] for c, r
                                        in ir.public_input_cells],
            "extra_constant_polys_for_selectors": 0,
            "table_ids_column_idxes": [],
            "quotient_degree": max(1, ir.gate_degree - 1),
            "selectors_placement": None,
            "fri_lde_factor": cfg.rate,
            "cap_size": cfg.cap_size,
        },
        "setup_merkle_tree_cap": _cap(setup.cap_np),
    }}
