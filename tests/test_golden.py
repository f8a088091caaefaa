"""Golden-artifact regression: the checked-in proof must keep verifying.

The reference pins conformance via checked-in setup/ + test_proofs/ JSON
(SURVEY §4 fixtures); this is our equivalent. If an INTENTIONAL protocol
change breaks this test, regenerate with tools/make_golden.py and note the
break in the commit message.
"""

import json
import os

from zkevm_harness_tpu.circuits import flagship as fl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.utils import serde

ART = os.path.join(os.path.dirname(__file__), "..", "test_artifacts")
CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=8, final_fri_size=8)


def test_golden_proof_still_verifies():
    with open(os.path.join(ART, "flagship_log6_vk.json")) as f:
        vk = json.load(f)
    with open(os.path.join(ART, "flagship_log6_proof.json")) as f:
        proof = serde.proof_from_json(json.load(f), serde.default_registry())
    ir = fl.flagship_ir(log_n=6, width=8)
    assert pk.verify(ir, vk, proof, CFG)
    # the setup is deterministic: rebuilding yields the identical VK
    setup = fl.flagship_setup(ir, CFG)
    assert setup.vk() == [int(v) for v in vk]
