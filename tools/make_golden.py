"""Regenerate golden proof artifacts (test_artifacts/) after intentional
protocol changes. Mirrors the reference's checked-in test_proofs/ fixtures."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

from zkevm_harness_tpu.circuits import flagship as fl
from zkevm_harness_tpu.prover import plonkish as pk
from zkevm_harness_tpu.utils import serde

CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=8, final_fri_size=8)


def main():
    ir = fl.flagship_ir(log_n=6, width=8)
    setup = fl.flagship_setup(ir, CFG)
    witness = fl.flagship_witness(ir, seed=42)
    proof = pk.prove(ir, setup, witness, CFG)
    assert pk.verify(ir, setup.vk(), proof, CFG)
    out = os.path.join(os.path.dirname(__file__), "..", "test_artifacts")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "flagship_log6_vk.json"), "w") as f:
        json.dump(setup.vk(), f)
    with open(os.path.join(out, "flagship_log6_proof.json"), "w") as f:
        json.dump(serde.proof_to_json(proof), f)
    print("golden artifacts written")


if __name__ == "__main__":
    main()
