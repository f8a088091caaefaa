"""Flagship (MainVM-shaped) circuit proves and verifies."""

from zkevm_harness_tpu.circuits import flagship as fl
from zkevm_harness_tpu.prover import plonkish as pk


def test_flagship_small():
    cfg = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=8, final_fri_size=8)
    ir = fl.flagship_ir(log_n=6, width=8)
    setup = fl.flagship_setup(ir, cfg)
    witness = fl.flagship_witness(ir)
    proof = pk.prove(ir, setup, witness, cfg)
    assert pk.verify(ir, setup.vk(), proof, cfg)
