"""tpu-zkevm-harness: a TPU-native zkEVM proving framework (JAX/XLA/Pallas).

Built from scratch with the capabilities of matter-labs/era-zkevm_test_harness
(see SURVEY.md for the structural analysis of the reference). The compute core
(Goldilocks field, Poseidon2, NTT/LDE, Merkle, FRI, quotient evaluation) is
implemented as batched JAX kernels designed for the TPU MXU/VPU; orchestration
(witness generation, recursion scheduling, artifact store) lives above it.

Layout:
  ops/       field arithmetic, Poseidon2, NTT/LDE, Merkle  (engine room)
  prover/    transcript, FRI, AIR/STARK prove+verify
  witness/   queue simulators, tracer, per-circuit decomposers
  parallel/  device-mesh sharding of NTT / Merkle / proving
  utils/     serde (reference JSON formats), data source (checkpoint/resume)
"""

__version__ = "0.1.0"
