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

# Persistent XLA compilation cache: the fat fused prover kernels take minutes
# to compile (especially over the remote-compile tunnel) but are fully
# shape-cached; persist them across processes. Opt out with ZKTPU_NO_CACHE=1.
import os as _os

if (not _os.environ.get("ZKTPU_NO_CACHE")
        and _os.environ.get("JAX_PLATFORMS", "") != "cpu"):
    try:
        import jax as _jax

        _cache_dir = _os.environ.get(
            "ZKTPU_CACHE_DIR",
            _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"))
        _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache_dir))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is best-effort
        pass
