"""Capacity estimation: max cycles-per-instance fitting the trace budget.

Parity with src/capacity_estimator.rs (SURVEY L9): per circuit type, binary
search the largest "cycles per circuit" such that the synthesized trace fits
in 2^19 usable rows of a 2^20 CS (`compute_size_inner`, :13-110), plus the
geometry-config generator that runs every estimator and emits the committed
`GeometryConfig` (src/geometry_config_generator/main.rs).

Row-cost models are pluggable: the committed reference capacities
(circuit_sequencer_api geometry_config.rs:5-19) were produced against the
zkEVM gate library; until that library lands, cost models calibrated to those
values keep the tooling exercised end-to-end.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

from .types import GeometryConfig, TARGET_CIRCUIT_TRACE_LENGTH

USABLE_ROWS_LOG = 19  # trace must fit 2^19 rows of the 2^20 CS
USABLE_ROWS = 1 << USABLE_ROWS_LOG


def binary_search_capacity(rows_for: Callable[[int], int],
                           max_capacity: int = 1 << 20,
                           row_budget: int = USABLE_ROWS) -> int:
    """Largest capacity c with rows_for(c) <= row_budget (c >= 1)."""
    assert rows_for(1) <= row_budget, "even one cycle does not fit"
    lo, hi = 1, max_capacity
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if rows_for(mid) <= row_budget:
            lo = mid
        else:
            hi = mid - 1
    return lo


@dataclasses.dataclass(frozen=True)
class LinearCostModel:
    """rows(c) = fixed_rows + rows_per_cycle * c."""

    fixed_rows: int
    rows_per_cycle: float

    def __call__(self, c: int) -> int:
        return int(self.fixed_rows + self.rows_per_cycle * c)


def calibrated_cost_models() -> Dict[str, LinearCostModel]:
    """Cost models calibrated so the search reproduces the committed
    reference capacities (geometry_config.rs values)."""
    targets = {
        "cycles_per_vm_snapshot": 5585,
        "cycles_per_code_decommitter_sorter": 117500,
        "cycles_per_log_demuxer": 58750,
        "cycles_per_storage_sorter": 46921,
        "cycles_per_events_or_l1_messages_sorter": 31287,
        "cycles_per_ram_permutation": 136714,
        "cycles_per_code_decommitter": 2845,
        "cycles_per_storage_application": 33,
        "cycles_per_keccak256_circuit": 293,
        "cycles_per_sha256_circuit": 2206,
        "cycles_per_ecrecover_circuit": 7,
        "limit_for_l1_messages_pudata_hasher": 774,
    }
    return {name: LinearCostModel(0, USABLE_ROWS / (cap + 0.5))
            for name, cap in targets.items()}


def native_cost_models() -> Dict[str, LinearCostModel]:
    """Row costs DERIVED from this framework's own gate sets — the
    de-circularized estimator (each real circuit declares how many trace
    rows one item costs; fixed rows cover FSM/boundary slots):

      - MainVM: one row per cycle (circuits/main_vm_circuit.py)
      - sorters / demux: region-tiled rows per element
        (circuits/{storage_sorter,events_sorter,log_demux,...}_circuit.py)
      - keccak: 32 rows per permutation; sha256: 66 per compression
      - code decommitter: 66 rows per 2 bytecode words (one sha256
        compression hashes 64 bytes)
      - ecrecover: ~110 ffarith rows per scalar bit x 256 + decomposition
        (circuits/ecrecover_circuit.py builds ~37k rows per recovery)
      - storage application: 12 rows per blake2s compression x 514
        compressions per query (two depth-256 paths + two leaf hashes)
      - L1 hasher: 32 rows per keccak-f block of 88 serialized bytes
    """
    from . import narrow_region as nrr
    rows_per_narrow = nrr.ROWS_PER_PERMUTATION / max(nrr.CHUNKS, 1)
    return {
        "cycles_per_vm_snapshot": LinearCostModel(2, 1.0),
        "cycles_per_code_decommitter_sorter": LinearCostModel(64, 32.0),
        "cycles_per_log_demuxer": LinearCostModel(64, rows_per_narrow),
        "cycles_per_storage_sorter": LinearCostModel(96, 3 * rows_per_narrow),
        "cycles_per_events_or_l1_messages_sorter":
            LinearCostModel(96, 3 * rows_per_narrow),
        "cycles_per_ram_permutation": LinearCostModel(64, 2 * rows_per_narrow),
        "cycles_per_code_decommitter": LinearCostModel(66, 33.0),
        "cycles_per_storage_application": LinearCostModel(0, 12 * 514.0),
        "cycles_per_keccak256_circuit": LinearCostModel(0, 32.0),
        "cycles_per_sha256_circuit": LinearCostModel(0, 66.0),
        "cycles_per_ecrecover_circuit": LinearCostModel(0, 37000.0),
        "limit_for_l1_messages_pudata_hasher":
            LinearCostModel(32, 32.0 * 88 / 136),
    }


def generate_geometry_config(
        cost_models: Dict[str, Callable[[int], int]]) -> GeometryConfig:
    """Run all estimators (geometry_config_generator parity)."""
    caps = {name: binary_search_capacity(model)
            for name, model in cost_models.items()}
    return GeometryConfig(**caps)


def emit_geometry_module(config: GeometryConfig) -> str:
    """Code-gen the committed geometry file (codegen-crate parity)."""
    lines = ["# generated by circuits/capacity.py — do not edit",
             "from zkevm_harness_tpu.circuits.types import GeometryConfig",
             "", "GEOMETRY = GeometryConfig("]
    for f in dataclasses.fields(config):
        lines.append(f"    {f.name}={getattr(config, f.name)},")
    lines.append(")")
    return "\n".join(lines) + "\n"
