"""Batched Poseidon2 permutation + sponge over Goldilocks (JAX).

TPU-native replacement for boojum's `Poseidon2Goldilocks` /
`GoldilocksPoseidon2Sponge<AbsorptionModeOverwrite>` as used by the reference
harness for queue simulators (circuit_encodings width-12 sponge), Merkle tree
hashing, transcripts and public-input commitments (src/prover_utils.rs:36-44,
src/witness/utils.rs:269-308).

Design: the permutation is vectorized over arbitrary leading batch dims; the
state is a GF array of shape (..., 12). Round loops use lax.scan with the
round-constant table as the scanned input so the XLA graph stays compact
(fully unrolling 30 rounds of limb arithmetic blows up CPU compile times).
Throughput shape: batch B of states -> one fused program; the hot path for
Merkle trees calls this with B = num_nodes_at_level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl
from .goldilocks import GF
from .poseidon2_params import CAPACITY, M4, R_F, R_P, RATE, T, get_params


@functools.lru_cache(maxsize=None)
def _const_tables():
    p = get_params()
    ext = np.array(p["external_initial"] + p["external_final"], dtype=object)  # (R_F, T)
    internal = np.array(p["internal"], dtype=object)  # (R_P,)
    diag = np.array(p["internal_diag"], dtype=object)  # (T,)
    return ext, internal, diag


def _external_linear(x: GF) -> GF:
    """y = circ(2*M4, M4, M4) @ x over the last axis (size 12)."""
    chunks = [x[..., 4 * i:4 * (i + 1)] for i in range(3)]
    mixed = [gl.dot_const_matrix(M4, c) for c in chunks]
    total = gl.add(gl.add(mixed[0], mixed[1]), mixed[2])
    return gl.concatenate([gl.add(m, total) for m in mixed], axis=-1)


def _internal_linear(x: GF, diag: GF) -> GF:
    """y_i = mu_i * x_i + sum_j x_j  (all-ones + diag matrix)."""
    total = gl.sum_axis(x, axis=-1)
    scaled = gl.mul(x, diag)
    return gl.add(scaled, gl.broadcast_to(GF(total.lo[..., None], total.hi[..., None]),
                                          x.shape))


def _dispatching_permute(state: GF) -> GF:
    """Poseidon2 permutation on state (..., 12).

    Dispatch is trace-time static: with ZKTPU_PALLAS=1 on TPU, batches
    that tile the Pallas block go through the VMEM-resident kernel;
    everything else uses the scanned XLA path (which XLA:TPU already
    keeps VMEM-resident at prover batches — measured 27x FASTER than the
    Pallas kernel, tools/kernel_bench.py, hence the opt-in default).
    Both are bit-identical (tests/test_pallas.py) so proofs and goldens
    do not depend on the route.
    """
    from . import pallas_kernels as pks
    if pks.poseidon2_supported(state.shape):
        return pks.pallas_poseidon2_permute(state)
    return _permute_xla(state)


# the inner jitted computation must keep the NAME `permute`: nested pjit
# computation names land in the persistent-cache key, and renaming it
# invalidated every cached TPU prove kernel (observed 2026-08-20 — the
# 2^19x130 commit kernel recompiled after a pure refactor)
@jax.jit
def permute(state: GF) -> GF:
    assert state.shape[-1] == T
    ext_np, int_np, diag_np = _const_tables()
    ext_rc = gl.from_int(ext_np)          # (R_F, T)
    int_rc = gl.from_int(int_np)          # (R_P,)
    diag = gl.broadcast_to(gl.from_int(diag_np), state.shape)

    state = _external_linear(state)

    half = R_F // 2

    def ext_round(carry, rc):
        s = gl.add(carry, gl.broadcast_to(rc, carry.shape))
        s = gl.pow7(s)
        return _external_linear(s), 0

    def int_round(carry, rc):
        lane0 = gl.add(carry[..., 0], gl.broadcast_to(rc, carry[..., 0].shape))
        lane0 = gl.pow7(lane0)
        s = GF(carry.lo.at[..., 0].set(lane0.lo), carry.hi.at[..., 0].set(lane0.hi))
        return _internal_linear(s, diag), 0

    state, _ = jax.lax.scan(ext_round, state, ext_rc[:half])
    state, _ = jax.lax.scan(int_round, state, int_rc)
    state, _ = jax.lax.scan(ext_round, state, ext_rc[half:])
    return state


_permute_xla = permute
permute = _dispatching_permute


# ---------------------------------------------------------------------------
# Fixed-width hashing (Merkle / queue flavor)
# ---------------------------------------------------------------------------

def hash_two_to_one(left: GF, right: GF) -> GF:
    """Node hash: absorb [left(4) || right(4)] into the rate, one permutation.

    left/right: (..., 4) digests. Returns (..., 4).
    """
    batch = left.shape[:-1]
    state = gl.zeros(batch + (T,))
    state = _overwrite(state, gl.concatenate([left, right], axis=-1), 0)
    state = permute(state)
    return state[..., :CAPACITY]


def _absorb_scan_body(state: GF, chunk: GF):
    state = _overwrite(state, chunk, 0)
    return permute(state), 0


@functools.partial(jax.jit)
def _hash_chunks_scanned(state: GF, chunks: GF) -> GF:
    """Scan overwrite-absorb over (k, ..., RATE) chunks in ONE dispatch."""
    state, _ = jax.lax.scan(_absorb_scan_body, state, chunks)
    return state


def hash_elements(elems: GF) -> GF:
    """Variable-length hash of (..., n) field elements -> (..., 4) digest.

    Overwrite-mode absorption in rate-8 chunks, zero padding (matches the
    reference's fixed-shape usage where n is a static per-circuit constant).

    Long EAGER inputs (witness-side digests over 100k+ elements, e.g.
    main_vm.draw_vm_challenges) go through ONE scanned kernel instead of a
    Python loop of per-chunk dispatches (the r3 bench's 95-second hot spot).
    Traced callers keep the unrolled loop so every existing jitted graph —
    and its persistent compile-cache entry — stays bit-identical.
    """
    batch = elems.shape[:-1]
    n = elems.shape[-1]
    pad = (-n) % RATE
    if pad:
        elems = gl.concatenate([elems, gl.zeros(batch + (pad,))], axis=-1)
    n_chunks = elems.shape[-1] // RATE
    state = gl.zeros(batch + (T,))
    eager = not isinstance(elems.lo, jax.core.Tracer)
    if eager and n_chunks >= 16:
        nd = elems.lo.ndim
        chunks_lo = jnp.moveaxis(
            elems.lo.reshape(batch + (n_chunks, RATE)), nd - 1, 0)
        chunks_hi = jnp.moveaxis(
            elems.hi.reshape(batch + (n_chunks, RATE)), nd - 1, 0)
        return _hash_chunks_scanned(state,
                                    GF(chunks_lo, chunks_hi))[..., :CAPACITY]
    for i in range(n_chunks):
        chunk = elems[..., i * RATE:(i + 1) * RATE]
        state = _overwrite(state, chunk, 0)
        state = permute(state)
    return state[..., :CAPACITY]


def _overwrite(state: GF, values: GF, offset: int) -> GF:
    k = values.shape[-1]
    lo = state.lo.at[..., offset:offset + k].set(values.lo)
    hi = state.hi.at[..., offset:offset + k].set(values.hi)
    return GF(lo, hi)


def full_width_absorb(state: GF, encoding: GF) -> GF:
    """Full-width queue step: overwrite the rate lanes with the encoding and
    permute (boojum AbsorptionModeOverwrite as used by
    FullWidthQueueSimulator, circuit_encodings/src/lib.rs:391-429).

    state: (..., 12); encoding: (..., 8) -> new state (..., 12).
    """
    return permute(_overwrite(state, encoding, 0))
