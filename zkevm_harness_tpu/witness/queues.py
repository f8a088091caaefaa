"""Poseidon2 queue/stack simulators + permutation-argument kernels.

TPU-native equivalents of the reference's `circuit_encodings` crate
(circuit_encodings/src/lib.rs:23-787): out-of-circuit queue simulators whose
running sponge tails mirror the in-circuit queue hashing, used by every
witness decomposer; plus the grand-product permutation-argument chains from
src/witness/utils.rs:498-620 (`produce_fs_challenges`,
`compute_grand_product_chains`).

Two simulator flavors, exactly as in the reference:

  - `QueueSimulator` (narrow, lib.rs:92-304): 4-element head/tail commitments.
    Each push hashes [encoding || old_tail] from a FRESH zero state with
    overwrite-mode absorption in rate-8 chunks (one Poseidon2 permutation per
    chunk), then reads the first 4 lanes as the new tail
    (`state_into_commitment::<4>`). Log queries (width 20 -> 24 = 3 rounds)
    ride this flavor.
  - `FullWidthQueueSimulator` (lib.rs:322-507): the sponge state itself (12
    lanes) is the head/tail. Each push overwrite-absorbs the encoding into
    the rate lanes of the CURRENT tail state and permutes; the new tail is
    the full state. Memory / decommittment / recursion queues (width 8 = 1
    round) ride this flavor.

Key TPU re-designs vs the reference:
  - the serial tail hash chain (one Poseidon2 per element —
    ram_permutation.rs:61-71) becomes a `lax.scan` whose body is the batched
    permutation, optionally over many independent queues at once;
  - grand-product chains use `lax.associative_scan` (log-depth prefix
    products) instead of the reference's chunked sequential pass
    (PARALLELIZATION_CHUNK_SIZE = 1<<16, utils.rs:552);
  - sorts ride `jax.lax.sort` with multi-operand lexicographic keys instead
    of rayon par_sort (ram_permutation.rs:50).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import goldilocks as gl
from ..ops import poseidon2 as p2
from ..ops.goldilocks import GF, P
from ..ops.poseidon2_params import RATE, T

TAIL_WIDTH = 4                      # QUEUE_STATE_WIDTH
FULL_STATE_WIDTH = 12               # FULL_SPONGE_QUEUE_STATE_WIDTH
LOG_QUERY_PACKED_WIDTH = 20
MEMORY_QUERY_PACKED_WIDTH = 8


def _absorb_rounds(state: GF, values: GF) -> GF:
    """Overwrite-mode absorption of (..., k*RATE) values: per chunk, set the
    rate lanes and permute (boojum absorb_multiple_rounds with
    AbsorptionModeOverwrite)."""
    k = values.shape[-1]
    assert k % RATE == 0
    for i in range(k // RATE):
        chunk = values[..., i * RATE:(i + 1) * RATE]
        lo = state.lo.at[..., :RATE].set(chunk.lo)
        hi = state.hi.at[..., :RATE].set(chunk.hi)
        state = p2.permute(GF(lo, hi))
    return state


@jax.jit
def simulate_tails(encodings: GF, initial_tail: GF) -> GF:
    """Narrow-queue chain: tails[i+1] = P2_absorb(zeros, enc_i || tails[i])[:4].

    encodings: (..., n, W) with (W + 4) % 8 == 0 (callers pad otherwise);
    initial_tail: (..., 4). Returns tails: (..., n+1, 4), tails[0] = initial.
    Mirrors QueueSimulator::push (circuit_encodings/src/lib.rs:179-221).
    """
    n = encodings.shape[-2]
    batch = encodings.shape[:-2]

    def body(tail, enc):
        to_hash = gl.concatenate([enc, tail], axis=-1)
        state = gl.zeros(batch + (T,))
        state = _absorb_rounds(state, to_hash)
        new_tail = state[..., :TAIL_WIDTH]
        return new_tail, new_tail

    enc_scan = GF(jnp.moveaxis(encodings.lo, -2, 0), jnp.moveaxis(encodings.hi, -2, 0))
    _, tails = jax.lax.scan(body, initial_tail, enc_scan)
    tails = GF(jnp.moveaxis(tails.lo, 0, -2), jnp.moveaxis(tails.hi, 0, -2))
    init = GF(initial_tail.lo[..., None, :], initial_tail.hi[..., None, :])
    return gl.concatenate([init, tails], axis=-2)


@jax.jit
def simulate_states_full(encodings: GF, initial_state: GF) -> GF:
    """Full-width chain: state[i+1] = P2(overwrite(state[i], enc_i)).

    encodings: (..., n, W) with W % 8 == 0; initial_state: (..., 12).
    Returns states: (..., n+1, 12). Mirrors FullWidthQueueSimulator::push
    (circuit_encodings/src/lib.rs:391-429).
    """
    def body(state, enc):
        new_state = _absorb_rounds(state, enc)
        return new_state, new_state

    enc_scan = GF(jnp.moveaxis(encodings.lo, -2, 0), jnp.moveaxis(encodings.hi, -2, 0))
    _, states = jax.lax.scan(body, initial_state, enc_scan)
    states = GF(jnp.moveaxis(states.lo, 0, -2), jnp.moveaxis(states.hi, 0, -2))
    init = GF(initial_state.lo[..., None, :], initial_state.hi[..., None, :])
    return gl.concatenate([init, states], axis=-2)


@dataclasses.dataclass
class QueueState:
    """Observable queue state (head/tail commitments + length), as exact ints.

    Mirrors the closed-form-input queue states of the reference (narrow: 4
    elements; full-width: 12 elements)."""

    head: Tuple[int, ...] = (0, 0, 0, 0)
    tail: Tuple[int, ...] = (0, 0, 0, 0)
    length: int = 0


class _SimulatorBase:
    """Shared push/split/merge plumbing; subclasses define the tail chain."""

    STATE_WIDTH = TAIL_WIDTH

    def __init__(self, encodings: Optional[np.ndarray] = None,
                 head: Optional[Tuple[int, ...]] = None,
                 width: int = MEMORY_QUERY_PACKED_WIDTH):
        self.width = int(width)
        self.encodings = (np.zeros((0, self.width), dtype=object)
                          if encodings is None else encodings)
        assert self.encodings.shape[1] == self.width
        self.head = tuple(head) if head is not None else (0,) * self.STATE_WIDTH
        assert len(self.head) == self.STATE_WIDTH
        self._tails: Optional[np.ndarray] = None  # (n+1, STATE_WIDTH) cache

    def __len__(self):
        return self.encodings.shape[0]

    def push(self, encoding):
        enc = np.array([[int(v) % P for v in encoding]], dtype=object)
        assert enc.shape[1] == self.width
        self.encodings = np.concatenate([self.encodings, enc], axis=0)
        self._tails = None

    def push_many(self, encodings):
        enc = np.array([[int(v) % P for v in row] for row in encodings],
                       dtype=object)
        if len(enc) == 0:
            return
        self.encodings = np.concatenate(
            [self.encodings, enc.reshape(-1, self.width)], axis=0)
        self._tails = None

    def _run_chain(self) -> np.ndarray:
        raise NotImplementedError

    def tails(self) -> np.ndarray:
        """(n+1, STATE_WIDTH) int array of states (tails[0] = head state)."""
        if self._tails is None:
            if len(self) == 0:
                self._tails = np.array([list(self.head)], dtype=object)
            else:
                self._tails = self._run_chain()
        return self._tails

    def states(self) -> np.ndarray:
        return self.tails()

    @property
    def tail(self) -> Tuple[int, ...]:
        return tuple(int(v) for v in self.tails()[-1])

    def state(self) -> QueueState:
        return QueueState(head=self.head, tail=self.tail, length=len(self))

    def split_by(self, chunk: int) -> List["_SimulatorBase"]:
        """Split into chunks of `chunk` items; chunk i's head is the parent's
        tail after i*chunk items (circuit_encodings/src/lib.rs:268-307)."""
        tails = self.tails()
        out = []
        for start in range(0, max(len(self), 1), chunk):
            sub = type(self)(self.encodings[start:start + chunk],
                             head=tuple(int(v) for v in tails[start]),
                             width=self.width)
            sub._tails = tails[start:start + min(chunk, len(self) - start) + 1]
            out.append(sub)
        return out

    @classmethod
    def merge(cls, a: "_SimulatorBase", b: "_SimulatorBase") -> "_SimulatorBase":
        """Concatenate; requires b.head == a.tail (lib.rs:152-165)."""
        assert tuple(b.head) == tuple(a.tail), "queue continuity broken"
        assert a.width == b.width
        return cls(np.concatenate([a.encodings, b.encodings], axis=0),
                   head=a.head, width=a.width)


class QueueSimulator(_SimulatorBase):
    """Narrow queue (4-element tail commitments) — log-query flavor.

    API parity with the reference's `QueueSimulator` (push, split_by, merge —
    circuit_encodings/src/lib.rs:92-304). The tail step hashes
    [encoding || old_tail] from a fresh zero state; encodings whose
    (width + 4) is not a rate multiple are zero-padded up to one (all
    reference widths divide exactly: 20 + 4 = 24)."""

    STATE_WIDTH = TAIL_WIDTH

    def __init__(self, encodings: Optional[np.ndarray] = None,
                 head: Optional[Tuple[int, ...]] = None,
                 width: int = LOG_QUERY_PACKED_WIDTH):
        super().__init__(encodings, head, width)

    def _run_chain(self) -> np.ndarray:
        enc = self.encodings
        pad = (-(self.width + TAIL_WIDTH)) % RATE
        if pad:
            # pad the ENCODING so [enc || pad || tail] fills whole rate chunks
            z = np.zeros((enc.shape[0], pad), dtype=object)
            enc = np.concatenate([enc, z], axis=1)
        out = simulate_tails(gl.from_int(enc),
                             gl.from_int(np.array(list(self.head), dtype=object)))
        return gl.to_ints(out)


class FullWidthQueueSimulator(_SimulatorBase):
    """Full-width queue (12-element sponge-state tails) — memory/decommit/
    recursion flavor (circuit_encodings/src/lib.rs:322-507)."""

    STATE_WIDTH = FULL_STATE_WIDTH

    def __init__(self, encodings: Optional[np.ndarray] = None,
                 head: Optional[Tuple[int, ...]] = None,
                 width: int = MEMORY_QUERY_PACKED_WIDTH):
        assert width % RATE == 0
        super().__init__(encodings, head, width)

    def _run_chain(self) -> np.ndarray:
        out = simulate_states_full(
            gl.from_int(self.encodings),
            gl.from_int(np.array(list(self.head), dtype=object)))
        return gl.to_ints(out)


# ---------------------------------------------------------------------------
# Permutation argument kernels
# ---------------------------------------------------------------------------

@jax.jit
def grand_product_chain(terms: GF) -> GF:
    """Inclusive prefix products over the last axis (log-depth).

    Replaces compute_grand_product_chains (src/witness/utils.rs:552+). The
    final element is the grand product; intermediate values feed per-circuit
    FSM continuation witnesses.
    """
    return gl.GF(*jax.lax.associative_scan(
        lambda a, b: tuple(gl.mul(GF(*a), GF(*b))), tuple(terms), axis=-1))


@jax.jit
def sort_by_u64_keys(keys_hi: jax.Array, keys_lo: jax.Array, values: GF):
    """Stable sort of GF values by a (hi, lo) uint32-pair 64-bit key.

    Replaces rayon par_sort in the memory-queue sorter
    (ram_permutation.rs:50 — sort by (location, timestamp)).
    Returns (sorted_hi, sorted_lo, sorted_values, permutation_idx).
    """
    n = keys_hi.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)[:, 0]
    sh, sl, plo, phi, pidx = jax.lax.sort(
        (keys_hi, keys_lo, values.lo, values.hi, idx), num_keys=2, is_stable=True)
    return sh, sl, GF(plo, phi), pidx


def fs_challenge_terms(tuples: GF, challenges: GF, gamma: GF) -> GF:
    """Linear-combination terms for a grand-product permutation argument:
    term_i = gamma + sum_j challenges[j] * tuples[i, j]
    (produce_fs_challenges, src/witness/utils.rs:498-550).

    tuples: (n, k); challenges: (k,); gamma: scalar. Returns (n,).
    """
    n, k = tuples.shape
    ch = gl.broadcast_to(challenges, (n, k))
    prods = gl.mul(tuples, ch)
    s = gl.sum_axis(prods, axis=-1)
    return gl.add(s, gl.broadcast_to(gamma, (n,)))
