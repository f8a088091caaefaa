"""Poseidon2 queue/stack simulators + permutation-argument kernels.

TPU-native equivalents of the reference's `circuit_encodings` crate
(circuit_encodings/src/lib.rs:23-787): out-of-circuit queue simulators whose
running sponge tails mirror the in-circuit queue hashing, used by every
witness decomposer; plus the grand-product permutation-argument chains from
src/witness/utils.rs:498-620 (`produce_fs_challenges`,
`compute_grand_product_chains`).

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

ENCODING_WIDTH = 8  # elements per queue item encoding (sponge rate)
TAIL_WIDTH = 4


@jax.jit
def simulate_tails(encodings: GF, initial_tail: GF) -> GF:
    """Run the sponge chain: tails[i+1] = P2([enc_i || tails[i]])[:4].

    encodings: (..., n, 8); initial_tail: (..., 4).
    Returns tails: (..., n+1, 4) with tails[0] = initial_tail.
    The scan is over the queue axis; all leading axes are independent queues
    hashed in parallel (the witness generator batches per-circuit queues).
    """
    n = encodings.shape[-2]

    def body(tail, enc):
        new_tail = p2.absorb_with_tail(enc, tail)
        return new_tail, new_tail

    enc_scan = GF(jnp.moveaxis(encodings.lo, -2, 0), jnp.moveaxis(encodings.hi, -2, 0))
    last, tails = jax.lax.scan(body, initial_tail, enc_scan)
    tails = GF(jnp.moveaxis(tails.lo, 0, -2), jnp.moveaxis(tails.hi, 0, -2))
    init = GF(initial_tail.lo[..., None, :], initial_tail.hi[..., None, :])
    return gl.concatenate([init, tails], axis=-2)


@dataclasses.dataclass
class QueueState:
    """Observable queue state (head/tail commitments + length), as exact ints.

    Mirrors the closed-form-input queue states of the reference
    (circuit_encodings FullWidthQueueSimulator head/tail/num_items).
    """

    head: Tuple[int, int, int, int] = (0, 0, 0, 0)
    tail: Tuple[int, int, int, int] = (0, 0, 0, 0)
    length: int = 0


class QueueSimulator:
    """Host-level queue simulator holding per-item encodings + sponge states.

    API parity with the reference's `QueueSimulator`/`RecursionQueueSimulator`
    (push, pop, split_by, merge — circuit_encodings/src/lib.rs:122-307). The
    heavy hashing runs through the batched device kernel; intermediate tails
    are cached for witness emission.
    """

    def __init__(self, encodings: Optional[np.ndarray] = None,
                 head: Tuple[int, ...] = (0, 0, 0, 0)):
        # encodings: (n, 8) object ints
        self.encodings = (np.zeros((0, ENCODING_WIDTH), dtype=object)
                          if encodings is None else encodings)
        self.head = tuple(head)
        self._tails: Optional[np.ndarray] = None  # (n+1, 4) cache

    def __len__(self):
        return self.encodings.shape[0]

    def push(self, encoding):
        enc = np.array([[int(v) % P for v in encoding]], dtype=object)
        assert enc.shape[1] == ENCODING_WIDTH
        self.encodings = np.concatenate([self.encodings, enc], axis=0)
        self._tails = None

    def push_many(self, encodings):
        enc = np.array([[int(v) % P for v in row] for row in encodings],
                       dtype=object)
        if len(enc) == 0:
            return
        self.encodings = np.concatenate([self.encodings, enc.reshape(-1, ENCODING_WIDTH)],
                                        axis=0)
        self._tails = None

    def tails(self) -> np.ndarray:
        """(n+1, 4) int array of sponge tails (tails[0] = head state)."""
        if self._tails is None:
            if len(self) == 0:
                self._tails = np.array([list(self.head)], dtype=object)
            else:
                enc = gl.from_int(self.encodings)
                init = gl.from_int(np.array(list(self.head), dtype=object))
                out = simulate_tails(enc, init)
                self._tails = gl.to_ints(out)
        return self._tails

    @property
    def tail(self) -> Tuple[int, ...]:
        return tuple(int(v) for v in self.tails()[-1])

    def state(self) -> QueueState:
        return QueueState(head=self.head, tail=self.tail, length=len(self))

    def split_by(self, chunk: int) -> List["QueueSimulator"]:
        """Split into chunks of `chunk` items; chunk i's head is the parent's
        tail after i*chunk items (circuit_encodings/src/lib.rs:268-307)."""
        tails = self.tails()
        out = []
        for start in range(0, max(len(self), 1), chunk):
            sub = QueueSimulator(self.encodings[start:start + chunk],
                                 head=tuple(int(v) for v in tails[start]))
            sub._tails = tails[start:start + min(chunk, len(self) - start) + 1]
            out.append(sub)
        return out

    @staticmethod
    def merge(a: "QueueSimulator", b: "QueueSimulator") -> "QueueSimulator":
        """Concatenate; requires b.head == a.tail (lib.rs:152-165)."""
        assert tuple(b.head) == tuple(a.tail), "queue continuity broken"
        merged = QueueSimulator(np.concatenate([a.encodings, b.encodings], axis=0),
                                head=a.head)
        return merged


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
