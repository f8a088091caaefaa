"""Fiat-Shamir transcript over a Poseidon2 sponge.

TPU-native counterpart of boojum's `GoldilocksPoisedon2Transcript`
(src/prover_utils.rs:40 `TR`): absorb commitments/evaluations as Goldilocks
elements, squeeze base/extension challenges and query indices. Runs host-side
between the big device kernels (the permutation itself is the JAX kernel);
proving is staged, so transcript state transitions are on concrete values.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def _jnp_concat(a, b):
    return jnp.concatenate([a, b])


from ..ops import goldilocks as gl
from ..ops import poseidon2 as p2
from ..ops.poseidon2_params import RATE, T


@jax.jit
def _absorb_chunks_kernel(state: gl.GF, chunks: gl.GF):
    """Scan overwrite-absorb over (k, RATE) chunks in one dispatch."""
    def body(st, enc):
        st = p2._overwrite(st, enc, 0)
        return p2.permute(st), 0

    enc_scan = gl.GF(chunks.lo, chunks.hi)
    state, _ = jax.lax.scan(body, state, enc_scan)
    return state


class Transcript:
    def __init__(self, domain_tag: int = 0):
        state = np.zeros(T, dtype=object)
        state[T - 1] = domain_tag % gl.P
        self._state = gl.from_int(state)
        self._buffer: List[int] = []
        # squeeze window: lanes [0, RATE) of the current state; _sq_idx is
        # the next unread lane (RATE = exhausted/invalidated), _sq_host the
        # lazily-fetched host ints of the window (device draws never fetch)
        self._sq_idx = RATE
        self._sq_host = None
        # duplex semantics: reading challenges does NOT advance the state; a
        # permutation happens lazily only when more than RATE challenges are
        # drawn from one state. This keeps the in-circuit transcript replay
        # (circuits/transcript_gadget.py) a single chained sponge: each
        # absorb block's output lanes ARE the challenges drawn at that point,
        # and the next absorption overwrites the rate lanes.
        self._read_since_permute = False

    # -- absorbing ---------------------------------------------------------

    def absorb_ints(self, values: Sequence[int]):
        self._sq_idx = RATE  # any new absorption invalidates pending squeeze
        self._sq_host = None
        self._read_since_permute = False
        self._buffer.extend(int(v) % gl.P for v in values)
        n_chunks = len(self._buffer) // RATE
        if n_chunks == 0:
            return
        if n_chunks == 1:
            chunk, self._buffer = self._buffer[:RATE], self._buffer[RATE:]
            self._permute_with(chunk)
            return
        flat = self._buffer[:n_chunks * RATE]
        self._buffer = self._buffer[n_chunks * RATE:]
        chunks = gl.from_int(
            [flat[i * RATE:(i + 1) * RATE] for i in range(n_chunks)])
        self._state = _absorb_chunks_kernel(self._state, chunks)

    def absorb_gf(self, values: gl.GF):
        self.absorb_ints([int(v) for v in gl.to_ints(values).ravel()])

    def absorb_gf_device(self, values: gl.GF):
        """Absorb device-resident field elements WITHOUT a host fetch.

        Produces the exact same transcript state as absorb_ints of the same
        values: pending buffered ints are prepended, full rate-chunks are
        permuted in one scanned dispatch, and the sub-chunk remainder is
        fetched (tiny) into the int buffer."""
        self._sq_idx = RATE
        self._sq_host = None
        self._read_since_permute = False
        flat = gl.GF(values.lo.reshape(-1), values.hi.reshape(-1))
        if self._buffer:
            pre = gl.from_int(list(self._buffer))
            self._buffer = []
            flat = gl.GF(
                _jnp_concat(pre.lo, flat.lo), _jnp_concat(pre.hi, flat.hi))
        k = flat.lo.shape[0]
        n_full = k // RATE
        if n_full:
            chunks = gl.GF(flat.lo[:n_full * RATE].reshape(n_full, RATE),
                           flat.hi[:n_full * RATE].reshape(n_full, RATE))
            self._state = _absorb_chunks_kernel(self._state, chunks)
        rem = k - n_full * RATE
        if rem:
            tail = gl.to_u64(gl.GF(flat.lo[n_full * RATE:],
                                   flat.hi[n_full * RATE:]))
            self._buffer.extend(int(v) for v in tail)

    def absorb_ext(self, value: gl.GF2):
        self.absorb_ints([int(gl.to_ints(value.c0)), int(gl.to_ints(value.c1))])

    def _permute_with(self, chunk: Sequence[int]):
        enc = gl.from_int(list(chunk))
        state = p2._overwrite(self._state, enc, 0)
        self._state = p2.permute(state)

    def _flush(self):
        if self._buffer:
            chunk = self._buffer + [0] * (RATE - len(self._buffer))
            self._buffer = []
            self._permute_with(chunk)

    # -- squeezing ---------------------------------------------------------

    def _refill(self):
        self._flush()
        if self._read_since_permute:
            # drawing more than RATE challenges from one state: advance
            self._state = p2.permute(self._state)
        self._sq_idx = 0
        self._sq_host = None
        self._read_since_permute = True

    def _squeeze_one(self) -> int:
        if self._sq_idx >= RATE:
            self._refill()
        if self._sq_host is None:
            self._sq_host = [int(v) for v in gl.to_ints(self._state)[:RATE]]
        v = self._sq_host[self._sq_idx]
        self._sq_idx += 1
        return v

    def _squeeze_one_dev(self) -> gl.GF:
        """Squeeze one lane as a DEVICE scalar — no host fetch, so a long
        challenge->kernel->absorb->challenge chain (the FRI fold loop, the
        prover's stage challenges) dispatches fully async instead of
        draining the device pipeline at every draw (each drain is a full
        round-trip over the remote-TPU tunnel). Exactly the same transcript
        state evolution as _squeeze_one."""
        if self._sq_idx >= RATE:
            self._refill()
        i = self._sq_idx
        self._sq_idx += 1
        return gl.GF(self._state.lo[i], self._state.hi[i])

    def challenge_base(self) -> int:
        return self._squeeze_one()

    def challenge_ext(self) -> gl.GF2:
        """Extension challenge as device scalars (no host fetch)."""
        c0 = self._squeeze_one_dev()
        c1 = self._squeeze_one_dev()
        return gl.GF2(c0, c1)

    def challenge_ext_ints(self):
        return self._squeeze_one(), self._squeeze_one()

    def query_indices(self, count: int, domain_size: int) -> np.ndarray:
        """`count` indices in [0, domain_size); domain_size a power of two.

        Exactly the _squeeze_one chain, but the per-refill host fetch is
        BATCHED: all refill states advance on device first, then ONE
        device_get reads every needed lane (the per-refill fetch was one
        ~0.2 s tunnel round-trip each — ceil(count/RATE) per FRI prove)."""
        mask = domain_size - 1
        assert domain_size & mask == 0
        out = np.empty(count, dtype=np.uint32)
        staged = []  # (state, [(out_index, lane), ...]) in draw order
        for i in range(count):
            if self._sq_idx >= RATE:
                self._refill()
            if self._sq_host is not None:
                out[i] = self._sq_host[self._sq_idx] & mask
            else:
                if not staged or staged[-1][0] is not self._state:
                    staged.append((self._state, []))
                staged[-1][1].append((i, self._sq_idx))
            self._sq_idx += 1
        if staged:
            import jax
            got = jax.device_get([(st.lo, st.hi) for st, _ in staged])
            last_vals = None
            for (st, picks), (lo, hi) in zip(staged, got):
                vals = (np.asarray(lo, dtype=np.uint64)
                        | (np.asarray(hi, dtype=np.uint64) << np.uint64(32)))
                for i, lane in picks:
                    out[i] = int(vals[lane]) & mask
                if st is self._state:
                    last_vals = vals
            if last_vals is not None:
                # keep later scalar draws consistent with the cached-lane
                # protocol (_squeeze_one would have set _sq_host)
                self._sq_host = [int(v) for v in last_vals[:RATE]]
        return out
