"""Narrow-queue sponge region: the in-circuit counterpart of QueueSimulator.

A narrow queue push hashes [enc(20) || old_tail(4)] = 24 values from a FRESH
zero state in 3 rate-8 chunks; the new 4-element tail is the final state's
first lanes (circuit_encodings/src/lib.rs:179-221, the log-query queue flavor
every sorter/demux circuit consumes).

TPU-first layout (mirrors the RAM circuit's tile scheme,
circuits/ram_permutation_circuit.py): a region is `tiles` vertical TILES of
16 columns (12 state lanes + block-validity bv + 3 gated selectors); one
ELEMENT = 3 consecutive Poseidon2 blocks (96 rows) in one tile. Powers of two
are not divisible by 96, so each tile hosts floor(n/96) elements and the
remaining rows are dead (no copy wiring, transitions gated off by bv).

Tail tracking is DENSE, not in the lanes: the running tail lives in 4
register columns of the circuit's dense region (TIN), advanced by a
mux gate `TIN' = A'*TOUT + (1-A')*TIN`, with TIN/TOUT copy-wired to the
element's chunk-3 input lanes 4..7 / output lanes 0..3. Inactive (bv=0)
elements therefore need NO carry constraints at all — their rows are free
witness — which is what lets an output/demux queue absorb an arbitrary
SUBSET of element slots (non-monotone bv) while the tail register skips the
inactive ones.

Per-tile constraints (emitted by `narrow_region_gates`):
  - gated-selector defs g_* = s_* * bv; bv boolean; bv constant within a
    block (ssum) and across an element's 3 chunks (s_chunk_end);
  - Poseidon2 transitions per lane, active only when bv = 1;
  - chunk boundary: capacity lanes carry when bv = 1 (rate lanes are
    overwritten by the next chunk's copy-wired encoding);
  - element boundary (s_elem_end, incl. the cyclic row n-1 -> 0 wrap): a
    VALID next element starts from zero capacity lanes (fresh sponge).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Sequence, Tuple

import numpy as np

from ..ops import goldilocks as gl
from ..ops.poseidon2_params import T
from . import poseidon2_circuit as p2c
from .poseidon2_circuit import ROWS_PER_PERMUTATION

P = gl.P
CHUNKS = 3
ROWS_PER_ELEMENT = CHUNKS * ROWS_PER_PERMUTATION  # 96
TILE_WIDTH = 16  # 12 state + bv + g_lin + g_ext + g_int
ENC_WIDTH = 20   # log-query packed width


@dataclasses.dataclass(frozen=True)
class NarrowGeometry:
    log_n: int
    tiles: int

    @property
    def n(self) -> int:
        return 1 << self.log_n

    @property
    def elements_per_tile(self) -> int:
        return (self.n // ROWS_PER_PERMUTATION) // CHUNKS

    @property
    def capacity(self) -> int:
        """Element slots per region."""
        return self.tiles * self.elements_per_tile

    @property
    def region_width(self) -> int:
        return TILE_WIDTH * self.tiles

    def slot_position(self, s: int) -> Tuple[int, int]:
        """(tile, first row) of element slot s."""
        t, l = divmod(s, self.elements_per_tile)
        return t, ROWS_PER_ELEMENT * l


def _one_minus(alg, x):
    return alg.add_int(alg.mul_int(x, P - 1), 1)


NUM_GATES_PER_TILE = 26


def narrow_region_gates(alg, w, w_next, c, base: int, geo: NarrowGeometry,
                        rc_idx: int, slin: int, sext: int, sint: int,
                        chunk_end: int, elem_end: int) -> List:
    """Gate constraints for one narrow region at column offset `base`.

    Emits geo.tiles * NUM_GATES_PER_TILE constraints."""
    from ..ops.poseidon2_params import get_params
    diag = get_params()["internal_diag"]
    out = []
    rc = [c[rc_idx + i] for i in range(T)]
    s_lin, s_ext, s_int = c[slin], c[sext], c[sint]
    s_ce, s_ee = c[chunk_end], c[elem_end]
    ssum = alg.add(alg.add(s_lin, s_ext), s_int)
    for t in range(geo.tiles):
        b = base + TILE_WIDTH * t
        state = [w[b + i] for i in range(T)]
        nxt = [w_next[b + i] for i in range(T)]
        bv = w[b + 12]
        bv_next = w_next[b + 12]
        g_lin, g_ext, g_int = w[b + 13], w[b + 14], w[b + 15]
        out.append(alg.sub(g_lin, alg.mul(s_lin, bv)))
        out.append(alg.sub(g_ext, alg.mul(s_ext, bv)))
        out.append(alg.sub(g_int, alg.mul(s_int, bv)))
        out.append(alg.sub(alg.mul(bv, bv), bv))
        out.append(alg.mul(ssum, alg.sub(bv_next, bv)))
        out.append(alg.mul(s_ce, alg.sub(bv_next, bv)))
        lin_out = p2c._external_linear_alg(alg, state)
        sboxed = [p2c._pow7_alg(alg, alg.add(state[i], rc[i]))
                  for i in range(T)]
        ext_out = p2c._external_linear_alg(alg, sboxed)
        s_prime = list(state)
        s_prime[0] = sboxed[0]
        int_out = p2c._internal_linear_alg(alg, s_prime, diag)
        for i in range(T):
            t1 = alg.mul(g_lin, alg.sub(nxt[i], lin_out[i]))
            t2 = alg.mul(g_ext, alg.sub(nxt[i], ext_out[i]))
            t3 = alg.mul(g_int, alg.sub(nxt[i], int_out[i]))
            out.append(alg.add(alg.add(t1, t2), t3))
        # chunk boundary: capacity lanes carry within a valid element
        for i in range(8, T):
            out.append(alg.mul(alg.mul(s_ce, bv), alg.sub(nxt[i], state[i])))
        # element boundary (and cyclic wrap): valid elements start fresh
        for i in range(8, T):
            out.append(alg.mul(alg.mul(s_ee, bv_next), nxt[i]))
    return out


def narrow_cadence_const(geo: NarrowGeometry) -> np.ndarray:
    """(n, 2) columns [s_chunk_end, s_elem_end] for the 96-row element
    cadence (shared by every region in the circuit)."""
    n = geo.n
    rows = np.zeros((n, 2), dtype=object)
    live = ROWS_PER_ELEMENT * geo.elements_per_tile
    for r in range(ROWS_PER_PERMUTATION - 1, live, ROWS_PER_PERMUTATION):
        if r % ROWS_PER_ELEMENT == ROWS_PER_ELEMENT - 1:
            rows[r, 1] = 1
        else:
            rows[r, 0] = 1
    rows[n - 1, 1] = 1  # cyclic wrap: row 0 of every tile starts fresh
    return rows


def narrow_region_copy_cycles(
        base: int, geo: NarrowGeometry, slots: int,
        enc_cell: Callable[[int, int], Tuple[int, int]],
        bv_cell: Callable[[int], Tuple[int, int]],
        tin_cell: Callable[[int, int], Tuple[int, int]],
        tout_cell: Callable[[int, int], Tuple[int, int]]) -> List:
    """Static wiring: slot s's rate lanes <- enc_cell(s, j) (j in 0..20),
    chunk-3 lanes 4..7 <- tin_cell(s, k), output lanes 0..3 -> tout_cell,
    bv <- bv_cell(s)."""
    assert slots <= geo.capacity
    cycles = []
    for s in range(slots):
        t, r0 = geo.slot_position(s)
        tb = base + TILE_WIDTH * t
        for j in range(8):
            cycles.append([(tb + j, r0), enc_cell(s, j)])
            cycles.append([(tb + j, r0 + ROWS_PER_PERMUTATION),
                           enc_cell(s, 8 + j)])
        for k in range(4):
            cycles.append([(tb + k, r0 + 2 * ROWS_PER_PERMUTATION),
                           enc_cell(s, 16 + k)])
            cycles.append([(tb + 4 + k, r0 + 2 * ROWS_PER_PERMUTATION),
                           tin_cell(s, k)])
            cycles.append([(tb + k, r0 + ROWS_PER_ELEMENT - 1),
                           tout_cell(s, k)])
        cycles.append([(tb + 12, r0), bv_cell(s)])
    return cycles


def narrow_region_witness(geo: NarrowGeometry, enc: np.ndarray,
                          active: Sequence[int], head: Sequence[int],
                          block_const: np.ndarray
                          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sponge witness for one region.

    enc: (slots, 20) encodings staged per slot (only active slots' values
    are hashed); active: (slots,) 0/1; head: 4-element initial tail.
    block_const: _block_const_rows() (for the gated-selector columns).

    Returns (cols (16*tiles, n), tin (slots+1, 4), tout (slots, 4)):
    tin[s] = tail before slot s, tout[s] = slot s's emitted tail value
    (= tin[s] for inactive slots so the mux gate holds trivially).
    """
    n = geo.n
    slots = enc.shape[0]
    assert slots <= geo.capacity
    cols = np.zeros((geo.region_width, n), dtype=object)
    tin = np.zeros((slots + 1, 4), dtype=object)
    tout = np.zeros((slots, 4), dtype=object)

    from .ram_permutation_circuit import _block_rows_device
    active_idx = [s for s in range(slots) if int(active[s])]
    rows1 = rows2 = None
    if active_idx:
        # chunks 1-2 are tail-independent: batch them on device
        B = len(active_idx)
        c1 = np.array([[int(v) % P for v in enc[s][0:8]] + [0] * 4
                       for s in active_idx], dtype=object)
        rows1 = gl.to_ints(_block_rows_device(gl.from_int(c1)))
        c2 = np.array([[int(v) % P for v in enc[active_idx[i]][8:16]]
                       + list(rows1[i][-1][8:]) for i in range(B)],
                      dtype=object)
        rows2 = gl.to_ints(_block_rows_device(gl.from_int(c2)))
    # chunk 3 consumes the running tail: sequential host chain
    rows3 = {}
    tail = [int(v) % P for v in head]
    ai = 0
    for s in range(slots):
        tin[s] = tail
        tout[s] = tail
        if int(active[s]):
            e = [int(v) % P for v in enc[s]]
            c3_in = np.array([e[16:20] + tail + list(rows2[ai][-1][8:])],
                             dtype=object)
            r3 = gl.to_ints(_block_rows_device(gl.from_int(c3_in)))[0]
            rows3[s] = r3
            tail = [int(v) for v in r3[-1][:4]]
            tout[s] = tail
            ai += 1
    tin[slots] = tail

    # lay rows + bv + gated selectors into the tiles
    ai = 0
    for s in range(slots):
        t, r0 = geo.slot_position(s)
        tb = TILE_WIDTH * t
        if int(active[s]):
            block_rows = np.concatenate([rows1[ai], rows2[ai], rows3[s]],
                                        axis=0)  # (96, 12)
            cols[tb:tb + T, r0:r0 + ROWS_PER_ELEMENT] = block_rows.T
            cols[tb + 12, r0:r0 + ROWS_PER_ELEMENT] = 1
            for k, sc in enumerate((T, T + 1, T + 2)):  # s_lin/s_ext/s_int
                sel = np.tile(block_const[:, sc], CHUNKS)
                cols[tb + 13 + k, r0:r0 + ROWS_PER_ELEMENT] = sel
            ai += 1
        else:
            # free rows; satisfy the copy wiring (enc lanes = staged cells,
            # chunk-3 lanes 4..7 = tin, output lanes 0..3 = tout)
            e = [int(v) % P for v in enc[s]]
            for j in range(8):
                cols[tb + j, r0] = e[j]
                cols[tb + j, r0 + ROWS_PER_PERMUTATION] = e[8 + j]
            for k in range(4):
                cols[tb + k, r0 + 2 * ROWS_PER_PERMUTATION] = e[16 + k]
                cols[tb + 4 + k, r0 + 2 * ROWS_PER_PERMUTATION] = int(tin[s][k])
                cols[tb + k, r0 + ROWS_PER_ELEMENT - 1] = int(tout[s][k])
    return cols, tin, tout
