"""Code-decommittments sorter circuit: REAL base-layer gate set (type 2).

Proves, for one instance of the decommit-request sort+dedup argument
(reference: circuit_definitions base_layer code_decommitts_sorter + the
witness decomposer src/witness/individual_circuits/sort_decommit_requests.rs):

  1. absorbing this instance's segment of the UNSORTED decommit-request queue
     into the full-width Poseidon2 sponge chain takes the segment head state
     to the segment tail state (same for the SORTED queue and the emitted
     OUTPUT queue — decommit queues are full-width 8-limb flavors,
     circuit_encodings/src/decommittment_request.rs:6-84);
  2. two grand products (2 independent challenge repetitions over the 8-limb
     encodings) agree side-by-side: the sorted stream is a permutation of
     the input stream;
  3. the sorted stream strictly increases lexicographically in
     (code_hash, timestamp) — checked limb-wise with a one-hot
     first-difference selector and a 4-byte range check of the deciding
     difference minus one;
  4. dedup semantics: an element's is_fresh flag is 1 exactly when its hash
     differs from the previous sorted element's; repeated requests for the
     same hash must agree on the memory page (the VM hands back the page the
     fresh request allocated); exactly the fresh elements are absorbed into
     the output queue — the feed for the code-decommitter circuit;
  5. FSM continuation: queue states, accumulators, item counts, and the
     previous instance's last sorted entry are public inputs, so a chain of
     instances covers an unbounded request stream (SURVEY §5 long-context).

TPU-first layout mirrors circuits/ram_permutation_circuit.py: three
full-width sponge strips of `tiles_per_queue` vertical tiles each (input,
sorted, output), one Poseidon2 block of the 32-row cadence per element, plus
a dense region with one row per element. The output strip's bv is the
EMIT flag (non-monotone across blocks — invalid blocks carry the running
state, so fresh elements can be absorbed with gaps and the final tail is
still exact).

Comparison-limb soundness: hash words h0..h2 and the timestamp are extracted
from packed limbs 0..2 with byte-lookup decompositions; limbs 3..7 are the
raw hash words h3..h7, bounded < 2^32 transitively: the permutation argument
ties every sorted element to an input element, and the input queue's tail is
cross-checked by the scheduler against the VM's committed request queue,
whose encodings are genuine (< 2^32 per word) by construction.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..ops import goldilocks as gl
from ..ops.poseidon2_params import T, get_params
from ..prover import plonkish as pk
from . import poseidon2_circuit as p2c
from .poseidon2_circuit import ROWS_PER_PERMUTATION
from .ram_permutation_circuit import _block_rows_device

P = gl.P
TILE_WIDTH = 16          # 12 state + bv + g_lin + g_ext + g_int
NUM_CHALLENGES = 18      # 2 repetitions x (8 per-lane + gamma)
NUM_CMP = 9              # comparison limbs: h7..h0 (BE), then timestamp


class _D:
    """Dense-region column offsets."""
    CH = 0
    U_ENC = 18
    S_ENC = 26
    O_ENC = 34
    ACC = 42       # lhs0, rhs0, lhs1, rhs1
    V = 46
    CNT = 47
    OCNT = 48
    EMIT = 49
    HB0 = 50       # 4 bytes of hash word h0 (limb 0 low 32)
    HB1 = 54       # 4 bytes of h1
    HB2 = 58       # 4 bytes of h2
    PB = 62        # 4 memory-page bytes
    TB = 66        # 4 timestamp bytes
    FB = 70        # is_fresh flag (bit 48 of limb 2)
    DSEL = 71      # 9 one-hot first-difference selectors
    DB = 80        # 4 bytes of deciding diff minus 1


DENSE_WIDTH = 84

# const columns: 12 poseidon rc + s_lin/s_ext/s_int + s_d + s_q + s_end + s_wrap
C_RC = 0
C_SLIN, C_SEXT, C_SINT = T, T + 1, T + 2
C_SD, C_SQ, C_SEND, C_SWRAP = T + 3, T + 4, T + 5, T + 6
NUM_CONST = T + 7


@dataclasses.dataclass(frozen=True)
class DecommittsGeometry:
    log_n: int
    tiles_per_queue: int

    @property
    def n(self) -> int:
        return 1 << self.log_n

    @property
    def blocks_per_tile(self) -> int:
        return self.n // ROWS_PER_PERMUTATION

    @property
    def capacity(self) -> int:
        """Requests per instance (cycles_per_code_decommitter_sorter
        analogue, geometry_config.rs)."""
        return self.tiles_per_queue * self.blocks_per_tile

    @property
    def num_tiles(self) -> int:
        return 3 * self.tiles_per_queue

    @property
    def dense_base(self) -> int:
        return TILE_WIDTH * self.num_tiles

    @property
    def num_witness(self) -> int:
        return self.dense_base + DENSE_WIDTH


def _one_minus(alg, x):
    return alg.add_int(alg.mul_int(x, P - 1), 1)


def _strip_gates(alg, w, w_next, c, geo: DecommittsGeometry, strip: int,
                 diag) -> List:
    """Sponge constraints for one queue strip (tiles_per_queue tiles)."""
    out = []
    rc = c[:T]
    s_lin, s_ext, s_int = c[C_SLIN], c[C_SEXT], c[C_SINT]
    s_end, s_wrap = c[C_SEND], c[C_SWRAP]
    ssum = alg.add(alg.add(s_lin, s_ext), s_int)
    first = strip * geo.tiles_per_queue
    for t in range(first, first + geo.tiles_per_queue):
        b = TILE_WIDTH * t
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
        lin_out = p2c._external_linear_alg(alg, state)
        sboxed = [p2c._pow7_alg(alg, alg.add(state[i], rc[i]))
                  for i in range(T)]
        ext_out = p2c._external_linear_alg(alg, sboxed)
        s_prime = list(state)
        s_prime[0] = sboxed[0]
        int_out = p2c._internal_linear_alg(alg, s_prime, diag)
        carry_sel = alg.mul(ssum, _one_minus(alg, bv))
        for i in range(T):
            t1 = alg.mul(g_lin, alg.sub(nxt[i], lin_out[i]))
            t2 = alg.mul(g_ext, alg.sub(nxt[i], ext_out[i]))
            t3 = alg.mul(g_int, alg.sub(nxt[i], int_out[i]))
            t4 = alg.mul(carry_sel, alg.sub(nxt[i], state[i]))
            out.append(alg.add(alg.add(t1, t2), alg.add(t3, t4)))
        # block boundary: capacity lanes carry; rate lanes carry into an
        # invalid next block
        for i in range(8, T):
            out.append(alg.mul(s_end, alg.sub(nxt[i], state[i])))
        inval_next = alg.mul(s_end, _one_minus(alg, bv_next))
        for i in range(8):
            out.append(alg.mul(inval_next, alg.sub(nxt[i], state[i])))
    # cross-tile chaining at row n-1
    for t in range(first, first + geo.tiles_per_queue - 1):
        cur = TILE_WIDTH * t
        suc = TILE_WIDTH * (t + 1)
        bv_succ = w_next[suc + 12]
        for i in range(8, T):
            out.append(alg.mul(s_wrap, alg.sub(w_next[suc + i], w[cur + i])))
        iv = alg.mul(s_wrap, _one_minus(alg, bv_succ))
        for i in range(8):
            out.append(alg.mul(iv, alg.sub(w_next[suc + i], w[cur + i])))
    return out


GATES_PER_TILE = 29
GATES_PER_CHAIN_LINK = 12


def decommitts_ir(log_n: int, tiles_per_queue: int = 1) -> pk.PlonkishIR:
    geo = DecommittsGeometry(log_n, tiles_per_queue)
    n, cap = geo.n, geo.capacity
    assert cap + 1 <= n, "dense region must fit the trace"
    assert n >= 256, "byte lookup table needs 256 rows"
    diag = get_params()["internal_diag"]
    D = geo.dense_base

    def eval_gates(alg, w, w_next, c):
        out = []
        for strip in range(3):
            out += _strip_gates(alg, w, w_next, c, geo, strip, diag)

        s_d, s_q = c[C_SD], c[C_SQ]
        ch = [w[D + _D.CH + j] for j in range(NUM_CHALLENGES)]
        ch_next = [w_next[D + _D.CH + j] for j in range(NUM_CHALLENGES)]
        u_next = [w_next[D + _D.U_ENC + j] for j in range(8)]
        s_cur = [w[D + _D.S_ENC + j] for j in range(8)]
        s_next = [w_next[D + _D.S_ENC + j] for j in range(8)]
        o_next = [w_next[D + _D.O_ENC + j] for j in range(8)]
        v, v_next = w[D + _D.V], w_next[D + _D.V]
        cnt, cnt_next = w[D + _D.CNT], w_next[D + _D.CNT]
        ocnt, ocnt_next = w[D + _D.OCNT], w_next[D + _D.OCNT]
        emit_next = w_next[D + _D.EMIT]

        for j in range(NUM_CHALLENGES):
            out.append(alg.mul(s_d, alg.sub(ch_next[j], ch[j])))
        out.append(alg.mul(s_d, alg.sub(alg.mul(v_next, v_next), v_next)))
        out.append(alg.mul(s_d, alg.mul(v_next, _one_minus(alg, v))))
        out.append(alg.mul(s_d, alg.sub(cnt_next, alg.add(cnt, v_next))))

        # grand products
        for rep in range(2):
            base = rep * 9
            for k, enc_vals in ((0, u_next), (1, s_next)):
                term = ch[base + 8]
                for j in range(8):
                    term = alg.add(term, alg.mul(ch[base + j], enc_vals[j]))
                gated = alg.add(alg.mul(v_next, term), _one_minus(alg, v_next))
                acc = w[D + _D.ACC + 2 * rep + k]
                acc_n = w_next[D + _D.ACC + 2 * rep + k]
                out.append(alg.mul(s_d, alg.sub(acc_n, alg.mul(acc, gated))))

        # packed-limb decomposition (valid rows, via s_q on rows 1..cap)
        hb0 = [w[D + _D.HB0 + k] for k in range(4)]
        hb1 = [w[D + _D.HB1 + k] for k in range(4)]
        hb2 = [w[D + _D.HB2 + k] for k in range(4)]
        pb = [w[D + _D.PB + k] for k in range(4)]
        tb = [w[D + _D.TB + k] for k in range(4)]
        fb = w[D + _D.FB]
        sqv = alg.mul(s_q, v)

        def le_sum(bytes_, shift=0):
            acc_ = alg.mul_int(bytes_[0], 1 << shift)
            for k in range(1, len(bytes_)):
                acc_ = alg.add(acc_, alg.mul_int(bytes_[k],
                                                 1 << (shift + 8 * k)))
            return acc_

        # limb0 = h0 + pb0<<32 + pb1<<40 + pb2<<48
        l0 = alg.add(le_sum(hb0), le_sum(pb[:3], 32))
        out.append(alg.mul(sqv, alg.sub(s_cur[0], l0)))
        # limb1 = h1 + pb3<<32 + tb0<<40 + tb1<<48
        l1 = alg.add(le_sum(hb1), le_sum([pb[3], tb[0], tb[1]], 32))
        out.append(alg.mul(sqv, alg.sub(s_cur[1], l1)))
        # limb2 = h2 + tb2<<32 + tb3<<40 + fresh<<48
        l2 = alg.add(le_sum(hb2),
                     alg.add(le_sum([tb[2], tb[3]], 32),
                             alg.mul_int(fb, 1 << 48)))
        out.append(alg.mul(sqv, alg.sub(s_cur[2], l2)))
        out.append(alg.mul(s_q, alg.sub(alg.mul(fb, fb), fb)))

        # lexicographic adjacency over (h7..h0, ts), one-hot first-difference
        # selector on the NEXT row describing the step cur -> next
        dsel_n = [w_next[D + _D.DSEL + j] for j in range(NUM_CMP)]
        sdv = alg.mul(s_d, v_next)
        for j in range(NUM_CMP):
            out.append(alg.mul(s_d, alg.sub(alg.mul(dsel_n[j], dsel_n[j]),
                                            dsel_n[j])))
        onesum = dsel_n[0]
        for j in range(1, NUM_CMP):
            onesum = alg.add(onesum, dsel_n[j])
        out.append(alg.mul(sdv, alg.add_int(onesum, P - 1)))

        def cmp_limbs(row_w):
            """Comparison limbs [h7..h3 (raw limbs), h2, h1, h0, ts]."""
            hb0_r = [row_w[D + _D.HB0 + k] for k in range(4)]
            hb1_r = [row_w[D + _D.HB1 + k] for k in range(4)]
            hb2_r = [row_w[D + _D.HB2 + k] for k in range(4)]
            tb_r = [row_w[D + _D.TB + k] for k in range(4)]
            s_r = [row_w[D + _D.S_ENC + j] for j in range(8)]
            return [s_r[7], s_r[6], s_r[5], s_r[4], s_r[3],
                    le_sum(hb2_r), le_sum(hb1_r), le_sum(hb0_r),
                    le_sum(tb_r)]

        L_cur = cmp_limbs(w)
        L_nxt = cmp_limbs(w_next)
        prefix = None
        d_val = None
        for j in range(NUM_CMP):
            diff = alg.sub(L_nxt[j], L_cur[j])
            # limbs strictly before the difference position are equal
            if prefix is None:
                before = _one_minus(alg, dsel_n[j])
            else:
                before = _one_minus(alg, alg.add(prefix, dsel_n[j]))
            out.append(alg.mul(sdv, alg.mul(before, diff)))
            contrib = alg.mul(dsel_n[j], diff)
            d_val = contrib if d_val is None else alg.add(d_val, contrib)
            prefix = dsel_n[j] if prefix is None else alg.add(prefix,
                                                              dsel_n[j])
        # deciding difference >= 1 via d - 1 = 4 bytes (limbs < 2^32 << p)
        db_n = [w_next[D + _D.DB + k] for k in range(4)]
        out.append(alg.mul(sdv, alg.sub(d_val, alg.add_int(le_sum(db_n), 1))))

        # freshness: fresh' = 1 - same_hash' where same_hash' = dsel'[8]
        fb_next = w_next[D + _D.FB]
        out.append(alg.mul(sdv, alg.sub(fb_next,
                                        _one_minus(alg, dsel_n[8]))))
        # same hash => same memory page
        pb_n = [w_next[D + _D.PB + k] for k in range(4)]
        pg_cur = le_sum(pb)
        pg_nxt = le_sum(pb_n)
        out.append(alg.mul(alg.mul(sdv, dsel_n[8]),
                           alg.sub(pg_nxt, pg_cur)))

        # emission: fresh valid rows emit; output encodings equal sorted
        out.append(alg.mul(s_d, alg.sub(emit_next,
                                        alg.mul(v_next, fb_next))))
        out.append(alg.mul(s_d, alg.sub(ocnt_next,
                                        alg.add(ocnt, emit_next))))
        for j in range(8):
            out.append(alg.mul(alg.mul(s_d, emit_next),
                               alg.sub(o_next[j], s_next[j])))
        return out

    n_constraints = (geo.num_tiles * GATES_PER_TILE
                     + 3 * (tiles_per_queue - 1) * GATES_PER_CHAIN_LINK
                     + NUM_CHALLENGES + 3 + 4
                     + 4                       # limb decomposition + fb bool
                     + NUM_CMP + 1 + NUM_CMP + 1  # one-hot + prefix + diff
                     + 1 + 1                   # fresh rule + page agreement
                     + 2 + 8)                  # emit/ocnt + output staging

    pis: List[Tuple[int, int]] = []
    pis += [(D + _D.CH + j, 0) for j in range(NUM_CHALLENGES)]
    for strip in range(3):
        first = TILE_WIDTH * strip * tiles_per_queue
        last = TILE_WIDTH * ((strip + 1) * tiles_per_queue - 1)
        pis += [(first + i, 0) for i in range(8, T)]
        pis += [(last + i, n - 1) for i in range(T)]
    pis += [(D + _D.ACC + k, 0) for k in range(4)]
    pis += [(D + _D.ACC + k, cap) for k in range(4)]
    pis += [(D + _D.V, 0), (D + _D.CNT, 0), (D + _D.CNT, cap),
            (D + _D.OCNT, 0), (D + _D.OCNT, cap)]
    # previous instance's last sorted entry: its comparison context
    pis += [(D + _D.S_ENC + j, 0) for j in range(8)]
    pis += [(D + _D.HB0 + k, 0) for k in range(4)]
    pis += [(D + _D.HB1 + k, 0) for k in range(4)]
    pis += [(D + _D.HB2 + k, 0) for k in range(4)]
    pis += [(D + _D.PB + k, 0) for k in range(4)]
    pis += [(D + _D.TB + k, 0) for k in range(4)]

    byte_table = np.arange(256, dtype=object).reshape(256, 1)
    lookup_cols = ([D + _D.HB0 + k for k in range(4)]
                   + [D + _D.HB1 + k for k in range(4)]
                   + [D + _D.HB2 + k for k in range(4)]
                   + [D + _D.PB + k for k in range(4)]
                   + [D + _D.TB + k for k in range(4)]
                   + [D + _D.DB + k for k in range(4)])
    lookup_sets = tuple((0, (col,)) for col in lookup_cols)

    return pk.PlonkishIR(
        log_n=log_n, num_witness=geo.num_witness, num_const=NUM_CONST,
        gate_degree=8, num_gate_constraints=n_constraints,
        eval_gates=eval_gates, copy_chunk=4,
        public_input_cells=tuple(pis),
        lookup_tables=(byte_table,), lookup_sets=lookup_sets)


def _const_rows(geo: DecommittsGeometry) -> np.ndarray:
    n = geo.n
    rows = np.zeros((n, NUM_CONST), dtype=object)
    block = p2c._block_const_rows()  # (32, 15)
    rows[:, :T + 3] = np.tile(block, (geo.blocks_per_tile, 1))
    cap = geo.capacity
    rows[0:cap, C_SD] = 1
    rows[1:cap + 1, C_SQ] = 1
    for r in range(ROWS_PER_PERMUTATION - 1, n - 1, ROWS_PER_PERMUTATION):
        rows[r, C_SEND] = 1
    rows[n - 1, C_SWRAP] = 1
    return rows


def _copy_cycles(geo: DecommittsGeometry) -> List:
    D = geo.dense_base
    B = geo.blocks_per_tile
    cycles = []
    for q in range(geo.capacity):
        t, b = q // B, q % B
        r = b * ROWS_PER_PERMUTATION
        ub = TILE_WIDTH * t
        sb = TILE_WIDTH * (geo.tiles_per_queue + t)
        ob = TILE_WIDTH * (2 * geo.tiles_per_queue + t)
        for j in range(8):
            cycles.append([(ub + j, r), (D + _D.U_ENC + j, q + 1)])
            cycles.append([(sb + j, r), (D + _D.S_ENC + j, q + 1)])
            cycles.append([(ob + j, r), (D + _D.O_ENC + j, q + 1)])
        cycles.append([(ub + 12, r), (sb + 12, r), (D + _D.V, q + 1)])
        cycles.append([(ob + 12, r), (D + _D.EMIT, q + 1)])
    return cycles


def decommitts_setup(ir: pk.PlonkishIR, geo: DecommittsGeometry,
                     cfg: pk.PlonkishConfig) -> pk.PlonkishSetup:
    const = _const_rows(geo).T
    perm = pk.identity_permutation(ir.num_witness, geo.n)
    perm = pk.apply_copy_cycles(perm, _copy_cycles(geo))
    return pk.build_setup(ir, const, perm, cfg)


# ---------------------------------------------------------------------------
# Witness generation
# ---------------------------------------------------------------------------

def _strip_columns(geo: DecommittsGeometry, encodings: np.ndarray,
                   active: Sequence[int], head_state: Sequence[int]
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sponge witness for one strip with a (possibly gapped) activity mask.

    Returns (state_cols (tiles*12, n), bv_col (tiles, n),
    staged (capacity, 8)): staged[q] is what block q's rate lanes hold at
    the block start — the element encoding for active blocks, the carried
    state for inactive ones (the value the dense O_ENC/U_ENC/S_ENC row must
    mirror to satisfy the static copy wiring).
    """
    n = geo.n
    n_blocks = geo.capacity
    active = [int(a) for a in active]
    count = sum(active)
    from ..witness.queues import simulate_states_full
    if count:
        act_enc = np.array([encodings[q] for q in range(n_blocks)
                            if active[q]], dtype=object).reshape(-1, 8)
        states = gl.to_ints(simulate_states_full(
            gl.from_int(act_enc),
            gl.from_int(np.array(list(head_state), dtype=object))))
    else:
        states = np.array([list(head_state)], dtype=object)
    inputs = np.empty((n_blocks, T), dtype=object)
    staged = np.empty((n_blocks, 8), dtype=object)
    ai = 0
    cur = states[0]
    for q in range(n_blocks):
        if active[q]:
            inputs[q, :8] = encodings[q]
            inputs[q, 8:] = cur[8:]
            staged[q] = encodings[q]
            ai += 1
            cur = states[ai]
        else:
            inputs[q] = cur
            staged[q] = cur[:8]
    rows = gl.to_ints(_block_rows_device(gl.from_int(inputs)))
    ai = 0
    for q in range(n_blocks):
        if not active[q]:
            rows[q] = np.tile(inputs[q][None, :], (ROWS_PER_PERMUTATION, 1))
    if count:
        last_active = max(q for q in range(n_blocks) if active[q])
        # sanity: the chain reproduces the simulator's final state
        got = rows[last_active][-1] if active[last_active] else None
        assert list(got) == list(states[count]), \
            "sponge row expansion diverged from queue simulator"
    state_cols = np.zeros((geo.tiles_per_queue * T, n), dtype=object)
    bv_col = np.zeros((geo.tiles_per_queue, n), dtype=object)
    B = geo.blocks_per_tile
    for t in range(geo.tiles_per_queue):
        chunk = rows[t * B:(t + 1) * B]
        state_cols[t * T:(t + 1) * T, :] = \
            chunk.reshape(B * ROWS_PER_PERMUTATION, T).T
        bv = np.array(active[t * B:(t + 1) * B], dtype=object)
        bv_col[t] = np.repeat(bv, ROWS_PER_PERMUTATION)
    return state_cols, bv_col, staged


@dataclasses.dataclass
class DecommittsInstanceInputs:
    """One instance's closed-form-input payload."""
    unsorted_encodings: np.ndarray  # (count, 8)
    sorted_encodings: np.ndarray    # (count, 8)
    unsorted_head: Tuple[int, ...]  # 12-lane state
    sorted_head: Tuple[int, ...]
    output_head: Tuple[int, ...]
    challenges: Sequence[int]       # 18
    acc_in: Tuple[int, int, int, int]
    cnt_in: int
    ocnt_in: int
    prev_sorted_entry: Optional[Sequence[int]]  # 8-limb enc or None


def _split_limbs(enc: Sequence[int]):
    """(h0..h2 bytes x3, page bytes, ts bytes, fresh) from limbs 0..2."""
    e = [int(v) for v in enc]
    hb0 = [(e[0] >> (8 * k)) & 0xFF for k in range(4)]
    hb1 = [(e[1] >> (8 * k)) & 0xFF for k in range(4)]
    hb2 = [(e[2] >> (8 * k)) & 0xFF for k in range(4)]
    pb = [(e[0] >> (32 + 8 * k)) & 0xFF for k in range(3)] \
        + [(e[1] >> 32) & 0xFF]
    tb = [(e[1] >> (40 + 8 * k)) & 0xFF for k in range(2)] \
        + [(e[2] >> (32 + 8 * k)) & 0xFF for k in range(2)]
    fresh = (e[2] >> 48) & 1
    return hb0, hb1, hb2, pb, tb, fresh


def _cmp_limbs_of(enc: Sequence[int]):
    hb0, hb1, hb2, pb, tb, _ = _split_limbs(enc)
    h0 = sum(b << (8 * k) for k, b in enumerate(hb0))
    h1 = sum(b << (8 * k) for k, b in enumerate(hb1))
    h2 = sum(b << (8 * k) for k, b in enumerate(hb2))
    ts = sum(b << (8 * k) for k, b in enumerate(tb))
    e = [int(v) for v in enc]
    return [e[7], e[6], e[5], e[4], e[3], h2, h1, h0, ts]


def decommitts_witness(ir: pk.PlonkishIR, geo: DecommittsGeometry,
                       inst: DecommittsInstanceInputs) -> gl.GF:
    n, cap = geo.n, geo.capacity
    count = inst.unsorted_encodings.shape[0]
    assert inst.sorted_encodings.shape[0] == count <= cap
    W = np.zeros((ir.num_witness, n), dtype=object)
    D = geo.dense_base

    # per-element flags over the sorted stream
    prev = ([int(v) % P for v in inst.prev_sorted_entry]
            if inst.prev_sorted_entry is not None else [0] * 8)
    prev_cmp = _cmp_limbs_of(prev) if inst.prev_sorted_entry is not None \
        else [0] * NUM_CMP
    emits = []
    dsels = []
    dbytes = []
    for i in range(count):
        cur_cmp = _cmp_limbs_of(inst.sorted_encodings[i])
        j = next((k for k in range(NUM_CMP)
                  if cur_cmp[k] != prev_cmp[k]), None)
        assert j is not None, "duplicate (hash, ts) in sorted stream"
        d = cur_cmp[j] - prev_cmp[j]
        assert 1 <= d < (1 << 32) + 1, "sorted stream out of order"
        _, _, _, _, _, fresh = _split_limbs(inst.sorted_encodings[i])
        assert fresh == (0 if j == NUM_CMP - 1 else 1), \
            "is_fresh flag inconsistent with sort order"
        if j == NUM_CMP - 1:
            # same hash: page must agree with the previous request
            _, _, _, pb_p, _, _ = _split_limbs(
                prev if i == 0 else inst.sorted_encodings[i - 1])
            _, _, _, pb_c, _, _ = _split_limbs(inst.sorted_encodings[i])
            assert pb_p == pb_c, "duplicate request disagrees on page"
        emits.append(fresh)
        dsels.append(j)
        dbytes.append(d - 1)
        prev_cmp = cur_cmp

    # sponge strips
    enc_u = np.zeros((cap, 8), dtype=object)
    enc_s = np.zeros((cap, 8), dtype=object)
    act = [1 if q < count else 0 for q in range(cap)]
    if count:
        enc_u[:count] = inst.unsorted_encodings
        enc_s[:count] = inst.sorted_encodings
    act_o = [emits[q] if q < count else 0 for q in range(cap)]
    u_cols, u_bv, u_staged = _strip_columns(geo, enc_u, act,
                                            inst.unsorted_head)
    s_cols, s_bv, s_staged = _strip_columns(geo, enc_s, act,
                                            inst.sorted_head)
    o_cols, o_bv, o_staged = _strip_columns(geo, enc_s, act_o,
                                            inst.output_head)

    const = _const_rows(geo)
    for t in range(geo.tiles_per_queue):
        for strip, (cols, bvs) in enumerate(
                ((u_cols, u_bv), (s_cols, s_bv), (o_cols, o_bv))):
            tile = strip * geo.tiles_per_queue + t
            base = TILE_WIDTH * tile
            W[base:base + T, :] = cols[t * T:(t + 1) * T]
            W[base + 12, :] = bvs[t]
            for k, sc in enumerate((C_SLIN, C_SEXT, C_SINT)):
                W[base + 13 + k, :] = [int(const[r, sc]) * int(bvs[t][r])
                                       for r in range(n)]

    # dense region
    ch = [int(v) % P for v in inst.challenges]
    assert len(ch) == NUM_CHALLENGES
    for j in range(NUM_CHALLENGES):
        W[D + _D.CH + j, 0:cap + 1] = ch[j]
    W[D + _D.S_ENC:D + _D.S_ENC + 8, 0] = prev
    hb0, hb1, hb2, pb, tb, _ = _split_limbs(prev)
    W[D + _D.HB0:D + _D.HB0 + 4, 0] = hb0
    W[D + _D.HB1:D + _D.HB1 + 4, 0] = hb1
    W[D + _D.HB2:D + _D.HB2 + 4, 0] = hb2
    W[D + _D.PB:D + _D.PB + 4, 0] = pb
    W[D + _D.TB:D + _D.TB + 4, 0] = tb
    W[D + _D.V, 0] = 1
    W[D + _D.CNT, 0] = int(inst.cnt_in)
    W[D + _D.OCNT, 0] = int(inst.ocnt_in)
    acc = [int(a) % P for a in inst.acc_in]
    W[D + _D.ACC:D + _D.ACC + 4, 0] = acc

    for q in range(cap):
        row = q + 1
        valid = q < count
        u = ([int(v) for v in inst.unsorted_encodings[q]] if valid
             else [int(v) for v in u_staged[q]])
        s = ([int(v) for v in inst.sorted_encodings[q]] if valid
             else [int(v) for v in s_staged[q]])
        W[D + _D.U_ENC:D + _D.U_ENC + 8, row] = u
        W[D + _D.S_ENC:D + _D.S_ENC + 8, row] = s
        W[D + _D.O_ENC:D + _D.O_ENC + 8, row] = [int(v) for v in o_staged[q]]
        W[D + _D.V, row] = 1 if valid else 0
        if valid:
            for rep in range(2):
                tu = (ch[rep * 9 + 8] + sum(ch[rep * 9 + j] * u[j]
                                            for j in range(8))) % P
                ts_ = (ch[rep * 9 + 8] + sum(ch[rep * 9 + j] * s[j]
                                             for j in range(8))) % P
                acc[2 * rep] = acc[2 * rep] * tu % P
                acc[2 * rep + 1] = acc[2 * rep + 1] * ts_ % P
        W[D + _D.ACC:D + _D.ACC + 4, row] = acc
        W[D + _D.CNT, row] = int(W[D + _D.CNT, row - 1]) + (1 if valid else 0)
        W[D + _D.EMIT, row] = emits[q] if valid else 0
        W[D + _D.OCNT, row] = int(W[D + _D.OCNT, row - 1]) + \
            int(W[D + _D.EMIT, row])
        if valid:
            hb0, hb1, hb2, pb, tb, fresh = _split_limbs(s)
            W[D + _D.HB0:D + _D.HB0 + 4, row] = hb0
            W[D + _D.HB1:D + _D.HB1 + 4, row] = hb1
            W[D + _D.HB2:D + _D.HB2 + 4, row] = hb2
            W[D + _D.PB:D + _D.PB + 4, row] = pb
            W[D + _D.TB:D + _D.TB + 4, row] = tb
            W[D + _D.FB, row] = fresh
            W[D + _D.DSEL + dsels[q], row] = 1
            for k in range(4):
                W[D + _D.DB + k, row] = (dbytes[q] >> (8 * k)) & 0xFF
    return gl.from_int(W)


def expected_public_inputs(geo: DecommittsGeometry,
                           inst: DecommittsInstanceInputs,
                           u_tail: Sequence[int], s_tail: Sequence[int],
                           o_tail: Sequence[int], acc_out: Sequence[int],
                           cnt_out: int, ocnt_out: int) -> List[int]:
    prev = ([int(v) % P for v in inst.prev_sorted_entry]
            if inst.prev_sorted_entry is not None else [0] * 8)
    out = [int(v) % P for v in inst.challenges]
    for head, tail in ((inst.unsorted_head, u_tail),
                       (inst.sorted_head, s_tail),
                       (inst.output_head, o_tail)):
        out += [int(v) % P for v in list(head)[8:]]
        out += [int(v) % P for v in tail]
    out += [int(v) % P for v in inst.acc_in]
    out += [int(v) % P for v in acc_out]
    out += [1, int(inst.cnt_in), int(cnt_out),
            int(inst.ocnt_in), int(ocnt_out)]
    out += prev
    hb0, hb1, hb2, pb, tb, _ = _split_limbs(prev)
    out += hb0 + hb1 + hb2 + pb + tb
    return out


def instance_inputs(inst_w, challenges: Sequence[int]
                    ) -> DecommittsInstanceInputs:
    """Bridge a witness-side DecommittsCircuitInstance (witness/sorters.py)
    into the circuit payload."""
    return DecommittsInstanceInputs(
        unsorted_encodings=np.asarray(inst_w.unsorted_encodings,
                                      dtype=object),
        sorted_encodings=np.asarray(inst_w.sorted_encodings, dtype=object),
        unsorted_head=tuple(inst_w.unsorted_queue_state[0]),
        sorted_head=tuple(inst_w.sorted_queue_state[0]),
        output_head=tuple(inst_w.output_queue_state[0]),
        challenges=list(challenges),
        acc_in=tuple(inst_w.accumulators_in),
        cnt_in=int(inst_w.num_items_in),
        ocnt_in=int(inst_w.out_items_in),
        prev_sorted_entry=inst_w.prev_sorted_entry)


def instance_public_inputs(geo: DecommittsGeometry, inst_w,
                           challenges: Sequence[int]) -> List[int]:
    inst = instance_inputs(inst_w, challenges)
    return expected_public_inputs(
        geo, inst,
        u_tail=inst_w.unsorted_queue_state[1],
        s_tail=inst_w.sorted_queue_state[1],
        o_tail=inst_w.output_queue_state[1],
        acc_out=inst_w.accumulators_out,
        cnt_out=inst_w.num_items_in + inst_w.num_items,
        ocnt_out=inst_w.out_items_in + inst_w.out_items)
