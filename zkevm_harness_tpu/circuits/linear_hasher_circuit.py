"""L1-messages linear-hasher circuit (type 13): an in-circuit keccak256.

The reference circuit (circuit_definitions base_layer L1MessagesHasher +
src/witness/individual_circuits/data_hasher_and_merklizer.rs:8) pops the
deduplicated L1-message queue, hashes the serialized bytes with keccak256,
and exposes the digest. This module proves the FULL SPONGE in-circuit —
unlike the type-5 round-function circuit, consecutive permutations are
chained by constraint (state_in[k+1] = state_out[k] xor block[k+1] on the
17 absorbed lanes, carried capacity lanes), the initial state is pinned to
zero, and the digest limbs are extracted into accumulator columns that the
public inputs expose. The absorbed blocks are bound by the two-rep
fingerprint accumulator (challenge-after-commit, as everywhere); the
host-side byte serialization of queue elements into blocks is the
remaining witness-side step (witness/linear_hasher.py), matching the
reference's split where the queue/byte plumbing wraps this hash core.

Layout (reusing the type-5 bit-column keccak core):
  - 32 rows per keccak-f invocation: rows 0..23 round states, row 24 the
    output, rows 25..31 carry the output state bits forward so the chain
    constraint at row 31 -> 32 sees both the previous output and the next
    block;
  - BLK: 1088 bit columns holding the absorbed block on each absorb row;
  - DIG: 8 u32 digest-limb accumulators, updated at each output row while
    the invocation is valid (so row n-1 holds the digest of the LAST valid
    permutation — keccak256 of the whole stream);
  - fingerprint: acc *= gamma + sum_j blk_limb_j ch^j per absorb row
    (34 u32 limbs per block), 2 independent reps.

One instance covers one linear hash (the reference's capacity is 774
messages ~ 500 permutations per 2^20-row instance, far above any real
block's L1 stream); multi-instance FSM continuation would add a carried-
state fingerprint and is not needed at reference capacities.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from ..ops import goldilocks as gl
from ..prover import plonkish as pk
from ..utils.keccak import _RC, _ROT
from .keccak_circuit import (NUM_BITS, NUM_LANES, NUM_ROUNDS, _PI_INV,
                             _lane_col, _lanes_to_bits, _one_minus, _xor,
                             keccak_round_trace, state_limbs)

P = gl.P
ROWS_PER_INVOCATION = 32
ABSORBED_LANES = 17                 # rate 136 bytes
BLK_BITS = 64 * ABSORBED_LANES      # 1088
NUM_REPS = 2
BLK_LIMBS = 2 * ABSORBED_LANES      # 34 u32 limbs per block
DIGEST_LIMBS = 8                    # first 4 lanes as u32 limbs


class _C:
    """Column offsets."""
    A = 0
    CP = NUM_BITS
    AP = NUM_BITS + 320
    BLK = 2 * NUM_BITS + 320
    DIG = BLK + BLK_BITS
    PCH = DIG + DIGEST_LIMBS
    GAMMA = PCH + NUM_REPS * BLK_LIMBS
    ACC = GAMMA + NUM_REPS
    V = ACC + NUM_REPS
    CNT = V + 1


NUM_WITNESS = _C.CNT + 1

# const columns: s_round, s_absorb, s_out, s_idlecarry (A carried rows
# 24..30), s_chain (row 31 of non-final invocations), s_first (row 0),
# s_acr (acc/cnt carry rows), s_dcr (digest carry rows), s_bend, s_wrap,
# 64 iota RC bits
K_SR, K_SA, K_SO, K_SI, K_SH, K_SF, K_SC, K_SD, K_SB, K_SW = range(10)
K_RC = 10
NUM_CONST = K_RC + 64


@dataclasses.dataclass(frozen=True)
class HasherGeometry:
    log_n: int

    @property
    def n(self) -> int:
        return 1 << self.log_n

    @property
    def capacity(self) -> int:
        """keccak-f permutations per instance."""
        return self.n // ROWS_PER_INVOCATION


def hasher_ir(log_n: int) -> pk.PlonkishIR:
    geo = HasherGeometry(log_n)
    n = geo.n
    assert geo.capacity >= 1

    def eval_gates(alg, w, w_next, c):
        out = []
        s_r, s_a, s_o = c[K_SR], c[K_SA], c[K_SO]
        s_i, s_h, s_f = c[K_SI], c[K_SH], c[K_SF]
        s_c, s_d, s_b, s_w = c[K_SC], c[K_SD], c[K_SB], c[K_SW]

        A = lambda x, y, z: w[_lane_col(x, y, z, _C.A)]
        A_n = lambda x, y, z: w_next[_lane_col(x, y, z, _C.A)]
        CP = lambda x, z: w[_C.CP + 64 * x + z]
        AP = lambda x, y, z: w[_lane_col(x, y, z, _C.AP)]
        BLK_n = lambda l, z: w_next[_C.BLK + 64 * l + z]

        # keccak-f round core (identical to the type-5 circuit)
        for x in range(5):
            for z in range(64):
                p5 = A(x, 0, z)
                for y in range(1, 5):
                    p5 = _xor(alg, p5, A(x, y, z))
                out.append(alg.mul(s_r, alg.sub(CP(x, z), p5)))
        for x in range(5):
            for z in range(64):
                d = _xor(alg, CP((x + 4) % 5, z), CP((x + 1) % 5, (z + 63) % 64))
                for y in range(5):
                    out.append(alg.mul(s_r, alg.sub(
                        AP(x, y, z), _xor(alg, A(x, y, z), d))))

        def B(x, y, z):
            a, b = _PI_INV[(x, y)]
            return AP(a, b, (z - _ROT[a][b]) % 64)

        for x in range(5):
            for y in range(5):
                for z in range(64):
                    chi = _xor(alg, B(x, y, z),
                               alg.mul(_one_minus(alg, B((x + 1) % 5, y, z)),
                                       B((x + 2) % 5, y, z)))
                    if x == 0 and y == 0:
                        chi = _xor(alg, chi, c[K_RC + z])
                    out.append(alg.mul(s_r, alg.sub(A_n(x, y, z), chi)))

        # block booleanity (absorb rows); state booleanity then propagates
        # through the xor chain from the zero initial state
        for b in range(BLK_BITS):
            bit = w[_C.BLK + b]
            out.append(alg.sub(alg.mul(bit, bit), bit))

        # sponge chaining: output state carried through rows 24..30
        for l in range(NUM_LANES):
            for z in range(64):
                a = w[_C.A + 64 * l + z]
                out.append(alg.mul(s_i, alg.sub(
                    w_next[_C.A + 64 * l + z], a)))
        # row 31 -> 32 (next absorb): A_next = A ^ BLK_next (absorbed) or
        # A (capacity), active only while the next invocation is valid
        v, v_n = w[_C.V], w_next[_C.V]
        for l in range(NUM_LANES):
            for z in range(64):
                a = w[_C.A + 64 * l + z]
                a_n = w_next[_C.A + 64 * l + z]
                if l < ABSORBED_LANES:
                    tgt = _xor(alg, a, BLK_n(l, z))
                else:
                    tgt = a
                out.append(alg.mul(alg.mul(s_h, v_n), alg.sub(a_n, tgt)))
        # first absorb: zero initial state
        for l in range(NUM_LANES):
            for z in range(64):
                a = w[_C.A + 64 * l + z]
                if l < ABSORBED_LANES:
                    tgt = w[_C.BLK + 64 * l + z]
                    out.append(alg.mul(s_f, alg.sub(a, tgt)))
                else:
                    out.append(alg.mul(s_f, a))

        # digest accumulators: updated at output rows, carried elsewhere
        def limb(base, j):
            l, half = j // 2, j % 2
            acc_ = None
            for k in range(32):
                bit = w[base + 64 * l + 32 * half + k]
                term = alg.mul_int(bit, 1 << k)
                acc_ = term if acc_ is None else alg.add(acc_, term)
            return acc_

        for j in range(DIGEST_LIMBS):
            dig, dig_n = w[_C.DIG + j], w_next[_C.DIG + j]
            upd = alg.add(alg.mul(v, limb(_C.A, j)),
                          alg.mul(_one_minus(alg, v), dig))
            out.append(alg.mul(s_o, alg.sub(dig_n, upd)))
            out.append(alg.mul(s_d, alg.sub(dig_n, dig)))

        # validity / count chains
        cnt, cnt_n = w[_C.CNT], w_next[_C.CNT]
        out.append(alg.sub(alg.mul(v, v), v))
        out.append(alg.mul(s_b, alg.mul(v_n, _one_minus(alg, v))))
        out.append(alg.mul(_one_minus(alg, alg.add(s_b, s_w)),
                           alg.sub(v_n, v)))
        out.append(alg.mul(s_a, alg.sub(cnt_n, alg.add(cnt, v))))
        out.append(alg.mul(s_c, alg.sub(cnt_n, cnt)))

        # block-binding fingerprints (update at absorb rows: the whole
        # block is visible there)
        for rep in range(NUM_REPS):
            pch = [w[_C.PCH + rep * BLK_LIMBS + j] for j in range(BLK_LIMBS)]
            gamma = w[_C.GAMMA + rep]
            acc = w[_C.ACC + rep]
            acc_n = w_next[_C.ACC + rep]
            out.append(alg.sub(w_next[_C.GAMMA + rep], gamma))
            for j in range(BLK_LIMBS):
                out.append(alg.sub(w_next[_C.PCH + rep * BLK_LIMBS + j],
                                   pch[j]))
            for j in range(BLK_LIMBS - 1):
                out.append(alg.mul(s_a, alg.sub(pch[j + 1],
                                                alg.mul(pch[j], pch[0]))))
            s_blk = None
            for j in range(BLK_LIMBS):
                term = alg.mul(pch[j], limb(_C.BLK, j))
                s_blk = term if s_blk is None else alg.add(s_blk, term)
            t = alg.add(gamma, s_blk)
            gated = alg.add(alg.mul(v, t), _one_minus(alg, v))
            out.append(alg.mul(s_a, alg.sub(acc_n, alg.mul(acc, gated))))
            out.append(alg.mul(s_c, alg.sub(acc_n, acc)))
        return out

    n_constraints = (320 + NUM_BITS + NUM_BITS        # keccak core
                     + BLK_BITS                       # block booleanity
                     + NUM_BITS + NUM_BITS + NUM_BITS  # idle/chain/first
                     + 2 * DIGEST_LIMBS               # digest update/carry
                     + 5                              # v/cnt chains
                     + NUM_REPS * (1 + BLK_LIMBS
                                   + BLK_LIMBS - 1 + 2))

    pis: List[Tuple[int, int]] = []
    for rep in range(NUM_REPS):
        pis.append((_C.PCH + rep * BLK_LIMBS, 0))
        pis.append((_C.GAMMA + rep, 0))
    pis += [(_C.ACC + rep, 0) for rep in range(NUM_REPS)]
    pis += [(_C.ACC + rep, n - 1) for rep in range(NUM_REPS)]
    pis += [(_C.DIG + j, n - 1) for j in range(DIGEST_LIMBS)]
    pis += [(_C.V, 0), (_C.CNT, 0), (_C.CNT, n - 1)]

    return pk.PlonkishIR(
        log_n=log_n, num_witness=NUM_WITNESS, num_const=NUM_CONST,
        gate_degree=8, num_gate_constraints=n_constraints,
        eval_gates=eval_gates, copy_chunk=4,
        public_input_cells=tuple(pis))


def _const_rows(geo: HasherGeometry) -> np.ndarray:
    n = geo.n
    rows = np.zeros((n, NUM_CONST), dtype=object)
    for r in range(n):
        rr = r % ROWS_PER_INVOCATION
        if rr < NUM_ROUNDS:
            rows[r, K_SR] = 1
            for z in range(64):
                rows[r, K_RC + z] = (_RC[rr] >> z) & 1
        if rr == 0:
            rows[r, K_SA] = 1
        if rr == NUM_ROUNDS:
            rows[r, K_SO] = 1
        if NUM_ROUNDS <= rr < ROWS_PER_INVOCATION - 1:
            rows[r, K_SI] = 1     # carry the output state bits forward
        if rr == ROWS_PER_INVOCATION - 1 and r != n - 1:
            rows[r, K_SH] = 1     # chain into the next absorb row
            rows[r, K_SB] = 1     # validity may drop here
        if rr != 0 and r != n - 1:
            rows[r, K_SC] = 1     # acc/cnt carried outside absorb rows
        if rr != NUM_ROUNDS and r != n - 1:
            rows[r, K_SD] = 1     # digest carried outside output rows
    rows[0, K_SF] = 1
    rows[n - 1, K_SW] = 1
    return rows


def hasher_setup(ir: pk.PlonkishIR, geo: HasherGeometry,
                 cfg: pk.PlonkishConfig) -> pk.PlonkishSetup:
    const = _const_rows(geo).T
    perm = pk.identity_permutation(ir.num_witness, geo.n)
    return pk.build_setup(ir, const, perm, cfg)


# ---------------------------------------------------------------------------
# Witness generation
# ---------------------------------------------------------------------------

def _block_bits(block: bytes) -> List[int]:
    bits = []
    padded = block + b"\x00" * (136 - len(block))
    for l in range(ABSORBED_LANES):
        lane = int.from_bytes(padded[8 * l:8 * l + 8], "little")
        bits += [(lane >> z) & 1 for z in range(64)]
    return bits


def _block_limbs(block: bytes) -> List[int]:
    padded = block + b"\x00" * (136 - len(block))
    out = []
    for l in range(ABSORBED_LANES):
        lane = int.from_bytes(padded[8 * l:8 * l + 8], "little")
        out += [lane & 0xFFFFFFFF, (lane >> 32) & 0xFFFFFFFF]
    return out


def fingerprint(challenges: Sequence[int], gammas: Sequence[int],
                blocks: Sequence[bytes],
                acc_in: Sequence[int] = (1, 1)) -> List[int]:
    accs = [int(a) % P for a in acc_in]
    for block in blocks:
        limbs = _block_limbs(block)
        for rep in range(NUM_REPS):
            ch, gm = int(challenges[rep]) % P, int(gammas[rep]) % P
            t = gm
            pw = ch
            for limb in limbs:
                t = (t + pw * limb) % P
                pw = pw * ch % P
            accs[rep] = accs[rep] * t % P
    return accs


@dataclasses.dataclass
class HasherInstanceInputs:
    """One linear hash: the absorbed blocks (already padded) in order."""
    blocks: List[bytes]
    challenges: Tuple[int, int]
    gammas: Tuple[int, int]


def hasher_witness(ir: pk.PlonkishIR, geo: HasherGeometry,
                   inst: HasherInstanceInputs) -> gl.GF:
    n = geo.n
    count = len(inst.blocks)
    assert 1 <= count <= geo.capacity
    W = np.zeros((ir.num_witness, n), dtype=object)

    ch = [int(c) % P for c in inst.challenges]
    gm = [int(g) % P for g in inst.gammas]
    pows = [[], []]
    for rep in range(NUM_REPS):
        pw = ch[rep]
        for _ in range(BLK_LIMBS):
            pows[rep].append(pw)
            pw = pw * ch[rep] % P
        for j in range(BLK_LIMBS):
            W[_C.PCH + rep * BLK_LIMBS + j, :] = pows[rep][j]
        W[_C.GAMMA + rep, :] = gm[rep]

    accs = [1, 1]
    cnt = 0
    dig = [0] * DIGEST_LIMBS
    state = [0] * NUM_LANES
    for k in range(geo.capacity):
        base = k * ROWS_PER_INVOCATION
        valid = k < count
        if valid:
            block = inst.blocks[k]
            bits = _block_bits(block)
            post = list(state)
            padded = block + b"\x00" * (136 - len(block))
            for l in range(ABSORBED_LANES):
                post[l] ^= int.from_bytes(padded[8 * l:8 * l + 8], "little")
        else:
            block = b"\x00" * 136
            bits = [0] * BLK_BITS
            post = [0] * NUM_LANES
        A_rows, C_rows, AP_rows = keccak_round_trace(post)
        W[_C.BLK:_C.BLK + BLK_BITS, base] = bits
        for r in range(NUM_ROUNDS):
            W[_C.A:_C.A + NUM_BITS, base + r] = _lanes_to_bits(A_rows[r])
            for x in range(5):
                W[_C.CP + 64 * x:_C.CP + 64 * x + 64, base + r] = \
                    [(C_rows[r][x] >> z) & 1 for z in range(64)]
            W[_C.AP:_C.AP + NUM_BITS, base + r] = _lanes_to_bits(AP_rows[r])
        # output state carried through rows 24..31
        out_bits = _lanes_to_bits(A_rows[NUM_ROUNDS])
        for r in range(NUM_ROUNDS, ROWS_PER_INVOCATION):
            W[_C.A:_C.A + NUM_BITS, base + r] = out_bits
        # fingerprint + count: update fires at the absorb row
        W[_C.ACC + 0, base] = accs[0]
        W[_C.ACC + 1, base] = accs[1]
        W[_C.CNT, base] = cnt
        if valid:
            limbs = _block_limbs(block)
            for rep in range(NUM_REPS):
                t = gm[rep]
                for j in range(BLK_LIMBS):
                    t = (t + pows[rep][j] * limbs[j]) % P
                accs[rep] = accs[rep] * t % P
            cnt += 1
        for rep in range(NUM_REPS):
            W[_C.ACC + rep, base + 1:base + ROWS_PER_INVOCATION] = accs[rep]
        W[_C.CNT, base + 1:base + ROWS_PER_INVOCATION] = cnt
        # digest accumulators: update fires at the output row
        W[_C.DIG:_C.DIG + DIGEST_LIMBS,
          base:base + NUM_ROUNDS + 1] = np.array(dig, dtype=object)[:, None]
        if valid:
            dig = state_limbs(A_rows[NUM_ROUNDS][:4])
            state = list(A_rows[NUM_ROUNDS])
        W[_C.DIG:_C.DIG + DIGEST_LIMBS,
          base + NUM_ROUNDS + 1:base + ROWS_PER_INVOCATION] = \
            np.array(dig, dtype=object)[:, None]
        W[_C.V, base:base + ROWS_PER_INVOCATION] = 1 if valid else 0
    return gl.from_int(W)


def expected_public_inputs(geo: HasherGeometry, inst: HasherInstanceInputs
                           ) -> List[int]:
    acc_out = fingerprint(inst.challenges, inst.gammas, inst.blocks)
    # replay the sponge for the digest
    state = [0] * NUM_LANES
    for block in inst.blocks:
        padded = block + b"\x00" * (136 - len(block))
        post = list(state)
        for l in range(ABSORBED_LANES):
            post[l] ^= int.from_bytes(padded[8 * l:8 * l + 8], "little")
        A_rows, _, _ = keccak_round_trace(post)
        state = list(A_rows[NUM_ROUNDS])
    dig = state_limbs(state[:4])
    out = []
    for rep in range(NUM_REPS):
        out += [int(inst.challenges[rep]) % P, int(inst.gammas[rep]) % P]
    out += [1, 1]
    out += acc_out
    out += [int(v) for v in dig]
    out += [1, 0, len(inst.blocks)]
    return out


def digest_bytes(pis: Sequence[int]) -> bytes:
    """Recover the keccak256 digest from the 8 limb PIs (the 8 values
    before the trailing v/cnt_in/cnt_out lanes)."""
    limbs = [int(v) for v in pis[-11:-3]]
    out = b""
    for l in range(4):
        lane = limbs[2 * l] | (limbs[2 * l + 1] << 32)
        out += lane.to_bytes(8, "little")
    return out


def draw_hasher_challenges(blocks: Sequence[bytes]
                           ) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Fiat-Shamir challenges bound to the absorbed block stream."""
    from ..ops import poseidon2 as p2
    from ..prover.transcript import Transcript
    tr = Transcript(domain_tag=13)
    flat = []
    for block in blocks:
        flat += _block_limbs(block)
    digest = gl.to_ints(p2.hash_elements(gl.from_int(
        [v % P for v in flat] or [0])))
    tr.absorb_ints([int(v) for v in digest] + [len(blocks)])
    ch = (tr.challenge_base(), tr.challenge_base())
    gm = (tr.challenge_base(), tr.challenge_base())
    return ch, gm


def blocks_for_data(data: bytes) -> List[bytes]:
    """keccak256 pad10*1 split into rate-sized blocks."""
    padded = bytearray(data)
    pad_len = 136 - (len(padded) % 136)
    if pad_len >= 2:
        padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80"
    else:
        padded += b"\x81"
    return [bytes(padded[i:i + 136]) for i in range(0, len(padded), 136)]


def instance_inputs(data: bytes, challenges=None, gammas=None
                    ) -> HasherInstanceInputs:
    blocks = blocks_for_data(data)
    if challenges is None or gammas is None:
        challenges, gammas = draw_hasher_challenges(blocks)
    return HasherInstanceInputs(blocks=blocks, challenges=tuple(challenges),
                                gammas=tuple(gammas))
