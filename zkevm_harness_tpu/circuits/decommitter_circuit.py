"""Code-decommitter circuit (type 3): an in-circuit sha256 of the bytecode.

The reference circuit (circuit_definitions base_layer CodeDecommitter +
src/witness/individual_circuits/decommit_code.rs:20) pops fresh decommit
requests, streams the bytecode words into the code page (memory-queue
writes), and proves the versioned code hash: byte0=0x01, bytes2..3 = word
count, bytes4..31 = sha256(bytecode)[4:32]. This module proves the HASH —
the hot compute — as a fully chained in-circuit sha256 over the streamed
words (one proof per fresh bytecode):

  - the sha256 round core (circuits/sha256_circuit.py layout: 66 rows per
    compression, bit-state + schedule shift register + exact carry-split
    word additions);
  - compressions are CHAINED by constraint: the working state entering
    block k+1 equals block k's digest (feed-forward included), and block
    0's state is pinned to the FIPS IV — so the digest accumulator at the
    last row is sha256 of the whole stream by construction;
  - the absorbed block words (the same u32 limbs the memory queue carries
    as code-page writes) are bound by the two-rep fingerprint accumulator
    (challenge-after-commit);
  - DIGA: 8 digest-limb accumulators updated at valid output rows expose
    the final digest in the public inputs; the oracle cross-checks
    digest[4:32] against the request's versioned hash and word count
    (witness/decommitter.py bytecode_hash).
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Sequence, Tuple

import numpy as np

from ..ops import goldilocks as gl
from ..prover import plonkish as pk
from ..witness.precompile_rounds import _SHA_K
from .sha256_circuit import (M32, NUM_ROUNDS, ROWS_PER_INVOCATION, _one_minus,
                             sha256_round_trace, _rotr)

P = gl.P
NUM_REPS = 2
BLK_LIMBS = 16                     # u32 words per 64-byte block
_IV = (0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
       0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19)


class _C:
    """Column offsets (sha256 core layout + hasher accumulators)."""
    S = 0                               # 8 x 32 state bits (a..h)
    W = 256                             # 16 x 32 schedule shift register
    HIN = W + 512                       # 8 carried input words
    D = HIN + 8                         # 8 digest words
    CE = D + 8                          # 3 e_new carry bits
    CA = CE + 3                         # 3 a_new carry bits
    CW = CA + 3                         # 2 schedule carry bits
    CD = CW + 2                         # 8 digest carry bits
    DIGA = CD + 8                       # 8 digest accumulators
    PCH = DIGA + 8                      # 2 reps x 16 challenge powers
    GAMMA = PCH + NUM_REPS * BLK_LIMBS
    ACC = GAMMA + NUM_REPS
    V = ACC + NUM_REPS
    CNT = V + 1


NUM_WITNESS = _C.CNT + 1

# const columns: s_round, s_sched, s_absorb, s_out, s_carry, s_bend,
# s_chain (row 65 of non-final invocations), s_first (row 0), s_dcar
# (digest-accumulator carry rows), s_wrap, K round constant
(K_SR, K_SS2, K_SA, K_SO, K_SC, K_SB, K_SH, K_SF, K_SD, K_SW,
 K_K) = range(11)
NUM_CONST = 11


@dataclasses.dataclass(frozen=True)
class DecommitterGeometry:
    log_n: int

    @property
    def n(self) -> int:
        return 1 << self.log_n

    @property
    def capacity(self) -> int:
        """sha256 compressions per instance."""
        return self.n // ROWS_PER_INVOCATION


def decommitter_ir(log_n: int) -> pk.PlonkishIR:
    # the sha256 round core is shared verbatim with the type-6 circuit;
    # import its gate builder pieces locally to avoid drift
    from . import sha256_circuit as sc
    geo = DecommitterGeometry(log_n)
    n = geo.n
    assert geo.capacity >= 1

    def eval_gates(alg, w, w_next, c):
        out = []
        s_r, s_s2, s_a = c[K_SR], c[K_SS2], c[K_SA]
        s_o, s_c, s_b = c[K_SO], c[K_SC], c[K_SB]
        s_h, s_f, s_d, s_w, k_rc = c[K_SH], c[K_SF], c[K_SD], c[K_SW], c[K_K]

        def sbit(i, z):
            return w[_C.S + 32 * i + z]

        def sbit_n(i, z):
            return w_next[_C.S + 32 * i + z]

        def wbit(k, z):
            return w[_C.W + 32 * k + z]

        def wbit_n(k, z):
            return w_next[_C.W + 32 * k + z]

        def word(bit_fn, *idx):
            acc = None
            for z in range(32):
                t = alg.mul_int(bit_fn(*idx, z), 1 << z)
                acc = t if acc is None else alg.add(acc, t)
            return acc

        _xor2, _xor3 = sc._xor2, sc._xor3

        # booleanity: every bit column, all rows
        for col in (list(range(_C.S, _C.S + 256))
                    + list(range(_C.W, _C.W + 512))
                    + list(range(_C.CE, _C.CD + 8))):
            b = w[col]
            out.append(alg.sub(alg.mul(b, b), b))

        # schedule shift register + scheduled word (same as type 6)
        for k in range(15):
            for z in range(32):
                out.append(alg.mul(s_s2, alg.sub(wbit_n(k, z),
                                                 wbit(k + 1, z))))

        def sigma_word(k, r1, r2, sh):
            acc = None
            for z in range(32):
                t1 = wbit(k, (z + r1) % 32)
                t2 = wbit(k, (z + r2) % 32)
                if z + sh < 32:
                    bit = _xor3(alg, t1, t2, wbit(k, z + sh))
                else:
                    bit = _xor2(alg, t1, t2)
                t = alg.mul_int(bit, 1 << z)
                acc = t if acc is None else alg.add(acc, t)
            return acc

        w16 = word(wbit_n, 15)
        carry_w = alg.add(w[_C.CW], alg.mul_int(w[_C.CW + 1], 2))
        sched_sum = alg.add(alg.add(word(wbit, 0), sigma_word(1, 7, 18, 3)),
                            alg.add(word(wbit, 9), sigma_word(14, 17, 19, 10)))
        out.append(alg.mul(s_s2, alg.sub(
            alg.add(w16, alg.mul_int(carry_w, 1 << 32)), sched_sum)))

        # round function (same as type 6)
        def cap_sigma(i, r1, r2, r3):
            acc = None
            for z in range(32):
                bit = _xor3(alg, sbit(i, (z + r1) % 32),
                            sbit(i, (z + r2) % 32), sbit(i, (z + r3) % 32))
                t = alg.mul_int(bit, 1 << z)
                acc = t if acc is None else alg.add(acc, t)
            return acc

        def ch_word():
            acc = None
            for z in range(32):
                e, f, g = sbit(4, z), sbit(5, z), sbit(6, z)
                bit = alg.add(alg.mul(e, f), alg.sub(g, alg.mul(e, g)))
                t = alg.mul_int(bit, 1 << z)
                acc = t if acc is None else alg.add(acc, t)
            return acc

        def maj_word():
            acc = None
            for z in range(32):
                a, b2, c2 = sbit(0, z), sbit(1, z), sbit(2, z)
                p = alg.add(alg.add(alg.mul(a, b2), alg.mul(b2, c2)),
                            alg.mul(c2, a))
                bit = alg.sub(p, alg.mul_int(alg.mul(alg.mul(a, b2), c2), 2))
                t = alg.mul_int(bit, 1 << z)
                acc = t if acc is None else alg.add(acc, t)
            return acc

        t1 = alg.add(alg.add(word(sbit, 7), cap_sigma(4, 6, 11, 25)),
                     alg.add(ch_word(), alg.add(k_rc, word(wbit, 0))))
        t2 = alg.add(cap_sigma(0, 2, 13, 22), maj_word())
        carry_e = alg.add(alg.add(w[_C.CE], alg.mul_int(w[_C.CE + 1], 2)),
                          alg.mul_int(w[_C.CE + 2], 4))
        carry_a = alg.add(alg.add(w[_C.CA], alg.mul_int(w[_C.CA + 1], 2)),
                          alg.mul_int(w[_C.CA + 2], 4))
        out.append(alg.mul(s_r, alg.sub(
            alg.add(word(sbit_n, 4), alg.mul_int(carry_e, 1 << 32)),
            alg.add(word(sbit, 3), t1))))
        out.append(alg.mul(s_r, alg.sub(
            alg.add(word(sbit_n, 0), alg.mul_int(carry_a, 1 << 32)),
            alg.add(t1, t2))))
        for (dst, src) in ((1, 0), (2, 1), (3, 2), (5, 4), (6, 5), (7, 6)):
            out.append(alg.mul(s_r, alg.sub(word(sbit_n, dst),
                                            word(sbit, src))))

        # h_in carried; digest at the output row (same as type 6)
        for j in range(8):
            hin = w[_C.HIN + j]
            out.append(alg.mul(s_a, alg.sub(hin, word(sbit, j))))
            out.append(alg.mul(s_r, alg.sub(w_next[_C.HIN + j], hin)))
        for j in range(8):
            out.append(alg.mul(s_o, alg.sub(
                alg.add(w[_C.D + j], alg.mul_int(w[_C.CD + j], 1 << 32)),
                alg.add(w[_C.HIN + j], word(sbit, j)))))
            # carry D one row so the chain row sees it
            out.append(alg.mul(s_o, alg.sub(w_next[_C.D + j], w[_C.D + j])))

        # CHAINING: the next compression continues from this digest
        v, v_n = w[_C.V], w_next[_C.V]
        for j in range(8):
            out.append(alg.mul(alg.mul(s_h, v_n),
                               alg.sub(word(sbit_n, j), w[_C.D + j])))
        # block 0 starts from the FIPS IV
        for j in range(8):
            out.append(alg.mul(s_f, alg.add_int(word(sbit, j),
                                                P - _IV[j])))

        # digest accumulators: capture D while valid, carry elsewhere
        for j in range(8):
            dga, dga_n = w[_C.DIGA + j], w_next[_C.DIGA + j]
            upd = alg.add(alg.mul(v, w[_C.D + j]),
                          alg.mul(_one_minus(alg, v), dga))
            out.append(alg.mul(s_o, alg.sub(dga_n, upd)))
            out.append(alg.mul(s_d, alg.sub(dga_n, dga)))

        # validity / count chains
        cnt, cnt_n = w[_C.CNT], w_next[_C.CNT]
        out.append(alg.sub(alg.mul(v, v), v))
        out.append(alg.mul(s_b, alg.mul(v_n, _one_minus(alg, v))))
        out.append(alg.mul(_one_minus(alg, alg.add(s_b, s_w)),
                           alg.sub(v_n, v)))
        out.append(alg.mul(s_a, alg.sub(cnt_n, alg.add(cnt, v))))
        out.append(alg.mul(s_c, alg.sub(cnt_n, cnt)))

        # block-word fingerprints (update at absorb rows)
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
                term = alg.mul(pch[j], word(wbit, j))
                s_blk = term if s_blk is None else alg.add(s_blk, term)
            t = alg.add(gamma, s_blk)
            gated = alg.add(alg.mul(v, t), _one_minus(alg, v))
            out.append(alg.mul(s_a, alg.sub(acc_n, alg.mul(acc, gated))))
            out.append(alg.mul(s_c, alg.sub(acc_n, acc)))
        return out

    n_constraints = (256 + 512 + 16                  # booleanity
                     + 480 + 1                       # schedule
                     + 2 + 6                         # round
                     + 16 + 16                       # h_in + digest(def+carry)
                     + 8 + 8                         # chain + IV
                     + 16                            # digest accumulators
                     + 5                             # v/cnt
                     + NUM_REPS * (1 + BLK_LIMBS
                                   + BLK_LIMBS - 1 + 2))

    pis: List[Tuple[int, int]] = []
    for rep in range(NUM_REPS):
        pis.append((_C.PCH + rep * BLK_LIMBS, 0))
        pis.append((_C.GAMMA + rep, 0))
    pis += [(_C.ACC + rep, 0) for rep in range(NUM_REPS)]
    pis += [(_C.ACC + rep, n - 1) for rep in range(NUM_REPS)]
    pis += [(_C.DIGA + j, n - 1) for j in range(8)]
    pis += [(_C.V, 0), (_C.CNT, 0), (_C.CNT, n - 1)]

    return pk.PlonkishIR(
        log_n=log_n, num_witness=NUM_WITNESS, num_const=NUM_CONST,
        gate_degree=5, num_gate_constraints=n_constraints,
        eval_gates=eval_gates, copy_chunk=4,
        public_input_cells=tuple(pis))


def _const_rows(geo: DecommitterGeometry) -> np.ndarray:
    n = geo.n
    rows = np.zeros((n, NUM_CONST), dtype=object)
    span = geo.capacity * ROWS_PER_INVOCATION
    for r in range(n):
        rr = r % ROWS_PER_INVOCATION
        in_inv = r < span
        if in_inv and rr < NUM_ROUNDS:
            rows[r, K_SR] = 1
            rows[r, K_K] = _SHA_K[rr]
        if in_inv and rr < NUM_ROUNDS - 1:
            rows[r, K_SS2] = 1
        if in_inv and rr == 0:
            rows[r, K_SA] = 1
        if in_inv and rr == NUM_ROUNDS:
            rows[r, K_SO] = 1
        if in_inv and rr == ROWS_PER_INVOCATION - 1 and r != n - 1:
            rows[r, K_SH] = 1     # chain into the next absorb row
            rows[r, K_SB] = 1
        if (not in_inv or rr != 0) and r != n - 1:
            rows[r, K_SC] = 1     # acc/cnt carried outside absorb rows
        if (not in_inv or rr != NUM_ROUNDS) and r != n - 1:
            rows[r, K_SD] = 1     # digest accumulators carried
    rows[0, K_SF] = 1
    rows[n - 1, K_SW] = 1
    return rows


def decommitter_setup(ir: pk.PlonkishIR, geo: DecommitterGeometry,
                      cfg: pk.PlonkishConfig) -> pk.PlonkishSetup:
    const = _const_rows(geo).T
    perm = pk.identity_permutation(ir.num_witness, geo.n)
    return pk.build_setup(ir, const, perm, cfg)


# ---------------------------------------------------------------------------
# Witness generation
# ---------------------------------------------------------------------------

def blocks_for_bytecode(words: Sequence[int]) -> List[bytes]:
    """sha256 padding of the 32-byte-word stream into 64-byte blocks."""
    data = b"".join(int(w).to_bytes(32, "big") for w in words)
    bitlen = len(data) * 8
    padded = bytearray(data) + b"\x80"
    while len(padded) % 64 != 56:
        padded += b"\x00"
    padded += bitlen.to_bytes(8, "big")
    return [bytes(padded[i:i + 64]) for i in range(0, len(padded), 64)]


def fingerprint(challenges: Sequence[int], gammas: Sequence[int],
                blocks: Sequence[bytes],
                acc_in: Sequence[int] = (1, 1)) -> List[int]:
    accs = [int(a) % P for a in acc_in]
    for block in blocks:
        limbs = struct.unpack(">16I", block)
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
class DecommitterInstanceInputs:
    """One bytecode's hash: the padded sha256 blocks in order."""
    blocks: List[bytes]
    challenges: Tuple[int, int]
    gammas: Tuple[int, int]


def decommitter_witness(ir: pk.PlonkishIR, geo: DecommitterGeometry,
                        inst: DecommitterInstanceInputs) -> gl.GF:
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
    diga = [0] * 8
    h = list(_IV)
    zero_block = b"\x00" * 64
    for k in range(geo.capacity):
        base = k * ROWS_PER_INVOCATION
        valid = k < count
        block = inst.blocks[k] if valid else zero_block
        h_in = tuple(h) if valid else (0,) * 8
        S_rows, w_words, dg = sha256_round_trace(h_in, block)
        for r in range(NUM_ROUNDS + 1):
            row = base + r
            for j in range(8):
                W[_C.S + 32 * j:_C.S + 32 * j + 32, row] = \
                    [(S_rows[min(r, NUM_ROUNDS)][j] >> z) & 1
                     for z in range(32)]
            for kk in range(16):
                W[_C.W + 32 * kk:_C.W + 32 * kk + 32, row] = \
                    [(w_words[r + kk] >> z) & 1 for z in range(32)]
            for j in range(8):
                W[_C.HIN + j, row] = h_in[j]
            if r < NUM_ROUNDS:
                a, b, c2, d, e, f, g, hh = S_rows[r]
                s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
                chv = (e & f) ^ (~e & g)
                t1 = hh + s1 + chv + _SHA_K[r] + w_words[r]
                s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
                maj = (a & b) ^ (a & c2) ^ (b & c2)
                t2 = s0 + maj
                ce = (d + t1 - S_rows[r + 1][4]) >> 32
                ca = (t1 + t2 - S_rows[r + 1][0]) >> 32
                for i in range(3):
                    W[_C.CE + i, row] = (ce >> i) & 1
                    W[_C.CA + i, row] = (ca >> i) & 1
                if r < NUM_ROUNDS - 1:
                    sg0 = (_rotr(w_words[r + 1], 7) ^ _rotr(w_words[r + 1], 18)
                           ^ (w_words[r + 1] >> 3))
                    sg1 = (_rotr(w_words[r + 14], 17)
                           ^ _rotr(w_words[r + 14], 19)
                           ^ (w_words[r + 14] >> 10))
                    cw = (w_words[r] + sg0 + w_words[r + 9] + sg1
                          - w_words[r + 16]) >> 32
                    W[_C.CW, row] = cw & 1
                    W[_C.CW + 1, row] = (cw >> 1) & 1
        out_row = base + NUM_ROUNDS
        for j in range(8):
            W[_C.D + j, out_row] = dg[j]
            W[_C.D + j, out_row + 1] = dg[j]      # carried to the chain row
            W[_C.CD + j, out_row] = (h_in[j] + S_rows[NUM_ROUNDS][j]) >> 32
        # accumulators + chains
        W[_C.ACC + 0, base] = accs[0]
        W[_C.ACC + 1, base] = accs[1]
        W[_C.CNT, base] = cnt
        if valid:
            limbs = struct.unpack(">16I", block)
            for rep in range(NUM_REPS):
                t = gm[rep]
                for j in range(BLK_LIMBS):
                    t = (t + pows[rep][j] * limbs[j]) % P
                accs[rep] = accs[rep] * t % P
            cnt += 1
        for rep in range(NUM_REPS):
            W[_C.ACC + rep, base + 1:base + ROWS_PER_INVOCATION] = accs[rep]
        W[_C.CNT, base + 1:base + ROWS_PER_INVOCATION] = cnt
        W[_C.DIGA:_C.DIGA + 8, base:base + NUM_ROUNDS + 1] = \
            np.array(diga, dtype=object)[:, None]
        if valid:
            diga = list(dg)
            h = list(dg)
        W[_C.DIGA:_C.DIGA + 8,
          base + NUM_ROUNDS + 1:base + ROWS_PER_INVOCATION] = \
            np.array(diga, dtype=object)[:, None]
        W[_C.V, base:base + ROWS_PER_INVOCATION] = 1 if valid else 0
    span = geo.capacity * ROWS_PER_INVOCATION
    if span < n:
        for rep in range(NUM_REPS):
            W[_C.ACC + rep, span:] = accs[rep]
        W[_C.CNT, span:] = cnt
        W[_C.DIGA:_C.DIGA + 8, span:] = np.array(diga, dtype=object)[:, None]
    return gl.from_int(W)


def expected_public_inputs(geo: DecommitterGeometry,
                           inst: DecommitterInstanceInputs) -> List[int]:
    acc_out = fingerprint(inst.challenges, inst.gammas, inst.blocks)
    h = list(_IV)
    from .sha256_circuit import sha256_round_trace as _trace
    for block in inst.blocks:
        _, _, h = _trace(tuple(h), block)
    out = []
    for rep in range(NUM_REPS):
        out += [int(inst.challenges[rep]) % P, int(inst.gammas[rep]) % P]
    out += [1, 1]
    out += acc_out
    out += [int(v) for v in h]
    out += [1, 0, len(inst.blocks)]
    return out


def digest_bytes(pis: Sequence[int]) -> bytes:
    """Recover the sha256 digest from the 8 limb PIs."""
    limbs = [int(v) for v in pis[-11:-3]]
    return b"".join(int(x).to_bytes(4, "big") for x in limbs)


def draw_decommitter_challenges(blocks: Sequence[bytes]
                                ) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    from ..ops import poseidon2 as p2
    from ..prover.transcript import Transcript
    tr = Transcript(domain_tag=3)
    flat = []
    for block in blocks:
        flat += list(struct.unpack(">16I", block))
    digest = gl.to_ints(p2.hash_elements(gl.from_int(
        [v % P for v in flat] or [0])))
    tr.absorb_ints([int(v) for v in digest] + [len(blocks)])
    ch = (tr.challenge_base(), tr.challenge_base())
    gm = (tr.challenge_base(), tr.challenge_base())
    return ch, gm


def instance_inputs(words: Sequence[int], challenges=None, gammas=None
                    ) -> DecommitterInstanceInputs:
    """One fresh bytecode (32-byte words) -> the circuit payload."""
    blocks = blocks_for_bytecode(words)
    if challenges is None or gammas is None:
        challenges, gammas = draw_decommitter_challenges(blocks)
    return DecommitterInstanceInputs(
        blocks=blocks, challenges=tuple(challenges), gammas=tuple(gammas))
