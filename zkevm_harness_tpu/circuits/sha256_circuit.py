"""Sha256 round-function circuit: the type-6 compute core.

The reference sha256 circuit
(circuit_definitions base_layer sha256_round_function + the decomposer
src/witness/individual_circuits/sha256_round_function.rs:23) proves batches
of sha256 compressions driven by the demuxed precompile queue. This module
proves the COMPRESSIONS — the hot compute — with per-invocation
(state_in, block, state_out) triples bound to the witness decomposer's
replay (witness/precompile_rounds.py sha256_decompose) through the same
two-rep Reed-Solomon-fingerprint accumulator as the keccak circuit; the
queue/memory plumbing composes on top exactly like the sorter circuits.

TPU-first word+bit hybrid layout (no lookup tables):

  - one row per compression round; ROWS_PER_INVOCATION = 66 rows per
    invocation: rows 0..63 hold the working state (a..h) ENTERING round r,
    row 64 is the output row (state after round 63 + digest feed-forward),
    row 65 is an idle carry row (validity may drop at its end);
  - working state a..h as 8 x 32 bit columns; sigma/ch/maj are CLOSED-FORM
    degree-<=3 boolean polynomials (xor3(a,b,c) = a+b+c-2(ab+bc+ca)+4abc,
    ch = ef + g - eg, maj = ab+bc+ca-2abc) — no lookup tables, everything
    fuses into the coset quotient kernel;
  - message schedule as a 16-word x 32-bit shift register W[0..15]: row r
    holds w[r..r+15]; W_next[k] = W[k+1] (480 degree-1 copies) and
    W_next[15] is the scheduled word, an exact u34 sum split by 2 carry
    bits;
  - round additions are EXACT word equations with boolean carry columns
    (e_new: u35 -> 3 carry bits, a_new: u35 -> 3 carry bits), so every new
    bit column is pinned by booleanity + one weighted-sum equation;
  - digest feed-forward: h_in carried as 8 word columns from the absorb row
    to the output row, D[j] = HIN[j] + word_j(state@64) - 2^32*cd_j;
  - binding: 2 independent fingerprints acc *= gamma + sum_j limb_j ch^j
    over the 32 u32 limbs (h_in 8, block 16, digest 8) per invocation —
    challenges drawn AFTER committing the invocation data
    (challenge-after-commit, same shape as the keccak circuit);
  - FSM: validity flags + invocation count chain across instances
    (acc_in/out, cnt_in/out public inputs).
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Sequence, Tuple

import numpy as np

from ..ops import goldilocks as gl
from ..prover import plonkish as pk
from ..witness.precompile_rounds import _SHA_K, _sha256_compress

P = gl.P
M32 = 0xFFFFFFFF
ROWS_PER_INVOCATION = 66
NUM_ROUNDS = 64
NUM_REPS = 2
LIMBS_IN = 24                      # h_in (8) + block words (16)
LIMBS_OUT = 8                      # digest words
POWS_PER_REP = LIMBS_IN + LIMBS_OUT


class _C:
    """Column offsets."""
    S = 0                               # 8 x 32 state bits (a..h)
    W = 256                             # 16 x 32 schedule shift register
    HIN = W + 512                       # 8 carried input words
    D = HIN + 8                         # 8 digest words
    CE = D + 8                          # 3 e_new carry bits
    CA = CE + 3                         # 3 a_new carry bits
    CW = CA + 3                         # 2 schedule carry bits
    CD = CW + 2                         # 8 digest carry bits
    PCH = CD + 8                        # 2 reps x 32 challenge powers
    GAMMA = PCH + NUM_REPS * POWS_PER_REP
    SIN = GAMMA + NUM_REPS              # carried input-half sums
    ACC = SIN + NUM_REPS                # accumulators
    V = ACC + NUM_REPS                  # block validity
    CNT = V + 1


NUM_WITNESS = _C.CNT + 1

# const columns: s_round (rows 0..63), s_sched (rows 0..62), s_absorb (row
# 0), s_out (row 64), s_carry (acc/cnt carried), s_bend (invocation end, no
# wrap), s_sin (sin carried), s_wrap (row n-1), K round-constant word
K_SR, K_SS2, K_SA, K_SO, K_SC, K_SB, K_SI, K_SW, K_K = range(9)
NUM_CONST = 9

_SBIT_NAMES = "abcdefgh"


def _one_minus(alg, v):
    return alg.add_int(alg.mul_int(v, P - 1), 1)


def _xor2(alg, a, b):
    return alg.sub(alg.add(a, b), alg.mul_int(alg.mul(a, b), 2))


def _xor3(alg, a, b, c):
    # a+b+c - 2(ab+bc+ca) + 4abc for boolean inputs (degree 3)
    s = alg.add(alg.add(a, b), c)
    p = alg.add(alg.add(alg.mul(a, b), alg.mul(b, c)), alg.mul(c, a))
    t = alg.mul(alg.mul(a, b), c)
    return alg.add(alg.sub(s, alg.mul_int(p, 2)), alg.mul_int(t, 4))


@dataclasses.dataclass(frozen=True)
class Sha256Geometry:
    log_n: int

    @property
    def n(self) -> int:
        return 1 << self.log_n

    @property
    def capacity(self) -> int:
        """sha256 compressions per instance
        (cycles_per_sha256_circuit analogue)."""
        return self.n // ROWS_PER_INVOCATION


def sha256_ir(log_n: int) -> pk.PlonkishIR:
    geo = Sha256Geometry(log_n)
    n = geo.n
    assert geo.capacity >= 1

    def eval_gates(alg, w, w_next, c):
        out = []
        s_r, s_s2, s_a = c[K_SR], c[K_SS2], c[K_SA]
        s_o, s_c, s_b = c[K_SO], c[K_SC], c[K_SB]
        s_i, s_w, k_rc = c[K_SI], c[K_SW], c[K_K]

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

        # booleanity: every bit column (state, schedule, carries), all rows
        for col in (list(range(_C.S, _C.S + 256))
                    + list(range(_C.W, _C.W + 512))
                    + list(range(_C.CE, _C.CD + 8))):
            b = w[col]
            out.append(alg.sub(alg.mul(b, b), b))

        # schedule shift register (rows 0..62): W_next[k] = W[k+1]
        for k in range(15):
            for z in range(32):
                out.append(alg.mul(s_s2, alg.sub(wbit_n(k, z),
                                                 wbit(k + 1, z))))
        # scheduled word: w16 = w0 + sg0(w1) + w9 + sg1(w14) - 2^32*cw
        # sg0(x) = rotr7 ^ rotr18 ^ shr3 ; sg1(x) = rotr17 ^ rotr19 ^ shr10
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

        # round function (rows 0..63): state words a..h = indices 0..7
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
        # e_new = d + t1 mod 2^32 ; a_new = t1 + t2 mod 2^32
        out.append(alg.mul(s_r, alg.sub(
            alg.add(word(sbit_n, 4), alg.mul_int(carry_e, 1 << 32)),
            alg.add(word(sbit, 3), t1))))
        out.append(alg.mul(s_r, alg.sub(
            alg.add(word(sbit_n, 0), alg.mul_int(carry_a, 1 << 32)),
            alg.add(t1, t2))))
        # b,c,d = a,b,c and f,g,h = e,f,g (word equations; booleanity pins
        # the bits)
        for (dst, src) in ((1, 0), (2, 1), (3, 2), (5, 4), (6, 5), (7, 6)):
            out.append(alg.mul(s_r, alg.sub(word(sbit_n, dst),
                                            word(sbit, src))))

        # h_in carried from absorb row to output row; defined at s_a
        for j in range(8):
            hin = w[_C.HIN + j]
            out.append(alg.mul(s_a, alg.sub(hin, word(sbit, j))))
            out.append(alg.mul(s_r, alg.sub(w_next[_C.HIN + j], hin)))
        # digest at the output row: D = HIN + state@64 - 2^32*cd
        for j in range(8):
            out.append(alg.mul(s_o, alg.sub(
                alg.add(w[_C.D + j], alg.mul_int(w[_C.CD + j], 1 << 32)),
                alg.add(w[_C.HIN + j], word(sbit, j)))))

        # validity / count chains (identical shape to the keccak circuit)
        v, v_n = w[_C.V], w_next[_C.V]
        cnt, cnt_n = w[_C.CNT], w_next[_C.CNT]
        out.append(alg.sub(alg.mul(v, v), v))
        out.append(alg.mul(s_b, alg.mul(v_n, _one_minus(alg, v))))
        out.append(alg.mul(_one_minus(alg, alg.add(s_b, s_w)),
                           alg.sub(v_n, v)))
        out.append(alg.mul(s_o, alg.sub(cnt_n, alg.add(cnt, v))))
        out.append(alg.mul(s_c, alg.sub(cnt_n, cnt)))

        # fingerprint machinery (challenge-after-commit binding)
        for rep in range(NUM_REPS):
            pch = [w[_C.PCH + rep * POWS_PER_REP + j]
                   for j in range(POWS_PER_REP)]
            gamma = w[_C.GAMMA + rep]
            sin = w[_C.SIN + rep]
            sin_n = w_next[_C.SIN + rep]
            acc = w[_C.ACC + rep]
            acc_n = w_next[_C.ACC + rep]
            out.append(alg.sub(w_next[_C.GAMMA + rep], gamma))
            for j in range(POWS_PER_REP):
                out.append(alg.sub(w_next[_C.PCH + rep * POWS_PER_REP + j],
                                   pch[j]))
            for j in range(POWS_PER_REP - 1):
                out.append(alg.mul(s_a, alg.sub(pch[j + 1],
                                                alg.mul(pch[j], pch[0]))))
            # input-half sum staged at the absorb row: h_in words then block
            s_in = None
            for j in range(8):
                term = alg.mul(pch[j], word(sbit, j))
                s_in = term if s_in is None else alg.add(s_in, term)
            for j in range(16):
                s_in = alg.add(s_in, alg.mul(pch[8 + j], word(wbit, j)))
            out.append(alg.mul(s_a, alg.sub(sin, s_in)))
            out.append(alg.mul(s_i, alg.sub(sin_n, sin)))
            # accumulator step at the output row over the digest words
            s_out = None
            for j in range(LIMBS_OUT):
                term = alg.mul(pch[LIMBS_IN + j], w[_C.D + j])
                s_out = term if s_out is None else alg.add(s_out, term)
            t = alg.add(gamma, alg.add(sin, s_out))
            gated = alg.add(alg.mul(v, t), _one_minus(alg, v))
            out.append(alg.mul(s_o, alg.sub(acc_n, alg.mul(acc, gated))))
            out.append(alg.mul(s_c, alg.sub(acc_n, acc)))
        return out

    n_constraints = (256 + 512 + 16                  # booleanity
                     + 480 + 1                       # schedule
                     + 2 + 6                         # round additions+copies
                     + 16 + 8                        # h_in carry + digest
                     + 5                             # v/cnt chains
                     + NUM_REPS * (1 + POWS_PER_REP
                                   + POWS_PER_REP - 1
                                   + 2 + 2))

    pis: List[Tuple[int, int]] = []
    for rep in range(NUM_REPS):
        pis.append((_C.PCH + rep * POWS_PER_REP, 0))
        pis.append((_C.GAMMA + rep, 0))
    pis += [(_C.ACC + rep, 0) for rep in range(NUM_REPS)]
    pis += [(_C.ACC + rep, n - 1) for rep in range(NUM_REPS)]
    pis += [(_C.V, 0), (_C.CNT, 0), (_C.CNT, n - 1)]

    return pk.PlonkishIR(
        log_n=log_n, num_witness=NUM_WITNESS, num_const=NUM_CONST,
        gate_degree=5, num_gate_constraints=n_constraints,
        eval_gates=eval_gates, copy_chunk=4,
        public_input_cells=tuple(pis))


def _const_rows(geo: Sha256Geometry) -> np.ndarray:
    n = geo.n
    rows = np.zeros((n, NUM_CONST), dtype=object)
    span = geo.capacity * ROWS_PER_INVOCATION
    for r in range(n):
        rr = r % ROWS_PER_INVOCATION
        in_inv = r < span
        if in_inv and rr < NUM_ROUNDS:
            rows[r, K_SR] = 1
            rows[r, K_SI] = 1
            rows[r, K_K] = _SHA_K[rr]
        if in_inv and rr < NUM_ROUNDS - 1:
            rows[r, K_SS2] = 1
        if in_inv and rr == 0:
            rows[r, K_SA] = 1
        if in_inv and rr == NUM_ROUNDS:
            rows[r, K_SO] = 1
        if (not in_inv or rr != NUM_ROUNDS) and r != n - 1:
            rows[r, K_SC] = 1
        if in_inv and rr == ROWS_PER_INVOCATION - 1 and r != n - 1:
            rows[r, K_SB] = 1
    rows[n - 1, K_SW] = 1
    return rows


def sha256_setup(ir: pk.PlonkishIR, geo: Sha256Geometry,
                 cfg: pk.PlonkishConfig) -> pk.PlonkishSetup:
    const = _const_rows(geo).T
    perm = pk.identity_permutation(ir.num_witness, geo.n)
    return pk.build_setup(ir, const, perm, cfg)


# ---------------------------------------------------------------------------
# Witness generation
# ---------------------------------------------------------------------------

def sha256_round_trace(h_in: Sequence[int], block: bytes):
    """Per-round traces for one compression: returns (S_rows (65, 8 words),
    W_words (list of all scheduled words w[0..78]), digest (8 words)).
    S_rows[r] is the working state entering round r."""
    w = list(struct.unpack(">16I", block))
    # extend far enough that the shift register rows 0..64 are defined
    for i in range(16, NUM_ROUNDS + 16):
        s0 = _rotr(w[i - 15], 7) ^ _rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = _rotr(w[i - 2], 17) ^ _rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append((w[i - 16] + s0 + w[i - 7] + s1) & M32)
    state = [int(x) & M32 for x in h_in]
    S_rows = []
    for r in range(NUM_ROUNDS):
        S_rows.append(list(state))
        a, b, c, d, e, f, g, hh = state
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = (hh + s1 + ch + _SHA_K[r] + w[r]) & ((1 << 40) - 1)
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + maj
        state = [(t1 + t2) & M32, a, b, c, (d + t1) & M32, e, f, g]
    S_rows.append(list(state))
    digest = [(int(h_in[j]) + state[j]) & M32 for j in range(8)]
    return S_rows, w, digest


def _rotr(x, s):
    return ((x >> s) | (x << (32 - s))) & M32


def _word_bits(v: int) -> List[int]:
    return [(int(v) >> z) & 1 for z in range(32)]


def fingerprint(challenges: Sequence[int], gammas: Sequence[int],
                triples, acc_in: Sequence[int] = (1, 1)) -> List[int]:
    """Host-side accumulator over (h_in, block, digest) triples — what the
    circuit's public accumulator outputs must equal."""
    accs = [int(a) % P for a in acc_in]
    for (h_in, block, digest) in triples:
        limbs = ([int(x) & M32 for x in h_in]
                 + list(struct.unpack(">16I", block))
                 + [int(x) & M32 for x in digest])
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
class Sha256InstanceInputs:
    """One instance's payload: (h_in, block, digest) compression triples."""
    triples: List[Tuple[Tuple[int, ...], bytes, Tuple[int, ...]]]
    challenges: Tuple[int, int]
    gammas: Tuple[int, int]
    acc_in: Tuple[int, int]
    cnt_in: int


def sha256_witness(ir: pk.PlonkishIR, geo: Sha256Geometry,
                   inst: Sha256InstanceInputs) -> gl.GF:
    n = geo.n
    count = len(inst.triples)
    assert count <= geo.capacity
    W = np.zeros((ir.num_witness, n), dtype=object)

    ch = [int(c) % P for c in inst.challenges]
    gm = [int(g) % P for g in inst.gammas]
    pows = [[], []]
    for rep in range(NUM_REPS):
        pw = ch[rep]
        for _ in range(POWS_PER_REP):
            pows[rep].append(pw)
            pw = pw * ch[rep] % P
        for j in range(POWS_PER_REP):
            W[_C.PCH + rep * POWS_PER_REP + j, :] = pows[rep][j]
        W[_C.GAMMA + rep, :] = gm[rep]

    accs = [int(a) % P for a in inst.acc_in]
    cnt = int(inst.cnt_in)
    zero_block = b"\x00" * 64
    for k in range(geo.capacity):
        base = k * ROWS_PER_INVOCATION
        valid = k < count
        if valid:
            h_in, block, digest = inst.triples[k]
            h_in = tuple(int(x) & M32 for x in h_in)
        else:
            h_in, block, digest = (0,) * 8, zero_block, None
        S_rows, w_words, dg = sha256_round_trace(h_in, block)
        if valid:
            assert tuple(dg) == tuple(int(x) & M32 for x in digest), \
                "digest does not match sha256-compress(state_in, block)"
        for r in range(NUM_ROUNDS + 1):
            row = base + r
            for j in range(8):
                W[_C.S + 32 * j:_C.S + 32 * j + 32, row] = \
                    _word_bits(S_rows[r][j] if r < len(S_rows)
                               else S_rows[-1][j])
            for kk in range(16):
                W[_C.W + 32 * kk:_C.W + 32 * kk + 32, row] = \
                    _word_bits(w_words[r + kk])
            for j in range(8):
                W[_C.HIN + j, row] = h_in[j]
            if r < NUM_ROUNDS:
                # carries for the round/schedule equations
                a, b, c, d, e, f, g, hh = S_rows[r]
                s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
                chv = (e & f) ^ (~e & g) & M32
                t1 = hh + s1 + chv + _SHA_K[r] + w_words[r]
                s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
                maj = (a & b) ^ (a & c) ^ (b & c)
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
        # digest on the output row
        out_row = base + NUM_ROUNDS
        for j in range(8):
            W[_C.D + j, out_row] = dg[j]
            W[_C.CD + j, out_row] = (h_in[j] + S_rows[NUM_ROUNDS][j]) >> 32
        # fingerprint staging
        limbs_in = list(h_in) + list(struct.unpack(">16I", block))
        for rep in range(NUM_REPS):
            sin = sum(pows[rep][j] * limbs_in[j]
                      for j in range(LIMBS_IN)) % P
            W[_C.SIN + rep, base:base + NUM_ROUNDS + 1] = sin
            W[_C.ACC + rep, base:base + NUM_ROUNDS + 1] = accs[rep]
            if valid:
                sout = sum(pows[rep][LIMBS_IN + j] * dg[j]
                           for j in range(LIMBS_OUT)) % P
                accs[rep] = accs[rep] * ((gm[rep] + sin + sout) % P) % P
            W[_C.ACC + rep, base + NUM_ROUNDS + 1:
              base + ROWS_PER_INVOCATION] = accs[rep]
        W[_C.V, base:base + ROWS_PER_INVOCATION] = 1 if valid else 0
        W[_C.CNT, base:base + NUM_ROUNDS + 1] = cnt
        if valid:
            cnt += 1
        W[_C.CNT, base + NUM_ROUNDS + 1:base + ROWS_PER_INVOCATION] = cnt
    # idle tail region (rows beyond capacity*66): accs/cnt/validity carried
    span = geo.capacity * ROWS_PER_INVOCATION
    if span < n:
        for rep in range(NUM_REPS):
            W[_C.ACC + rep, span:] = accs[rep]
        W[_C.CNT, span:] = cnt
        W[_C.V, span:] = 0
    return gl.from_int(W)


def expected_public_inputs(geo: Sha256Geometry, inst: Sha256InstanceInputs
                           ) -> List[int]:
    acc_out = fingerprint(inst.challenges, inst.gammas, inst.triples,
                          inst.acc_in)
    out = []
    for rep in range(NUM_REPS):
        out += [int(inst.challenges[rep]) % P, int(inst.gammas[rep]) % P]
    out += [int(a) % P for a in inst.acc_in]
    out += acc_out
    out += [1 if inst.triples else 0,
            int(inst.cnt_in), int(inst.cnt_in) + len(inst.triples)]
    return out


def instance_public_inputs(geo: Sha256Geometry, inst_w, challenges_gammas
                           ) -> List[int]:
    """PIs from a decomposer-level RoundFunctionInstanceWitness
    (witness/precompile_circuits.py) — the typed-layer-surface bridge."""
    ch, gm = challenges_gammas
    inst = instance_inputs(inst_w.invocations, ch, gm, inst_w.acc_in,
                           inst_w.cnt_in)
    return expected_public_inputs(geo, inst)


def draw_sha256_challenges(invocations) -> Tuple[Tuple[int, int],
                                                 Tuple[int, int]]:
    """Fiat-Shamir challenges bound to the invocation data (drawn AFTER
    committing it)."""
    from ..ops import poseidon2 as p2
    from ..prover.transcript import Transcript
    tr = Transcript(domain_tag=6)
    flat = []
    for inv in invocations:
        flat += ([int(x) & M32 for x in inv.state_in]
                 + list(struct.unpack(">16I", inv.block))
                 + [int(x) & M32 for x in inv.state_out])
    digest = gl.to_ints(p2.hash_elements(gl.from_int(
        [v % P for v in flat] or [0])))
    tr.absorb_ints([int(v) for v in digest] + [len(invocations)])
    ch = (tr.challenge_base(), tr.challenge_base())
    gm = (tr.challenge_base(), tr.challenge_base())
    return ch, gm


def instance_inputs(invocations, challenges, gammas, acc_in=(1, 1),
                    cnt_in: int = 0) -> Sha256InstanceInputs:
    """Bridge decomposer RoundFunctionInvocations (witness/
    precompile_rounds.py sha256_decompose) into the circuit payload. The
    decomposer's state_out is the post-feed-forward digest state, exactly
    what the circuit's digest row proves."""
    triples = []
    for inv in invocations:
        triples.append((tuple(int(x) & M32 for x in inv.state_in),
                        bytes(inv.block),
                        tuple(int(x) & M32 for x in inv.state_out)))
    return Sha256InstanceInputs(triples=triples,
                                challenges=tuple(challenges),
                                gammas=tuple(gammas),
                                acc_in=tuple(acc_in), cnt_in=cnt_in)
