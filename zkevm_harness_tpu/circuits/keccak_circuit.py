"""Keccak-f[1600] round-function circuit: the type-5 compute core.

The reference keccak circuit
(circuit_definitions base_layer keccak256_round_function + the decomposer
src/witness/individual_circuits/keccak256_round_function.rs:23) proves
batches of keccak-f permutations driven by the demuxed precompile queue.
This module proves the PERMUTATIONS — the hot compute — with the
per-invocation (input state, output state) pairs bound to the witness
decomposer's replay (witness/precompile_rounds.py) through a
Reed-Solomon-fingerprint accumulator; queue/memory plumbing composes on top
exactly like the sorter circuits' binding.

TPU-first bit-column layout (no lookup tables):
  - 1600 state-bit columns A[lane][z]; row 32k+r holds the state ENTERING
    round r of invocation k (24 round rows + row 24 = output; rows 25..31
    idle carry);
  - theta parities C[x][z] materialized (320 cols, degree-5 xor), the
    post-theta state AP materialized (1600 cols, degree-3), rho/pi are free
    column rewires, chi+iota feed the next row (degree-3 with round
    constants in 64 const columns);
  - booleanity enforced on every absorbed state bit (boolean-ness then
    propagates through the algebraic xors);
  - binding: 2 independent fingerprints  acc *= gamma + sum_j limb_j ch^j
    over the 100 32-bit limbs of (state_in, state_out) per invocation
    (challenge powers materialized in 100 columns per repetition, state_in
    staged through a carried partial sum so the row-24 gate sees both
    halves); challenges and accumulator ends are public inputs drawn by the
    decomposer AFTER committing the invocation data — the same
    challenge-after-commit shape as every sorter's permutation argument;
  - FSM: per-block validity flags + invocation count chain across
    instances (acc_in/out, cnt_in/out public inputs).

state_in here is the POST-ABSORB state (state xor block) — the decomposer
knows both pre-state and block, and the chaining of multi-block calls is
asserted at witness time (in-circuit chaining is the follow-up increment).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..ops import goldilocks as gl
from ..prover import plonkish as pk
from ..utils.keccak import _RC, _ROT

P = gl.P
ROWS_PER_INVOCATION = 32
NUM_ROUNDS = 24
NUM_LANES = 25
NUM_BITS = 64 * NUM_LANES          # 1600
NUM_LIMBS = 2 * NUM_LANES          # 50 32-bit limbs per state
NUM_REPS = 2
POWS_PER_REP = 2 * NUM_LIMBS       # 100 challenge powers


class _C:
    """Column offsets."""
    A = 0
    CP = NUM_BITS                       # 320 theta parity columns
    AP = NUM_BITS + 320                 # 1600 post-theta columns
    PCH = 2 * NUM_BITS + 320            # 2 reps x 100 challenge powers
    GAMMA = PCH + NUM_REPS * POWS_PER_REP   # 2 gamma columns
    SIN = GAMMA + NUM_REPS              # 2 carried input-half sums
    ACC = SIN + NUM_REPS                # 2 accumulators
    V = ACC + NUM_REPS                  # block validity
    CNT = V + 1


NUM_WITNESS = _C.CNT + 1

# const columns: s_round, s_absorb, s_out, s_carry (acc/cnt carry rows),
# s_bend (block end, no wrap), s_sin_carry, s_wrap (row n-1),
# 64 iota RC bit columns
K_SR, K_SA, K_SO, K_SC, K_SB, K_SS, K_SW = 0, 1, 2, 3, 4, 5, 6
K_RC = 7
NUM_CONST = K_RC + 64


def _pi_inverse() -> List[Tuple[int, int]]:
    """For output lane (x,y): the (a,b) with pi(a,b) = (x,y), where
    pi(a,b) = (b, (2a+3b) % 5)."""
    inv = {}
    for a in range(5):
        for b in range(5):
            inv[(b, (2 * a + 3 * b) % 5)] = (a, b)
    return inv


_PI_INV = _pi_inverse()


def _lane_col(x: int, y: int, z: int, base: int) -> int:
    """Flat column of bit z of lane (x, y): lane index l = x + 5y (the
    decomposer's flat_in ordering, state[i%5][i//5])."""
    return base + 64 * (x + 5 * y) + z


def _one_minus(alg, v):
    return alg.add_int(alg.mul_int(v, P - 1), 1)


def _xor(alg, a, b):
    # a ^ b = a + b - 2ab for boolean a, b
    return alg.sub(alg.add(a, b), alg.mul_int(alg.mul(a, b), 2))


@dataclasses.dataclass(frozen=True)
class KeccakGeometry:
    log_n: int

    @property
    def n(self) -> int:
        return 1 << self.log_n

    @property
    def capacity(self) -> int:
        """keccak-f invocations per instance
        (cycles_per_keccak256_circuit analogue)."""
        return self.n // ROWS_PER_INVOCATION


def keccak_ir(log_n: int) -> pk.PlonkishIR:
    geo = KeccakGeometry(log_n)
    n = geo.n
    assert n >= ROWS_PER_INVOCATION

    def eval_gates(alg, w, w_next, c):
        out = []
        s_r, s_a, s_o = c[K_SR], c[K_SA], c[K_SO]
        s_c, s_b, s_s, s_w = c[K_SC], c[K_SB], c[K_SS], c[K_SW]

        A = lambda x, y, z: w[_lane_col(x, y, z, _C.A)]
        A_n = lambda x, y, z: w_next[_lane_col(x, y, z, _C.A)]
        CP = lambda x, z: w[_C.CP + 64 * x + z]
        AP = lambda x, y, z: w[_lane_col(x, y, z, _C.AP)]

        # theta parities: C[x][z] = xor of the column's 5 bits (degree 5)
        for x in range(5):
            for z in range(64):
                p5 = A(x, 0, z)
                for y in range(1, 5):
                    p5 = _xor(alg, p5, A(x, y, z))
                out.append(alg.mul(s_r, alg.sub(CP(x, z), p5)))
        # post-theta: AP[x][y][z] = A ^ D, D = C[x-1][z] ^ C[x+1][z-1]
        for x in range(5):
            for z in range(64):
                d = _xor(alg, CP((x + 4) % 5, z), CP((x + 1) % 5, (z + 63) % 64))
                for y in range(5):
                    out.append(alg.mul(s_r, alg.sub(
                        AP(x, y, z), _xor(alg, A(x, y, z), d))))

        # rho/pi rewire + chi + iota into the next row
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

        # booleanity of the absorbed state
        for l in range(NUM_LANES):
            for z in range(64):
                b = w[_C.A + 64 * l + z]
                out.append(alg.mul(s_a, alg.sub(alg.mul(b, b), b)))

        # fingerprint machinery
        def limb(row_fn, j):
            """32-bit limb j of the state on a row: lane j//2, half j%2."""
            l, half = j // 2, j % 2
            acc_ = None
            for k in range(32):
                bit = row_fn(l % 5, l // 5, 32 * half + k)
                term = alg.mul_int(bit, 1 << k)
                acc_ = term if acc_ is None else alg.add(acc_, term)
            return acc_

        v, v_n = w[_C.V], w_next[_C.V]
        cnt, cnt_n = w[_C.CNT], w_next[_C.CNT]
        out.append(alg.sub(alg.mul(v, v), v))
        out.append(alg.mul(s_b, alg.mul(v_n, _one_minus(alg, v))))
        out.append(alg.mul(_one_minus(alg, alg.add(s_b, s_w)),
                           alg.sub(v_n, v)))
        out.append(alg.mul(s_o, alg.sub(cnt_n, alg.add(cnt, v))))
        out.append(alg.mul(s_c, alg.sub(cnt_n, cnt)))

        for rep in range(NUM_REPS):
            pch = [w[_C.PCH + rep * POWS_PER_REP + j]
                   for j in range(POWS_PER_REP)]
            gamma = w[_C.GAMMA + rep]
            sin = w[_C.SIN + rep]
            sin_n = w_next[_C.SIN + rep]
            acc = w[_C.ACC + rep]
            acc_n = w_next[_C.ACC + rep]
            # challenge powers: globally constant; pch[j+1] = pch[j]*pch[0]
            out.append(alg.sub(w_next[_C.GAMMA + rep], gamma))
            for j in range(POWS_PER_REP):
                out.append(alg.sub(w_next[_C.PCH + rep * POWS_PER_REP + j],
                                   pch[j]))
            for j in range(POWS_PER_REP - 1):
                out.append(alg.mul(s_a, alg.sub(pch[j + 1],
                                                alg.mul(pch[j], pch[0]))))
            # input-half sum staged at the absorb row, carried to row 24
            s_in = None
            for j in range(NUM_LIMBS):
                term = alg.mul(pch[j], limb(A, j))
                s_in = term if s_in is None else alg.add(s_in, term)
            out.append(alg.mul(s_a, alg.sub(sin, s_in)))
            out.append(alg.mul(s_s, alg.sub(sin_n, sin)))
            # accumulator step at row 24 (the output row is w_next of row 23;
            # s_o sits on row 24 so the OUT limbs come from w there)
            s_out = None
            for j in range(NUM_LIMBS):
                term = alg.mul(pch[NUM_LIMBS + j], limb(A, j))
                s_out = term if s_out is None else alg.add(s_out, term)
            t = alg.add(gamma, alg.add(sin, s_out))
            gated = alg.add(alg.mul(v, t), _one_minus(alg, v))
            out.append(alg.mul(s_o, alg.sub(acc_n, alg.mul(acc, gated))))
            out.append(alg.mul(s_c, alg.sub(acc_n, acc)))
        return out

    n_constraints = (320 + NUM_BITS + NUM_BITS       # theta, AP, chi
                     + NUM_BITS                      # booleanity
                     + 5                             # v/cnt chains
                     + NUM_REPS * (1 + POWS_PER_REP  # gamma/pch constancy
                                   + POWS_PER_REP - 1  # pch definition
                                   + 2 + 2))         # sin + acc

    pis: List[Tuple[int, int]] = []
    for rep in range(NUM_REPS):
        pis.append((_C.PCH + rep * POWS_PER_REP, 0))   # the challenge
        pis.append((_C.GAMMA + rep, 0))
    pis += [(_C.ACC + rep, 0) for rep in range(NUM_REPS)]
    pis += [(_C.ACC + rep, n - 1) for rep in range(NUM_REPS)]
    pis += [(_C.V, 0), (_C.CNT, 0), (_C.CNT, n - 1)]

    return pk.PlonkishIR(
        log_n=log_n, num_witness=NUM_WITNESS, num_const=NUM_CONST,
        gate_degree=8, num_gate_constraints=n_constraints,
        eval_gates=eval_gates, copy_chunk=4,
        public_input_cells=tuple(pis))


def _const_rows(geo: KeccakGeometry) -> np.ndarray:
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
        if rr < NUM_ROUNDS:
            rows[r, K_SS] = 1     # SIN carried through round rows
        if rr != NUM_ROUNDS and r != n - 1:
            rows[r, K_SC] = 1     # acc/cnt carried elsewhere (no wrap)
        if rr == ROWS_PER_INVOCATION - 1 and r != n - 1:
            rows[r, K_SB] = 1     # block end (validity may drop)
    rows[n - 1, K_SW] = 1
    return rows


def keccak_setup(ir: pk.PlonkishIR, geo: KeccakGeometry,
                 cfg: pk.PlonkishConfig) -> pk.PlonkishSetup:
    const = _const_rows(geo).T
    perm = pk.identity_permutation(ir.num_witness, geo.n)
    return pk.build_setup(ir, const, perm, cfg)


# ---------------------------------------------------------------------------
# Witness generation
# ---------------------------------------------------------------------------

def keccak_round_trace(state_in: Sequence[int]):
    """Per-round bit traces for one keccak-f: returns (A_rows (25, 25 lanes),
    C_rows (24, 5), AP_rows (24, 25)) as u64 lane values; A_rows[r] is the
    state entering round r, A_rows[24] the output."""
    a = [[int(state_in[x + 5 * y]) for y in range(5)] for x in range(5)]
    A_rows, C_rows, AP_rows = [], [], []

    def flat(m):
        return [m[i % 5][i // 5] for i in range(25)]

    M = (1 << 64) - 1
    for rnd in range(NUM_ROUNDS):
        A_rows.append(flat(a))
        cpar = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4]
                for x in range(5)]
        C_rows.append(list(cpar))
        d = [cpar[(x - 1) % 5]
             ^ (((cpar[(x + 1) % 5] << 1) | (cpar[(x + 1) % 5] >> 63)) & M)
             for x in range(5)]
        ap = [[a[x][y] ^ d[x] for y in range(5)] for x in range(5)]
        AP_rows.append(flat(ap))
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                r = _ROT[x][y]
                b[y][(2 * x + 3 * y) % 5] = \
                    (((ap[x][y] << r) | (ap[x][y] >> (64 - r))) & M)
        a = [[b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y] & M)
              for y in range(5)] for x in range(5)]
        a[0][0] ^= _RC[rnd]
    A_rows.append(flat(a))
    return A_rows, C_rows, AP_rows


def _lanes_to_bits(lanes: Sequence[int]) -> List[int]:
    out = []
    for l in lanes:
        out += [(int(l) >> z) & 1 for z in range(64)]
    return out


def state_limbs(lanes: Sequence[int]) -> List[int]:
    """50 32-bit limbs (lane-low, lane-high per lane)."""
    out = []
    for l in lanes:
        out += [int(l) & 0xFFFFFFFF, (int(l) >> 32) & 0xFFFFFFFF]
    return out


def fingerprint(challenges: Sequence[int], gammas: Sequence[int],
                pairs: Sequence[Tuple[Sequence[int], Sequence[int]]],
                acc_in: Sequence[int] = (1, 1)) -> List[int]:
    """Host-side accumulator over (state_in, state_out) lane pairs — what
    the circuit's public accumulator outputs must equal."""
    accs = [int(a) % P for a in acc_in]
    for (si, so) in pairs:
        limbs = state_limbs(si) + state_limbs(so)
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
class KeccakInstanceInputs:
    """One instance's payload: post-absorb input states and output states."""
    state_pairs: List[Tuple[Tuple[int, ...], Tuple[int, ...]]]
    challenges: Tuple[int, int]
    gammas: Tuple[int, int]
    acc_in: Tuple[int, int]
    cnt_in: int


def keccak_witness(ir: pk.PlonkishIR, geo: KeccakGeometry,
                   inst: KeccakInstanceInputs) -> gl.GF:
    n = geo.n
    count = len(inst.state_pairs)
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
    for k in range(geo.capacity):
        base = k * ROWS_PER_INVOCATION
        valid = k < count
        if valid:
            si, so = inst.state_pairs[k]
            A_rows, C_rows, AP_rows = keccak_round_trace(si)
            assert tuple(A_rows[-1]) == tuple(int(v) for v in so), \
                "state_out does not match keccak-f(state_in)"
        else:
            A_rows, C_rows, AP_rows = keccak_round_trace([0] * 25)
        for r in range(NUM_ROUNDS):
            W[_C.A:_C.A + NUM_BITS, base + r] = _lanes_to_bits(A_rows[r])
            for x in range(5):
                W[_C.CP + 64 * x:_C.CP + 64 * x + 64, base + r] = \
                    [(C_rows[r][x] >> z) & 1 for z in range(64)]
            W[_C.AP:_C.AP + NUM_BITS, base + r] = _lanes_to_bits(AP_rows[r])
        W[_C.A:_C.A + NUM_BITS, base + NUM_ROUNDS] = \
            _lanes_to_bits(A_rows[NUM_ROUNDS])
        # fingerprint staging
        limbs_in = state_limbs(A_rows[0])
        limbs_out = state_limbs(A_rows[NUM_ROUNDS])
        for rep in range(NUM_REPS):
            sin = sum(pows[rep][j] * limbs_in[j]
                      for j in range(NUM_LIMBS)) % P
            W[_C.SIN + rep, base:base + NUM_ROUNDS + 1] = sin
            W[_C.ACC + rep, base:base + NUM_ROUNDS + 1] = accs[rep]
            if valid:
                sout = sum(pows[rep][NUM_LIMBS + j] * limbs_out[j]
                           for j in range(NUM_LIMBS)) % P
                accs[rep] = accs[rep] * ((gm[rep] + sin + sout) % P) % P
            W[_C.ACC + rep, base + NUM_ROUNDS + 1:
              base + ROWS_PER_INVOCATION] = accs[rep]
        W[_C.V, base:base + ROWS_PER_INVOCATION] = 1 if valid else 0
        W[_C.CNT, base:base + NUM_ROUNDS + 1] = cnt
        if valid:
            cnt += 1
        W[_C.CNT, base + NUM_ROUNDS + 1:base + ROWS_PER_INVOCATION] = cnt
    return gl.from_int(W)


def expected_public_inputs(geo: KeccakGeometry, inst: KeccakInstanceInputs
                           ) -> List[int]:
    acc_out = fingerprint(inst.challenges, inst.gammas,
                          inst.state_pairs, inst.acc_in)
    out = []
    for rep in range(NUM_REPS):
        out += [int(inst.challenges[rep]) % P, int(inst.gammas[rep]) % P]
    out += [int(a) % P for a in inst.acc_in]
    out += acc_out
    out += [1 if inst.state_pairs else 0,
            int(inst.cnt_in), int(inst.cnt_in) + len(inst.state_pairs)]
    return out


def instance_public_inputs(geo: KeccakGeometry, inst_w, challenges_gammas
                           ) -> List[int]:
    """PIs from a decomposer-level RoundFunctionInstanceWitness
    (witness/precompile_circuits.py) — the typed-layer-surface bridge."""
    ch, gm = challenges_gammas
    inst = instance_inputs(inst_w.invocations, ch, gm, inst_w.acc_in,
                           inst_w.cnt_in)
    return expected_public_inputs(geo, inst)


def draw_keccak_challenges(invocations) -> Tuple[Tuple[int, int],
                                                 Tuple[int, int]]:
    """Fiat-Shamir challenges bound to the invocation data (drawn AFTER
    committing it, like the sorters' permutation challenges)."""
    from ..ops import poseidon2 as p2
    from ..prover.transcript import Transcript
    tr = Transcript(domain_tag=5)
    flat = []
    for inv in invocations:
        post = [si ^ int.from_bytes(inv.block[8 * i:8 * i + 8], "little")
                if 8 * i < len(inv.block) else si
                for i, si in enumerate(inv.state_in)]
        flat += state_limbs(post) + state_limbs(inv.state_out)
    digest = gl.to_ints(p2.hash_elements(gl.from_int(
        [v % P for v in flat] or [0])))
    tr.absorb_ints([int(v) for v in digest] + [len(invocations)])
    ch = (tr.challenge_base(), tr.challenge_base())
    gm = (tr.challenge_base(), tr.challenge_base())
    return ch, gm


def instance_inputs(invocations, challenges, gammas, acc_in=(1, 1),
                    cnt_in: int = 0) -> KeccakInstanceInputs:
    """Bridge decomposer RoundFunctionInvocations (witness/
    precompile_rounds.py) into the circuit payload: state_in here is the
    POST-ABSORB state."""
    pairs = []
    for inv in invocations:
        post = tuple(
            si ^ (int.from_bytes(inv.block[8 * i:8 * i + 8], "little")
                  if 8 * i < len(inv.block) else 0)
            for i, si in enumerate(inv.state_in))
        pairs.append((post, tuple(int(v) for v in inv.state_out)))
    return KeccakInstanceInputs(state_pairs=pairs,
                                challenges=tuple(challenges),
                                gammas=tuple(gammas),
                                acc_in=tuple(acc_in), cnt_in=cnt_in)
