"""Storage-application circuit (type 10): Blake2s Merkle paths in-circuit.

The reference circuit (zkevm_circuits storage_application, capacity
cycles_per_storage_application = 33 queries per 2^20-row instance) proves
depth-256 Blake2s tree openings for every deduplicated storage write. This
module proves ONE PATH per instance — leaf hash + D node hashes, chained
by constraint with path-bit-selected sibling placement — on a bit-column
Blake2s core:

  - one row per Blake2s round (10 round rows + output + chain row = 12
    rows per compression); the 16-word working state v lives as 512 bit
    columns; every G function materializes its four addition outputs
    (a', c', a'', c'') as bit columns with boolean carries while the
    xor-rotate halves (b', d', b'', d'') stay algebraic — rotations are
    free bit rewires;
  - the per-round message schedule (SIGMA) is resolved by 10 one-hot
    round selector constants, so the same gate set serves every round;
  - message words are carried bit columns: the LEAF compression absorbs
    enum_index(8B) || value(32B) || zero padding (t = 40), every NODE
    compression absorbs left || right (t = 64) where the running digest
    and the witnessed sibling are swapped by the path bit — the chain is
    enforced between compressions, so the final digest IS the Merkle root
    of the witnessed (leaf, path) under blake2s;
  - public inputs: the leaf message bits, the path bits, and the root
    digest bits (all statically placed — the oracle's tree recomputation
    pins them).

Depth is a geometry parameter: tests run D=4 against a synthetic sparse
tree built with the production leaf/node hash rules (witness/tree.py);
production instantiates D=256 (3084 rows per query).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..ops import goldilocks as gl
from ..prover import plonkish as pk

P = gl.P
ROWS_PER_COMPRESSION = 12
NUM_ROUNDS = 10

_IV = (0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
       0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19)
_H0 = tuple([_IV[0] ^ 0x01010020] + list(_IV[1:]))  # digest_len=32 params
_SIGMA = (
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    (14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    (11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    (7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    (9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    (2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    (12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    (13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    (6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    (10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0),
)
_COL_IDX = ((0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15))
_DIAG_IDX = ((0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14))


def _rotr(x: int, s: int) -> int:
    return ((x >> s) | (x << (32 - s))) & 0xFFFFFFFF


def blake2s_compress(m_words: Sequence[int], t: int) -> List[int]:
    """One final-block compression from the fixed H0 (hashlib.blake2s of a
    single <=64-byte block)."""
    v = list(_H0) + list(_IV)
    v[12] ^= t & 0xFFFFFFFF
    v[14] ^= 0xFFFFFFFF
    for r in range(NUM_ROUNDS):
        s = _SIGMA[r]
        for g in range(8):
            idx = _COL_IDX[g] if g < 4 else _DIAG_IDX[g - 4]
            a, b, c, d = (v[i] for i in idx)
            x, y = m_words[s[2 * g]], m_words[s[2 * g + 1]]
            a = (a + b + x) & 0xFFFFFFFF
            d = _rotr(d ^ a, 16)
            c = (c + d) & 0xFFFFFFFF
            b = _rotr(b ^ c, 12)
            a = (a + b + y) & 0xFFFFFFFF
            d = _rotr(d ^ a, 8)
            c = (c + d) & 0xFFFFFFFF
            b = _rotr(b ^ c, 7)
            for i, val in zip(idx, (a, b, c, d)):
                v[i] = val
    return [(_H0[i] ^ v[i] ^ v[i + 8]) & 0xFFFFFFFF for i in range(8)]


def blake2s_digest(data: bytes) -> bytes:
    assert len(data) <= 64
    t = len(data)
    padded = data + b"\x00" * (64 - len(data))
    m = [int.from_bytes(padded[4 * i:4 * i + 4], "little") for i in range(16)]
    out = blake2s_compress(m, t)
    return b"".join(w.to_bytes(4, "little") for w in out)


# --------------------------------------------------------------------------
# Column layout
# --------------------------------------------------------------------------

class _C:
    V = 0                       # 16 x 32 state bits
    M = 512                     # 16 x 32 message bits
    GA1 = 1024                  # per-G materialized words: 8 G x 4 words
    # layout: for g in 0..7: A1, C1, A2, C2 (each 32 bits)
    CARS = GA1 + 8 * 4 * 32     # per-G carries: 2+1+2+1 = 6 bits x 8
    DIGB = CARS + 48            # digest bits (defined at the output row)
    SIB = DIGB + 256            # sibling bits (on chain rows)
    PBIT = SIB + 256            # path bit (on chain rows)


NUM_WITNESS = _C.PBIT + 1

# const columns: 10 round selectors, s_absorb_leaf, s_absorb_node, s_out,
# s_mcarry (M carried rows 0..10), s_dcarry (DIGB carried row 10),
# s_chain (row 11 of non-final compressions)
K_RND = 0
K_AL, K_AN, K_SO, K_MC, K_DC, K_SH = 10, 11, 12, 13, 14, 15
NUM_CONST = 16


@dataclasses.dataclass(frozen=True)
class PathGeometry:
    depth: int      # node compressions above the leaf

    @property
    def compressions(self) -> int:
        return self.depth + 1

    @property
    def rows(self) -> int:
        return self.compressions * ROWS_PER_COMPRESSION

    @property
    def log_n(self) -> int:
        n = 16
        while n < self.rows:
            n *= 2
        return (n - 1).bit_length()

    @property
    def n(self) -> int:
        return 1 << self.log_n


def _xor(alg, a, b):
    return alg.sub(alg.add(a, b), alg.mul_int(alg.mul(a, b), 2))


def _xor_const(alg, a, bit: int):
    return alg.add_int(alg.mul_int(a, P - 1), 1) if bit else a


def _one_minus(alg, x):
    return alg.add_int(alg.mul_int(x, P - 1), 1)


def path_ir(geo: PathGeometry) -> pk.PlonkishIR:
    n = geo.n

    def eval_gates(alg, w, w_next, c):
        out = []
        s_rnd = [c[K_RND + r] for r in range(NUM_ROUNDS)]
        s_r = s_rnd[0]
        for r in range(1, NUM_ROUNDS):
            s_r = alg.add(s_r, s_rnd[r])
        s_al, s_an, s_o = c[K_AL], c[K_AN], c[K_SO]
        s_mc, s_dc, s_h = c[K_MC], c[K_DC], c[K_SH]

        def vb(word, z):
            return w[_C.V + 32 * word + z]

        def vb_n(word, z):
            return w_next[_C.V + 32 * word + z]

        def mb(word, z):
            return w[_C.M + 32 * word + z]

        def gword(g, slot, z):   # slot: 0=A1 1=C1 2=A2 3=C2
            return w[_C.GA1 + 32 * (4 * g + slot) + z]

        def val(bit_fn, *pre):
            acc = None
            for z in range(32):
                t = alg.mul_int(bit_fn(*pre, z), 1 << z)
                acc = t if acc is None else alg.add(acc, t)
            return acc

        # booleanity: state, message, G words, carries, DIGB, SIB, PBIT
        for col in (list(range(_C.V, _C.V + 512))
                    + list(range(_C.M, _C.M + 512))
                    + list(range(_C.GA1, _C.CARS + 48))
                    + list(range(_C.DIGB, _C.DIGB + 256))
                    + list(range(_C.SIB, _C.SIB + 256))
                    + [_C.PBIT]):
            b = w[col]
            out.append(alg.sub(alg.mul(b, b), b))

        # M and DIGB carried
        for z in range(512):
            out.append(alg.mul(s_mc, alg.sub(w_next[_C.M + z], w[_C.M + z])))
        for z in range(256):
            out.append(alg.mul(s_dc, alg.sub(w_next[_C.DIGB + z],
                                             w[_C.DIGB + z])))

        # v initialization at absorb rows (leaf: t=40, node: t=64)
        def vinit_bits(t):
            v = list(_H0) + list(_IV)
            v[12] ^= t
            v[14] ^= 0xFFFFFFFF
            return v

        for (sel, t) in ((s_al, 40), (s_an, 64)):
            init = vinit_bits(t)
            for word in range(16):
                for z in range(32):
                    bit = (init[word] >> z) & 1
                    target = _xor_const(alg, vb(word, z), bit)
                    out.append(alg.mul(sel, target))
        # leaf padding: message bytes 40..63 are zero
        for z in range(320, 512):
            out.append(alg.mul(s_al, w[_C.M + z]))

        # one blake2s round per round row
        def m_sel(slot_idx, z):
            """bit z of the message word sigma_r(slot_idx) under the active
            round selector."""
            acc = None
            for r in range(NUM_ROUNDS):
                t = alg.mul(s_rnd[r], mb(_SIGMA[r][slot_idx], z))
                acc = t if acc is None else alg.add(acc, t)
            return acc

        # expressions for the state entering the diagonal half
        def col_g_exprs(g):
            a_idx, b_idx, c_idx, d_idx = _COL_IDX[g]
            A1 = lambda z: gword(g, 0, z)
            C1 = lambda z: gword(g, 1, z)
            A2 = lambda z: gword(g, 2, z)
            C2 = lambda z: gword(g, 3, z)
            dp = lambda z: _xor(alg, vb(d_idx, (z + 16) % 32),
                                A1((z + 16) % 32))
            bp = lambda z: _xor(alg, vb(b_idx, (z + 12) % 32),
                                C1((z + 12) % 32))
            dpp = lambda z: _xor(alg, dp((z + 8) % 32), A2((z + 8) % 32))
            bpp = lambda z: _xor(alg, bp((z + 7) % 32), C2((z + 7) % 32))
            return A1, C1, A2, C2, dp, bp, dpp, bpp

        car = lambda g, k: w[_C.CARS + 6 * g + k]
        post: Dict[int, object] = {}   # word index -> (bit_fn)
        for g in range(4):
            a_idx, b_idx, c_idx, d_idx = _COL_IDX[g]
            A1, C1, A2, C2, dp, bp, dpp, bpp = col_g_exprs(g)
            x = val(m_sel, 2 * g)
            y = val(m_sel, 2 * g + 1)
            ca1 = alg.add(car(g, 0), alg.mul_int(car(g, 1), 2))
            ca2 = alg.add(car(g, 3), alg.mul_int(car(g, 4), 2))
            out.append(alg.mul(s_r, alg.sub(
                alg.add(val(A1), alg.mul_int(ca1, 1 << 32)),
                alg.add(alg.add(val(vb, a_idx), val(vb, b_idx)), x))))
            out.append(alg.mul(s_r, alg.sub(
                alg.add(val(C1), alg.mul_int(car(g, 2), 1 << 32)),
                alg.add(val(vb, c_idx), val(dp)))))
            out.append(alg.mul(s_r, alg.sub(
                alg.add(val(A2), alg.mul_int(ca2, 1 << 32)),
                alg.add(alg.add(val(A1), val(bp)), y))))
            out.append(alg.mul(s_r, alg.sub(
                alg.add(val(C2), alg.mul_int(car(g, 5), 1 << 32)),
                alg.add(val(C1), val(dpp)))))
            post[a_idx] = A2
            post[b_idx] = bpp
            post[c_idx] = C2
            post[d_idx] = dpp
        for gd in range(4):
            g = 4 + gd
            a_idx, b_idx, c_idx, d_idx = _DIAG_IDX[gd]
            A1 = lambda z, g=g: gword(g, 0, z)
            C1 = lambda z, g=g: gword(g, 1, z)
            A2 = lambda z, g=g: gword(g, 2, z)
            C2 = lambda z, g=g: gword(g, 3, z)
            pa, pb, pc, pd = (post[a_idx], post[b_idx], post[c_idx],
                              post[d_idx])
            dp = lambda z, pd=pd, A1=A1: _xor(alg, pd((z + 16) % 32),
                                              A1((z + 16) % 32))
            bp = lambda z, pb=pb, C1=C1: _xor(alg, pb((z + 12) % 32),
                                              C1((z + 12) % 32))
            dpp = lambda z, dp=dp, A2=A2: _xor(alg, dp((z + 8) % 32),
                                               A2((z + 8) % 32))
            bpp = lambda z, bp=bp, C2=C2: _xor(alg, bp((z + 7) % 32),
                                               C2((z + 7) % 32))
            x = val(m_sel, 2 * g)
            y = val(m_sel, 2 * g + 1)
            ca1 = alg.add(car(g, 0), alg.mul_int(car(g, 1), 2))
            ca2 = alg.add(car(g, 3), alg.mul_int(car(g, 4), 2))
            out.append(alg.mul(s_r, alg.sub(
                alg.add(val(A1), alg.mul_int(ca1, 1 << 32)),
                alg.add(alg.add(val(pa), val(pb)), x))))
            out.append(alg.mul(s_r, alg.sub(
                alg.add(val(C1), alg.mul_int(car(g, 2), 1 << 32)),
                alg.add(val(pc), val(dp)))))
            out.append(alg.mul(s_r, alg.sub(
                alg.add(val(A2), alg.mul_int(ca2, 1 << 32)),
                alg.add(alg.add(val(A1), val(bp)), y))))
            out.append(alg.mul(s_r, alg.sub(
                alg.add(val(C2), alg.mul_int(car(g, 5), 1 << 32)),
                alg.add(val(C1), val(dpp)))))
            # the new state for the involved words
            post[a_idx] = A2
            post[b_idx] = bpp
            post[c_idx] = C2
            post[d_idx] = dpp
        # state transition into the next row
        for word in range(16):
            fn = post[word]
            for z in range(32):
                out.append(alg.mul(s_r, alg.sub(vb_n(word, z), fn(z))))

        # digest at the output row: dig = H0 ^ v ^ v8
        for word in range(8):
            for z in range(32):
                bit_h = (_H0[word] >> z) & 1
                expr = _xor(alg, vb(word, z), vb(word + 8, z))
                expr = _xor_const(alg, expr, bit_h)
                out.append(alg.mul(s_o, alg.sub(w[_C.DIGB + 32 * word + z],
                                                expr)))

        # chain row: next absorb's message = pbit ? (sib || dig) swap
        pbit = w[_C.PBIT]
        for word in range(8):
            for z in range(32):
                dig = w[_C.DIGB + 32 * word + z]
                sib = w[_C.SIB + 32 * word + z]
                lo = alg.add(alg.mul(pbit, sib),
                             alg.mul(_one_minus(alg, pbit), dig))
                hi = alg.add(alg.mul(pbit, dig),
                             alg.mul(_one_minus(alg, pbit), sib))
                out.append(alg.mul(s_h, alg.sub(
                    w_next[_C.M + 32 * word + z], lo)))
                out.append(alg.mul(s_h, alg.sub(
                    w_next[_C.M + 32 * (word + 8) + z], hi)))
        return out

    n_constraints = (
        (512 + 512 + 8 * 4 * 32 + 48 + 256 + 256 + 1)  # booleanity
        + 512 + 256                                     # M/DIGB carries
        + 2 * 512 + 192                                 # v init + leaf pad
        + 8 * 4                                         # G word equations
        + 512                                           # state transition
        + 256                                           # digest definition
        + 512)                                          # chain selection

    # public inputs: leaf message bits (320), path bits per level, root bits
    last_out_row = geo.depth * ROWS_PER_COMPRESSION + NUM_ROUNDS
    pis: List[Tuple[int, int]] = []
    for z in range(320):
        pis.append((_C.M + z, 0))
    for k in range(geo.depth):
        pis.append((_C.PBIT, k * ROWS_PER_COMPRESSION + 11))
    for z in range(256):
        pis.append((_C.DIGB + z, last_out_row))

    return pk.PlonkishIR(
        log_n=geo.log_n, num_witness=NUM_WITNESS, num_const=NUM_CONST,
        gate_degree=6, num_gate_constraints=n_constraints,
        eval_gates=eval_gates, copy_chunk=4,
        public_input_cells=tuple(pis))


def _const_rows(geo: PathGeometry) -> np.ndarray:
    n = geo.n
    rows = np.zeros((n, NUM_CONST), dtype=object)
    for k in range(geo.compressions):
        base = k * ROWS_PER_COMPRESSION
        for r in range(NUM_ROUNDS):
            rows[base + r, K_RND + r] = 1
        rows[base, K_AL if k == 0 else K_AN] = 1
        rows[base + NUM_ROUNDS, K_SO] = 1
        rows[base + NUM_ROUNDS, K_DC] = 1  # DIGB carried 10 -> 11
        for r in range(NUM_ROUNDS + 1):
            rows[base + r, K_MC] = 1       # M carried 0..10 -> 1..11
        if k < geo.compressions - 1:
            rows[base + 11, K_SH] = 1      # chain into the next absorb
    return rows


def path_setup(ir: pk.PlonkishIR, geo: PathGeometry,
               cfg: pk.PlonkishConfig) -> pk.PlonkishSetup:
    const = _const_rows(geo).T
    perm = pk.identity_permutation(ir.num_witness, geo.n)
    return pk.build_setup(ir, const, perm, cfg)


# --------------------------------------------------------------------------
# Witness generation
# --------------------------------------------------------------------------

def _word_bits(v: int) -> List[int]:
    return [(int(v) >> z) & 1 for z in range(32)]


def _bytes_to_words(data: bytes) -> List[int]:
    padded = data + b"\x00" * (64 - len(data))
    return [int.from_bytes(padded[4 * i:4 * i + 4], "little")
            for i in range(16)]


@dataclasses.dataclass
class PathInstanceInputs:
    """One Merkle opening: the leaf preimage, path bits (LSB = level 0),
    and the sibling hashes bottom-up."""
    leaf_preimage: bytes          # 40 bytes: enum_index_u64_be || value_32
    path_bits: List[int]          # depth entries
    siblings: List[bytes]         # depth 32-byte hashes


def path_witness(ir: pk.PlonkishIR, geo: PathGeometry,
                 inst: PathInstanceInputs) -> gl.GF:
    assert len(inst.path_bits) == geo.depth
    assert len(inst.siblings) == geo.depth
    n = geo.n
    W = np.zeros((ir.num_witness, n), dtype=object)

    def fill_compression(k: int, m_words: List[int], t: int) -> List[int]:
        base = k * ROWS_PER_COMPRESSION
        for word in range(16):
            W[_C.M + 32 * word:_C.M + 32 * word + 32,
              base:base + NUM_ROUNDS + 2] = \
                np.array(_word_bits(m_words[word]), dtype=object)[:, None]
        v = list(_H0) + list(_IV)
        v[12] ^= t
        v[14] ^= 0xFFFFFFFF
        for r in range(NUM_ROUNDS):
            row = base + r
            for word in range(16):
                W[_C.V + 32 * word:_C.V + 32 * word + 32, row] = \
                    _word_bits(v[word])
            s = _SIGMA[r]
            for g in range(8):
                idx = _COL_IDX[g] if g < 4 else _DIAG_IDX[g - 4]
                a, b, c, d = (v[i] for i in idx)
                x, y = m_words[s[2 * g]], m_words[s[2 * g + 1]]
                t1 = a + b + x
                a1 = t1 & 0xFFFFFFFF
                ca1 = t1 >> 32
                d1 = _rotr(d ^ a1, 16)
                t2 = c + d1
                c1 = t2 & 0xFFFFFFFF
                cc1 = t2 >> 32
                b1 = _rotr(b ^ c1, 12)
                t3 = a1 + b1 + y
                a2 = t3 & 0xFFFFFFFF
                ca2 = t3 >> 32
                d2 = _rotr(d1 ^ a2, 8)
                t4 = c1 + d2
                c2 = t4 & 0xFFFFFFFF
                cc2 = t4 >> 32
                b2 = _rotr(b1 ^ c2, 7)
                for slot, wv in enumerate((a1, c1, a2, c2)):
                    W[_C.GA1 + 32 * (4 * g + slot):
                      _C.GA1 + 32 * (4 * g + slot) + 32, row] = \
                        _word_bits(wv)
                W[_C.CARS + 6 * g + 0, row] = ca1 & 1
                W[_C.CARS + 6 * g + 1, row] = ca1 >> 1
                W[_C.CARS + 6 * g + 2, row] = cc1
                W[_C.CARS + 6 * g + 3, row] = ca2 & 1
                W[_C.CARS + 6 * g + 4, row] = ca2 >> 1
                W[_C.CARS + 6 * g + 5, row] = cc2
                for i, wv in zip(idx, (a2, b2, c2, d2)):
                    v[i] = wv
        # rows 10, 11: final state + digest
        for word in range(16):
            W[_C.V + 32 * word:_C.V + 32 * word + 32,
              base + NUM_ROUNDS] = _word_bits(v[word])
        dig = [(_H0[i] ^ v[i] ^ v[i + 8]) & 0xFFFFFFFF for i in range(8)]
        for word in range(8):
            bits = _word_bits(dig[word])
            W[_C.DIGB + 32 * word:_C.DIGB + 32 * word + 32,
              base + NUM_ROUNDS] = bits
            W[_C.DIGB + 32 * word:_C.DIGB + 32 * word + 32,
              base + NUM_ROUNDS + 1] = bits
        return dig

    dig = fill_compression(0, _bytes_to_words(inst.leaf_preimage), 40)
    for k in range(geo.depth):
        base = k * ROWS_PER_COMPRESSION
        pbit = int(inst.path_bits[k]) & 1
        sib_words = [int.from_bytes(inst.siblings[k][4 * i:4 * i + 4],
                                    "little") for i in range(8)]
        for word in range(8):
            W[_C.SIB + 32 * word:_C.SIB + 32 * word + 32, base + 11] = \
                _word_bits(sib_words[word])
        W[_C.PBIT, base + 11] = pbit
        dig_bytes = b"".join(w.to_bytes(4, "little") for w in dig)
        sib = inst.siblings[k]
        data = (sib + dig_bytes) if pbit else (dig_bytes + sib)
        dig = fill_compression(k + 1, _bytes_to_words(data), 64)
    return gl.from_int(W)


def expected_public_inputs(geo: PathGeometry, inst: PathInstanceInputs
                           ) -> List[int]:
    out: List[int] = []
    leaf_words = _bytes_to_words(inst.leaf_preimage)
    for word in range(10):
        out += _word_bits(leaf_words[word])
    out += [int(b) & 1 for b in inst.path_bits]
    # replay the path for the root
    dig = blake2s_digest(inst.leaf_preimage)
    for k in range(geo.depth):
        sib = inst.siblings[k]
        data = (sib + dig) if (int(inst.path_bits[k]) & 1) else (dig + sib)
        dig = blake2s_digest(data)
    for word in range(8):
        out += _word_bits(int.from_bytes(dig[4 * word:4 * word + 4],
                                         "little"))
    return out


def root_bytes(geo: PathGeometry, pis: Sequence[int]) -> bytes:
    bits = [int(v) for v in pis[-256:]]
    out = b""
    for word in range(8):
        w = sum(bits[32 * word + z] << z for z in range(32))
        out += w.to_bytes(4, "little")
    return out
