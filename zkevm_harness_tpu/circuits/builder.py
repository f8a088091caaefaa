"""Gadget-synthesis builder: arithmetic DAGs -> PlonkishIR circuits.

The TPU-native counterpart of the reference's in-circuit gadget synthesis
(zkevm_circuits gadgets driven through boojum's CS builder,
src/prover_utils.rs:231-336): recursion-layer circuits there are *programs*
(verify a FRI proof, aggregate children) lowered onto a constraint system.
Here the same role is played by a small circuit compiler:

  - an ARITHMETIC region of `slots` universal PLONK slots per row, each slot
    enforcing  q_m*a*b + q_l*a + q_r*b + q_o*c + q_c = 0  over three wires
    (degree 3 — cheap quotient), with q-constants in const columns;
  - a POSEIDON2 region of 32-row permutation tiles (exactly the layout of
    circuits/poseidon2_circuit.py), whose block input/output lanes are
    copy-wired to arithmetic wires — sponges cost 32 rows, not thousands of
    slots;
  - variables are single field elements; every use-site cell of a variable
    joins one copy cycle, so equality is enforced by the engine's
    copy-permutation argument;
  - witness HINTS (prover-provided values such as inverses) become free
    variables whose defining property is enforced by explicit gates
    (x * x_inv = 1), the provided-inverse pattern of
    circuits/ext_gadget.py.

Synthesis is deterministic: for a fixed program shape the builder emits a
fixed IR + const columns + copy permutation, and `fill_witness` evaluates the
recorded op list on concrete inputs (exact host ints) to produce columns.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..ops import goldilocks as gl
from ..ops.poseidon2_params import M4, R_F, R_P, T, get_params
from ..prover import plonkish as pk
from . import poseidon2_circuit as p2c

P = gl.P
ROWS_PER_PERMUTATION = p2c.ROWS_PER_PERMUTATION  # 32
_NO = -1  # unused wire


def perm_trace_host(state: Sequence[int]) -> np.ndarray:
    """(32, 12) exact row trace of one Poseidon2 permutation (block layout
    of circuits/poseidon2_circuit.py: linear, 4 ext, 22 int, 4 ext, output).
    """
    params = get_params()
    ext = params["external_initial"] + params["external_final"]
    internal = params["internal"]
    diag = params["internal_diag"]
    half = R_F // 2

    def m_e(s):
        mixed = []
        for c in range(3):
            chunk = s[4 * c:4 * c + 4]
            mixed.extend(sum(int(M4[i, j]) * chunk[j] for j in range(4)) % P
                         for i in range(4))
        tot = [(mixed[i] + mixed[i + 4] + mixed[i + 8]) % P for i in range(4)]
        return [(mixed[i] + tot[i % 4]) % P for i in range(12)]

    rows = np.zeros((ROWS_PER_PERMUTATION, T), dtype=object)
    s = [int(v) % P for v in state]
    rows[0] = s
    s = m_e(s)
    rows[1] = s
    ri = 2
    for r in range(half):
        s = m_e([pow((x + rc) % P, 7, P) for x, rc in zip(s, ext[r])])
        rows[ri] = s
        ri += 1
    for r in range(R_P):
        sp = list(s)
        sp[0] = pow((s[0] + internal[r]) % P, 7, P)
        tot = sum(sp) % P
        s = [(int(diag[i]) * sp[i] + tot) % P for i in range(T)]
        rows[ri] = s
        ri += 1
    for r in range(half):
        s = m_e([pow((x + rc) % P, 7, P) for x, rc in zip(s, ext[half + r])])
        rows[ri] = s
        ri += 1
    return rows


_ZERO_TRACE: Optional[np.ndarray] = None


def _zero_trace() -> np.ndarray:
    global _ZERO_TRACE
    if _ZERO_TRACE is None:
        _ZERO_TRACE = perm_trace_host([0] * T)
    return _ZERO_TRACE


@dataclasses.dataclass
class _Gate:
    qm: int
    ql: int
    qr: int
    qo: int
    qc: int
    a: int
    b: int
    c: int


@dataclasses.dataclass
class BuiltCircuit:
    ir: pk.PlonkishIR
    const_cols: np.ndarray      # (num_const, n) object
    permutation: np.ndarray     # (num_witness, n, 2)
    layout: "CircuitBuilder"

    def setup(self, cfg: pk.PlonkishConfig) -> pk.PlonkishSetup:
        return pk.build_setup(self.ir, self.const_cols, self.permutation, cfg)


class CircuitBuilder:
    """Records a program of field ops + Poseidon2 permutations, then lowers
    it to (PlonkishIR, const columns, copy permutation) and evaluates it on
    concrete inputs to produce witness columns."""

    def __init__(self, slots: int = 8):
        self.S = slots
        self.gates: List[_Gate] = []
        self.ops: List[Tuple] = []
        self.perms: List[Tuple[Tuple[int, ...], Tuple[int, ...]]] = []
        self.n_vars = 0
        self.pi_vars: List[int] = []
        self._const_cache: Dict[int, int] = {}
        self._finalized = False
        self._zero: Optional[int] = None

    # -- variable creation -------------------------------------------------

    def _new(self) -> int:
        v = self.n_vars
        self.n_vars += 1
        return v

    def input(self) -> int:
        """A free input variable (set via assignments at witness time)."""
        v = self._new()
        self.ops.append(("input", v))
        return v

    def inputs(self, k: int) -> List[int]:
        return [self.input() for _ in range(k)]

    def constant(self, c: int) -> int:
        c = int(c) % P
        if c in self._const_cache:
            return self._const_cache[c]
        v = self._new()
        self.ops.append(("const", v, c))
        # v - c = 0
        self.gates.append(_Gate(0, 1, 0, 0, (-c) % P, v, _NO, _NO))
        self._const_cache[c] = v
        return v

    @property
    def zero(self) -> int:
        if self._zero is None:
            self._zero = self.constant(0)
        return self._zero

    # -- arithmetic slots --------------------------------------------------

    def add(self, x: int, y: int) -> int:
        z = self._new()
        self.ops.append(("add", z, x, y))
        self.gates.append(_Gate(0, 1, 1, P - 1, 0, x, y, z))
        return z

    def sub(self, x: int, y: int) -> int:
        z = self._new()
        self.ops.append(("sub", z, x, y))
        self.gates.append(_Gate(0, 1, P - 1, P - 1, 0, x, y, z))
        return z

    def mul(self, x: int, y: int) -> int:
        z = self._new()
        self.ops.append(("mul", z, x, y))
        self.gates.append(_Gate(1, 0, 0, P - 1, 0, x, y, z))
        return z

    def lin(self, ax: int, x: int, by: int = 0, y: int = _NO,
            c: int = 0) -> int:
        """z = ax*x + by*y + c."""
        z = self._new()
        self.ops.append(("lin", z, int(ax) % P, x, int(by) % P, y, int(c) % P))
        self.gates.append(_Gate(0, int(ax) % P, int(by) % P, P - 1,
                                int(c) % P, x, y if y != _NO else _NO, z))
        return z

    def mul_int(self, x: int, c: int) -> int:
        return self.lin(c, x)

    def add_int(self, x: int, c: int) -> int:
        return self.lin(1, x, c=c)

    def mul_add(self, x: int, y: int, z: int) -> int:
        """x*y + z (two slots: the universal gate has only three wires)."""
        return self.add(self.mul(x, y), z)

    # -- constraints -------------------------------------------------------

    def assert_zero(self, x: int):
        self.gates.append(_Gate(0, 1, 0, 0, 0, x, _NO, _NO))

    def assert_eq(self, x: int, y: int):
        self.gates.append(_Gate(0, 1, P - 1, 0, 0, x, y, _NO))

    def assert_bool(self, x: int):
        self.gates.append(_Gate(1, P - 1, 0, 0, 0, x, x, _NO))

    def assert_mul(self, x: int, y: int, z: int):
        """x * y == z without allocating a new variable."""
        self.gates.append(_Gate(1, 0, 0, P - 1, 0, x, y, z))

    # -- hints (prover-provided values with explicit defining gates) -------

    def hint(self, fn: Callable[..., int], deps: Sequence[int]) -> int:
        v = self._new()
        self.ops.append(("hint", v, fn, tuple(deps)))
        return v

    def inverse(self, x: int) -> int:
        """1/x with the provided-inverse pattern (x must be nonzero)."""
        inv = self.hint(lambda v: pow(int(v), P - 2, P), (x,))
        # x * inv - 1 = 0
        self.gates.append(_Gate(1, 0, 0, 0, P - 1, x, inv, _NO))
        return inv

    def bit(self, fn: Callable[..., int], deps: Sequence[int]) -> int:
        b = self.hint(fn, deps)
        self.assert_bool(b)
        return b

    def mux(self, b: int, x: int, y: int) -> int:
        """b ? x : y   (b boolean)."""
        d = self.sub(x, y)
        m = self.mul(b, d)
        return self.add(m, y)

    # -- Poseidon2 ---------------------------------------------------------

    def poseidon2(self, state: Sequence[int]) -> List[int]:
        assert len(state) == T
        outs = [self._new() for _ in range(T)]
        self.ops.append(("perm", tuple(outs), tuple(state)))
        self.perms.append((tuple(state), tuple(outs)))
        return outs

    # -- public inputs -----------------------------------------------------

    def mark_public(self, var: int):
        self.pi_vars.append(var)

    # -- lowering ----------------------------------------------------------

    def finalize(self, max_width: int = 160, min_log_n: int = 6,
                 copy_chunk: int = 4) -> BuiltCircuit:
        assert not self._finalized
        self._finalized = True
        S = self.S
        G = len(self.gates)
        K = len(self.perms)
        arith_rows = -(-G // S) if G else 1

        log_n = min_log_n
        while True:
            n = 1 << log_n
            if n % ROWS_PER_PERMUTATION == 0 and arith_rows <= n:
                blocks = n // ROWS_PER_PERMUTATION
                tiles = -(-K // blocks) if K else 0
                width = 3 * S + T * tiles
                if width <= max_width or log_n >= 22:
                    break
            log_n += 1
        self.log_n, self.n, self.tiles = log_n, n, tiles
        self.p2_base = 3 * S
        num_witness = 3 * S + T * tiles
        num_const = 5 * S + T + p2c.NUM_SELECTORS

        # cell map: var -> list of (col, row)
        cells: Dict[int, List[Tuple[int, int]]] = {}

        def touch(var, col, row):
            if var != _NO:
                cells.setdefault(var, []).append((col, row))

        self._gate_cells = []
        for g, gate in enumerate(self.gates):
            row, s = divmod(g, S)
            touch(gate.a, 3 * s, row)
            touch(gate.b, 3 * s + 1, row)
            touch(gate.c, 3 * s + 2, row)
        blocks_per_tile = n // ROWS_PER_PERMUTATION
        for k, (ins, outs) in enumerate(self.perms):
            t, blk = divmod(k, blocks_per_tile)
            base = self.p2_base + T * t
            r0 = blk * ROWS_PER_PERMUTATION
            for i in range(T):
                touch(ins[i], base + i, r0)
                touch(outs[i], base + i, r0 + ROWS_PER_PERMUTATION - 1)
        self.cells = cells

        # const columns
        const = np.zeros((n, num_const), dtype=object)
        for g, gate in enumerate(self.gates):
            row, s = divmod(g, S)
            const[row, 5 * s:5 * s + 5] = (gate.qm, gate.ql, gate.qr,
                                           gate.qo, gate.qc)
        block = p2c._block_const_rows()  # (32, 15)
        const[:, 5 * S:] = np.tile(block, (n // ROWS_PER_PERMUTATION, 1))

        # copy permutation: one cycle per multi-cell variable
        perm = pk.identity_permutation(num_witness, n)
        cycles = [cell_list for cell_list in cells.values()
                  if len(cell_list) > 1]
        perm = pk.apply_copy_cycles(perm, cycles)

        # public input cells: canonical (first) cell of each marked var
        pis = []
        for v in self.pi_vars:
            assert v in cells, f"public var {v} has no constrained cell"
            pis.append(cells[v][0])

        ir = self._make_ir(log_n, num_witness, num_const, tuple(pis),
                           copy_chunk)
        return BuiltCircuit(ir=ir, const_cols=const.T, permutation=perm,
                            layout=self)

    def _make_ir(self, log_n, num_witness, num_const, pis, copy_chunk):
        S, tiles, p2_base = self.S, self.tiles, self.p2_base
        params = get_params()
        diag = params["internal_diag"]

        def eval_gates(alg, w, w_next, c):
            out = []
            for s in range(S):
                a, b, o = w[3 * s], w[3 * s + 1], w[3 * s + 2]
                qm, ql, qr, qo, qc = (c[5 * s + i] for i in range(5))
                v = alg.add(alg.mul(qm, alg.mul(a, b)), alg.mul(ql, a))
                v = alg.add(v, alg.mul(qr, b))
                v = alg.add(v, alg.mul(qo, o))
                out.append(alg.add(v, qc))
            rc = [c[5 * S + i] for i in range(T)]
            s_lin, s_ext, s_int = (c[5 * S + T], c[5 * S + T + 1],
                                   c[5 * S + T + 2])
            for t in range(tiles):
                base = p2_base + T * t
                state = [w[base + i] for i in range(T)]
                nxt = [w_next[base + i] for i in range(T)]
                lin_out = p2c._external_linear_alg(alg, state)
                sboxed = [p2c._pow7_alg(alg, alg.add(state[i], rc[i]))
                          for i in range(T)]
                ext_out = p2c._external_linear_alg(alg, sboxed)
                s_prime = list(state)
                s_prime[0] = sboxed[0]
                int_out = p2c._internal_linear_alg(alg, s_prime, diag)
                for i in range(T):
                    t1 = alg.mul(s_lin, alg.sub(nxt[i], lin_out[i]))
                    t2 = alg.mul(s_ext, alg.sub(nxt[i], ext_out[i]))
                    t3 = alg.mul(s_int, alg.sub(nxt[i], int_out[i]))
                    out.append(alg.add(alg.add(t1, t2), t3))
            return out

        def eval_plonk_part(alg, w, w_next, c):
            out = []
            for s in range(S):
                a, b, o = w[3 * s], w[3 * s + 1], w[3 * s + 2]
                qm, ql, qr, qo, qc = (c[5 * s + i] for i in range(5))
                v = alg.add(alg.mul(qm, alg.mul(a, b)), alg.mul(ql, a))
                v = alg.add(v, alg.mul(qr, b))
                v = alg.add(v, alg.mul(qo, o))
                out.append(alg.add(v, qc))
            return out

        def eval_tiles_part(alg, w, w_next, c):
            out = []
            rc = [c[5 * S + i] for i in range(T)]
            s_lin, s_ext, s_int = (c[5 * S + T], c[5 * S + T + 1],
                                   c[5 * S + T + 2])
            for t in range(tiles):
                base = p2_base + T * t
                state = [w[base + i] for i in range(T)]
                nxt = [w_next[base + i] for i in range(T)]
                lin_out = p2c._external_linear_alg(alg, state)
                sboxed = [p2c._pow7_alg(alg, alg.add(state[i], rc[i]))
                          for i in range(T)]
                ext_out = p2c._external_linear_alg(alg, sboxed)
                s_prime = list(state)
                s_prime[0] = sboxed[0]
                int_out = p2c._internal_linear_alg(alg, s_prime, diag)
                for i in range(T):
                    t1 = alg.mul(s_lin, alg.sub(nxt[i], lin_out[i]))
                    t2 = alg.mul(s_ext, alg.sub(nxt[i], ext_out[i]))
                    t3 = alg.mul(s_int, alg.sub(nxt[i], int_out[i]))
                    out.append(alg.add(alg.add(t1, t2), t3))
            return out

        # degree stratification (prover-only, proofs bit-identical —
        # prover/plonkish._coset_fn_strat): the PLONK slot constraints are
        # qm*a*b + linear -> degree 3 (quotient < 2n, 2 cosets); only the
        # Poseidon2 tile rounds are degree 8 (selector * x^7)
        parts = ((eval_plonk_part, eval_tiles_part) if tiles
                 else (eval_plonk_part,))
        counts = ((S, T * tiles) if tiles else (S,))
        degs = ((3, 8) if tiles else (3,))
        cols = ((tuple(range(3 * S)),
                 tuple(range(p2_base, p2_base + T * tiles))) if tiles
                else (tuple(range(3 * S)),))
        return pk.PlonkishIR(
            log_n=log_n, num_witness=num_witness, num_const=num_const,
            gate_degree=8 if tiles else 3,
            num_gate_constraints=S + T * tiles,
            eval_gates=eval_gates, copy_chunk=copy_chunk,
            public_input_cells=pis,
            eval_gates_parts=parts, gate_part_counts=counts,
            gate_part_degrees=degs, gate_part_cols=cols)

    # -- witness evaluation ------------------------------------------------

    def eval_values(self, assignments: Dict[int, int]) -> List[int]:
        """Evaluate the op list on exact ints; `assignments` maps input vars
        to values."""
        vals: List[Optional[int]] = [None] * self.n_vars
        for op in self.ops:
            kind = op[0]
            if kind == "input":
                vals[op[1]] = int(assignments[op[1]]) % P
            elif kind == "const":
                vals[op[1]] = op[2]
            elif kind == "add":
                vals[op[1]] = (vals[op[2]] + vals[op[3]]) % P
            elif kind == "sub":
                vals[op[1]] = (vals[op[2]] - vals[op[3]]) % P
            elif kind == "mul":
                vals[op[1]] = (vals[op[2]] * vals[op[3]]) % P
            elif kind == "lin":
                _, z, ax, x, by, y, cc = op
                acc = (ax * vals[x] + cc) % P
                if y != _NO:
                    acc = (acc + by * vals[y]) % P
                vals[z] = acc
            elif kind == "hint":
                _, v, fn, deps = op
                vals[v] = int(fn(*(vals[d] for d in deps))) % P
            elif kind == "perm":
                _, outs, ins = op
                trace = perm_trace_host([vals[i] for i in ins])
                for i in range(T):
                    vals[outs[i]] = int(trace[ROWS_PER_PERMUTATION - 1][i])
            else:  # pragma: no cover
                raise ValueError(kind)
        return [v if v is not None else 0 for v in vals]

    def fill_witness(self, assignments: Dict[int, int]) -> gl.GF:
        assert self._finalized
        vals = self.eval_values(assignments)
        S, n = self.S, self.n
        W = np.zeros((self.ir_width(), n), dtype=object)
        for g, gate in enumerate(self.gates):
            row, s = divmod(g, S)
            if gate.a != _NO:
                W[3 * s, row] = vals[gate.a]
            if gate.b != _NO:
                W[3 * s + 1, row] = vals[gate.b]
            if gate.c != _NO:
                W[3 * s + 2, row] = vals[gate.c]
        blocks_per_tile = n // ROWS_PER_PERMUTATION
        zt = _zero_trace()
        for t in range(self.tiles):
            base = self.p2_base + T * t
            for blk in range(blocks_per_tile):
                k = t * blocks_per_tile + blk
                r0 = blk * ROWS_PER_PERMUTATION
                if k < len(self.perms):
                    ins, _ = self.perms[k]
                    trace = perm_trace_host([vals[i] for i in ins])
                else:
                    trace = zt
                W[base:base + T, r0:r0 + ROWS_PER_PERMUTATION] = trace.T
        return gl.from_int(W)

    def ir_width(self) -> int:
        return 3 * self.S + T * self.tiles

    def public_values(self, assignments: Dict[int, int]) -> List[int]:
        vals = self.eval_values(assignments)
        return [vals[v] for v in self.pi_vars]


# -- extension-field helpers over builder vars ------------------------------

EVar = Tuple[int, int]  # (c0 var, c1 var)
W_EXT = 7


class ExtOps:
    """GF(p^2) ops (x^2 = 7, utils/field_int.py convention) lowered to
    builder slots."""

    def __init__(self, bld: CircuitBuilder):
        self.b = bld

    def const(self, pair) -> EVar:
        return (self.b.constant(pair[0]), self.b.constant(pair[1]))

    def add(self, x: EVar, y: EVar) -> EVar:
        return (self.b.add(x[0], y[0]), self.b.add(x[1], y[1]))

    def sub(self, x: EVar, y: EVar) -> EVar:
        return (self.b.sub(x[0], y[0]), self.b.sub(x[1], y[1]))

    def mul(self, x: EVar, y: EVar) -> EVar:
        b = self.b
        m0 = b.mul(x[0], y[0])
        m1 = b.mul(x[1], y[1])
        m2 = b.mul(x[0], y[1])
        m3 = b.mul(x[1], y[0])
        c0 = b.lin(1, m0, W_EXT, m1)
        c1 = b.add(m2, m3)
        return (c0, c1)

    def mul_base(self, x: EVar, s: int) -> EVar:
        """x * s with s a base-field VAR."""
        return (self.b.mul(x[0], s), self.b.mul(x[1], s))

    def scale_int(self, x: EVar, c: int) -> EVar:
        return (self.b.mul_int(x[0], c), self.b.mul_int(x[1], c))

    def from_base(self, v: int) -> EVar:
        return (v, self.b.zero)

    def inverse(self, x: EVar) -> EVar:
        """Provided ext inverse: inv with x*inv == 1 enforced."""
        b = self.b
        i0 = b.hint(lambda a0, a1: _einv_host(a0, a1)[0], (x[0], x[1]))
        i1 = b.hint(lambda a0, a1: _einv_host(a0, a1)[1], (x[0], x[1]))
        prod = self.mul(x, (i0, i1))
        b.gates.append(_Gate(0, 1, 0, 0, P - 1, prod[0], _NO, _NO))
        b.assert_zero(prod[1])
        return (i0, i1)

    def assert_eq(self, x: EVar, y: EVar):
        self.b.assert_eq(x[0], y[0])
        self.b.assert_eq(x[1], y[1])

    def mux(self, bit: int, x: EVar, y: EVar) -> EVar:
        return (self.b.mux(bit, x[0], y[0]), self.b.mux(bit, x[1], y[1]))


def _einv_host(a0: int, a1: int) -> Tuple[int, int]:
    norm = (a0 * a0 - W_EXT * a1 * a1) % P
    ninv = pow(norm, P - 2, P)
    return (a0 * ninv) % P, (-a1 * ninv) % P
