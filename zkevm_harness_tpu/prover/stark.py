"""Generic AIR STARK prover/verifier over Goldilocks (Poseidon2 + FRI).

The TPU-native proof engine corresponding to boojum's
`prove_from_precomputations` pipeline (reference call: src/prover_utils.rs:338-348
— witness LDE, Merkle commit, Fiat-Shamir, quotient evaluation over cosets,
DEEP poly, FRI). This module implements the engine for a generic AIR
(transition + boundary constraints); the zkEVM circuit geometries (gates,
copy-permutation, lookups — circuit_definitions) layer on top of it.

All heavy phases are batched device kernels over whole columns/domains:
  - trace LDE: one coset-NTT over (width, N·L)
  - constraint evaluation: vectorized over all LDE points (next-row = roll by
    lde_factor in the natural-order coset domain)
  - quotient split/commit, DEEP composition, FRI folds: fused elementwise
Transcript/query logic runs host-side between kernels.

Constraints are written once against an `Algebra` adapter and evaluated both
on-device (base-field arrays over the LDE domain) and host-side (exact ext
ints at the OOD point) — the same duality the reference gets from boojum's
generic gate evaluators.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import goldilocks as gl
from ..ops import merkle as mk
from ..ops import ntt as nt
from ..ops.goldilocks import GF, GF2, P
from ..utils import field_int as fi
from .fri import FriConfig, FriProof, fri_prove, fri_verify
from .transcript import Transcript


# ---------------------------------------------------------------------------
# Algebra adapters: one constraint definition, two evaluation modes
# ---------------------------------------------------------------------------

class DeviceAlgebra:
    """Constraints over base-field GF arrays (whole LDE domain at once)."""

    def add(self, a, b):
        return gl.add(a, b)

    def sub(self, a, b):
        return gl.sub(a, b)

    def mul(self, a, b):
        return gl.mul(a, b)

    def mul_int(self, a, c: int):
        return gl.mul(a, gl.broadcast_to(gl.from_int(c % P), a.shape))

    def add_int(self, a, c: int):
        return gl.add(a, gl.broadcast_to(gl.from_int(c % P), a.shape))


class HostExtAlgebra:
    """Constraints over exact ext-int tuples (OOD point evaluation)."""

    def add(self, a, b):
        return fi.eadd(a, b)

    def sub(self, a, b):
        return fi.esub(a, b)

    def mul(self, a, b):
        return fi.emul(a, b)

    def mul_int(self, a, c: int):
        return fi.escale(a, c % P)

    def add_int(self, a, c: int):
        return fi.eadd(a, (c % P, 0))


@dataclasses.dataclass(frozen=True)
class Air:
    """An algebraic intermediate representation.

    eval_transitions(alg, row, next_row) -> list of constraint values; `row`
    is a list of `width` column values (GF arrays on device, ext tuples on
    host). Transition constraints must hold on rows 0..N-2.
    boundary: list of (row_index, col_index, value) assertions.
    """

    width: int
    log_n: int
    constraint_degree: int
    num_transitions: int
    eval_transitions: Callable
    boundary: Tuple[Tuple[int, int, int], ...] = ()


@dataclasses.dataclass(frozen=True)
class StarkConfig:
    lde_factor: int = 4
    cap_size: int = 16
    num_queries: int = 40
    final_fri_size: int = 32  # final FRI codeword size

    def fri_config(self, n_lde: int) -> FriConfig:
        rounds = (n_lde // self.final_fri_size).bit_length() - 1
        return FriConfig(folding_rounds=rounds, cap_size=self.cap_size,
                         num_queries=self.num_queries, lde_factor=self.lde_factor)


@dataclasses.dataclass
class StarkProof:
    trace_cap: np.ndarray
    quotient_cap: np.ndarray
    ood_trace: List[Tuple[int, int]]  # T_j(z)
    ood_trace_next: List[Tuple[int, int]]  # T_j(z w)
    ood_quotient: List[Tuple[int, int]]  # Q_j(z)
    trace_openings: Dict[int, List[int]]  # lde index -> row values
    trace_paths: Dict[int, np.ndarray]
    quotient_openings: Dict[int, List[int]]
    quotient_paths: Dict[int, np.ndarray]
    fri: FriProof


def _ext_bcast(x: GF2, shape) -> GF2:
    return GF2(gl.broadcast_to(x.c0, shape), gl.broadcast_to(x.c1, shape))


def _batch_inv_base(x: GF) -> GF:
    return gl.inv(x)


def _columns(a: GF) -> List[GF]:
    return [a[i] for i in range(a.shape[0])]


def _zh_over_last_inv(n: int, lde: int, shift: int) -> Tuple[GF, GF]:
    """Host-exact: 1/Z_Ht(x_i) on the LDE coset, where
    Z_Ht(x) = (x^N - 1)/(x - w^{N-1}); also returns (x_i - w^{N-1}) vector.

    x_i^N is periodic with period `lde`, so only `lde` exact inversions happen
    host-side; the (x - w_last) vector inverse is folded into the quotient on
    device instead (returned separately).
    """
    n_lde = n * lde
    log_nl = n_lde.bit_length() - 1
    v = gl.primitive_root_of_unity(log_nl)
    w_last = pow(gl.primitive_root_of_unity(n.bit_length() - 1), n - 1, P)
    # (x^N - 1) inverse, periodic
    t = pow(v, n, P)
    gN = pow(shift, n, P)
    zh_small = [(gN * pow(t, i, P) - 1) % P for i in range(lde)]
    zh_inv_small = [pow(z, P - 2, P) for z in zh_small]
    zh_inv = np.tile(np.array(zh_inv_small, dtype=object), n)
    # (x_i - w^{N-1}) full vector (host powers cached)
    xs = gl.powers_host(v, n_lde).astype(object)
    x_minus_last = (xs * shift - w_last) % P
    return gl.from_int(zh_inv), gl.from_int(x_minus_last)


def prove(air: Air, trace: GF, cfg: StarkConfig = StarkConfig()) -> StarkProof:
    """trace: (width, N) base-field execution trace (natural row order)."""
    n = 1 << air.log_n
    lde = cfg.lde_factor
    n_lde = n * lde
    shift = gl.MULTIPLICATIVE_GENERATOR
    assert trace.shape == (air.width, n)
    tr = Transcript()

    # -- 1. trace commitment ----------------------------------------------
    trace_coeffs = nt.intt(trace)  # (W, N)
    trace_lde = nt.coset_lde(trace, lde, shift)  # (W, N_lde)
    leaf_rows = GF(jnp.moveaxis(trace_lde.lo, 0, 1), jnp.moveaxis(trace_lde.hi, 0, 1))
    trace_tree = mk.build_tree(mk.hash_leaves(leaf_rows), cfg.cap_size)
    trace_cap = gl.to_ints(trace_tree.cap)
    tr.absorb_ints([int(x) for x in trace_cap.ravel()])

    # -- 2. constraint composition on the LDE domain ----------------------
    alpha = tr.challenge_ext_ints()
    alg = DeviceAlgebra()
    cols = _columns(trace_lde)
    next_cols = [GF(jnp.roll(c.lo, -lde), jnp.roll(c.hi, -lde)) for c in cols]
    cvals = air.eval_transitions(alg, cols, next_cols)  # list of (N_lde,) GF
    assert len(cvals) == air.num_transitions

    zh_inv, x_minus_last = _zh_over_last_inv(n, lde, shift)

    # combine transitions with alpha powers (ext scalars x base vectors)
    apow = (1, 0)
    comb = gl.ext_zeros((n_lde,))
    for cv in cvals:
        apow = fi.emul(apow, alpha)
        a_gf = gl.ext_from_ints(apow[0], apow[1])
        comb = gl.ext_add(comb, GF2(gl.mul(gl.broadcast_to(a_gf.c0, (n_lde,)), cv),
                                    gl.mul(gl.broadcast_to(a_gf.c1, (n_lde,)), cv)))
    # transition quotient: comb * (x - w_last) / (x^N - 1)
    comb = GF2(gl.mul(comb.c0, x_minus_last), gl.mul(comb.c1, x_minus_last))
    comb = GF2(gl.mul(comb.c0, zh_inv), gl.mul(comb.c1, zh_inv))

    # boundary terms: alpha^{T+j+1} * (T_col(x) - val) / (x - pt)
    if air.boundary:
        w = gl.primitive_root_of_unity(air.log_n)
        xs_host = gl.powers_host(gl.primitive_root_of_unity(n_lde.bit_length() - 1),
                                 n_lde).astype(object)
        for (row_idx, col_idx, value) in air.boundary:
            apow = fi.emul(apow, alpha)
            pt = pow(w, row_idx, P)
            denom = (xs_host * shift - pt) % P
            denom_inv = gl.inv(gl.from_int(denom))
            num = gl.sub(cols[col_idx], gl.broadcast_to(gl.from_int(value % P),
                                                        (n_lde,)))
            term = gl.mul(num, denom_inv)
            a_gf = gl.ext_from_ints(apow[0], apow[1])
            comb = gl.ext_add(comb, GF2(gl.mul(gl.broadcast_to(a_gf.c0, (n_lde,)), term),
                                        gl.mul(gl.broadcast_to(a_gf.c1, (n_lde,)), term)))

    # -- 3. quotient split + commitment -----------------------------------
    num_chunks = max(1, air.constraint_degree)
    assert num_chunks <= lde, "lde_factor must cover the composition degree"
    # coefficients of the composition (coset intt + unscale)
    unscale = gl.from_int((gl.powers_host(pow(shift, P - 2, P), n_lde)).astype(object))
    comp_c0 = gl.mul(nt.intt(comb.c0), unscale)
    comp_c1 = gl.mul(nt.intt(comb.c1), unscale)
    # chunks j: coeffs [jN, (j+1)N) ; re-evaluate each on the LDE coset
    q_cols = []
    for j in range(num_chunks):
        for comp in (comp_c0, comp_c1):
            chunk = comp[j * n:(j + 1) * n]
            q_cols.append(chunk)
    q_coeffs = gl.stack(q_cols, axis=0)  # (2k, N) coefficient rows
    pad = gl.zeros((q_coeffs.shape[0], n_lde - n))
    q_lde = nt.ntt(nt.scale_by_powers(gl.concatenate([q_coeffs, pad], axis=-1), shift))
    q_leaf_rows = GF(jnp.moveaxis(q_lde.lo, 0, 1), jnp.moveaxis(q_lde.hi, 0, 1))
    q_tree = mk.build_tree(mk.hash_leaves(q_leaf_rows), cfg.cap_size)
    q_cap = gl.to_ints(q_tree.cap)
    tr.absorb_ints([int(x) for x in q_cap.ravel()])

    # -- 4. OOD evaluations ------------------------------------------------
    z = tr.challenge_ext_ints()
    z_gf = gl.ext_from_ints(*z)
    w_gen = gl.primitive_root_of_unity(air.log_n)
    zw = fi.escale(z, w_gen)
    zw_gf = gl.ext_from_ints(*zw)

    ood_trace = _ext_evals(trace_coeffs, z_gf)
    ood_trace_next = _ext_evals(trace_coeffs, zw_gf)
    ood_quotient = _ext_evals(q_coeffs, z_gf)  # per (chunk, component) col
    for pair in ood_trace + ood_trace_next + ood_quotient:
        tr.absorb_ints(list(pair))

    # -- 5. DEEP composition ----------------------------------------------
    gamma = tr.challenge_ext_ints()
    xs_host = gl.powers_host(gl.primitive_root_of_unity(n_lde.bit_length() - 1),
                             n_lde).astype(object)
    xs = gl.from_int((xs_host * shift) % P)
    deep = _deep_composition(trace_lde, q_lde, ood_trace, ood_trace_next,
                             ood_quotient, z, zw, gamma, xs)

    # -- 6. FRI -------------------------------------------------------------
    fri_cfg = cfg.fri_config(n_lde)
    fri_proof = fri_prove(deep, shift, tr, fri_cfg)

    # -- 7. query openings --------------------------------------------------
    h0 = n_lde // 2
    idx_set = sorted({int(p) % h0 for p in fri_proof.query_positions} |
                     {int(p) % h0 + h0 for p in fri_proof.query_positions})
    idx_arr = np.array(idx_set, dtype=np.uint32)
    t_open = gl.take(leaf_rows, jnp.asarray(idx_arr), axis=0)
    t_paths = mk.open_indices(trace_tree, idx_arr)
    q_open = gl.take(q_leaf_rows, jnp.asarray(idx_arr), axis=0)
    q_paths = mk.open_indices(q_tree, idx_arr)
    t_open_np = gl.to_ints(t_open)
    t_paths_np = gl.to_ints(t_paths)
    q_open_np = gl.to_ints(q_open)
    q_paths_np = gl.to_ints(q_paths)

    return StarkProof(
        trace_cap=trace_cap,
        quotient_cap=q_cap,
        ood_trace=ood_trace,
        ood_trace_next=ood_trace_next,
        ood_quotient=ood_quotient,
        trace_openings={int(i): [int(v) for v in t_open_np[k]]
                        for k, i in enumerate(idx_set)},
        trace_paths={int(i): t_paths_np[k] for k, i in enumerate(idx_set)},
        quotient_openings={int(i): [int(v) for v in q_open_np[k]]
                           for k, i in enumerate(idx_set)},
        quotient_paths={int(i): q_paths_np[k] for k, i in enumerate(idx_set)},
        fri=fri_proof,
    )


def _ext_evals(coeffs: GF, x: GF2) -> List[Tuple[int, int]]:
    evals = nt.eval_poly_at(coeffs, x)
    c0 = gl.to_ints(evals.c0)
    c1 = gl.to_ints(evals.c1)
    return [(int(a), int(b)) for a, b in zip(np.atleast_1d(c0), np.atleast_1d(c1))]


def _deep_composition(trace_lde: GF, q_lde: GF, ood_trace, ood_trace_next,
                      ood_quotient, z, zw, gamma, xs: GF) -> GF2:
    """D(x) = sum_j g^j (T_j(x)-T_j(z))/(x-z) + ... over trace, next, quotient."""
    n_lde = xs.shape[0]
    z_gf = gl.ext_from_ints(*z)
    zw_gf = gl.ext_from_ints(*zw)
    x_ext = GF2(xs, gl.zeros((n_lde,)))
    inv_xz = gl.ext_inv(gl.ext_sub(x_ext, _ext_bcast(z_gf, (n_lde,))))
    inv_xzw = gl.ext_inv(gl.ext_sub(x_ext, _ext_bcast(zw_gf, (n_lde,))))

    deep = gl.ext_zeros((n_lde,))
    gpow = (1, 0)

    def accum(deep, gpow, col: GF, ood_val, inv_den: GF2):
        ood = gl.ext_from_ints(*ood_val)
        num = GF2(gl.sub(col, gl.broadcast_to(ood.c0, (n_lde,))),
                  gl.neg(gl.broadcast_to(ood.c1, (n_lde,))))
        term = gl.ext_mul(num, inv_den)
        g_gf = gl.ext_from_ints(*gpow)
        return gl.ext_add(deep, gl.ext_mul(_ext_bcast(g_gf, (n_lde,)), term))

    for j in range(trace_lde.shape[0]):
        gpow = fi.emul(gpow, gamma)
        deep = accum(deep, gpow, trace_lde[j], ood_trace[j], inv_xz)
    for j in range(trace_lde.shape[0]):
        gpow = fi.emul(gpow, gamma)
        deep = accum(deep, gpow, trace_lde[j], ood_trace_next[j], inv_xzw)
    for j in range(q_lde.shape[0]):
        gpow = fi.emul(gpow, gamma)
        deep = accum(deep, gpow, q_lde[j], ood_quotient[j], inv_xz)
    return deep


# ---------------------------------------------------------------------------
# Verifier
# ---------------------------------------------------------------------------

def _verify_inner(air: Air, proof: StarkProof, cfg: StarkConfig = StarkConfig()) -> bool:
    n = 1 << air.log_n
    lde = cfg.lde_factor
    n_lde = n * lde
    shift = gl.MULTIPLICATIVE_GENERATOR
    num_chunks = max(1, air.constraint_degree)
    tr = Transcript()

    # Geometry binding: every absorbed OOD value must later receive a DEEP
    # term, and every opened row must have exactly the committed width —
    # otherwise a prover can commit a narrower quotient and solve the unbound
    # tail chunk to satisfy the OOD identity for any trace.
    if (len(proof.ood_trace) != air.width
            or len(proof.ood_trace_next) != air.width
            or len(proof.ood_quotient) != 2 * num_chunks):
        return False
    for i in proof.trace_openings:
        if (len(proof.trace_openings[i]) != air.width
                or len(proof.quotient_openings.get(i, ())) != 2 * num_chunks):
            return False
    if set(proof.trace_openings.keys()) != set(proof.quotient_openings.keys()):
        return False

    tr.absorb_ints([int(x) for x in np.asarray(proof.trace_cap, dtype=object).ravel()])
    alpha = tr.challenge_ext_ints()
    tr.absorb_ints([int(x) for x in np.asarray(proof.quotient_cap, dtype=object).ravel()])
    z = tr.challenge_ext_ints()
    w_gen = gl.primitive_root_of_unity(air.log_n)
    zw = fi.escale(z, w_gen)
    for pair in proof.ood_trace + proof.ood_trace_next + proof.ood_quotient:
        tr.absorb_ints(list(pair))
    gamma = tr.challenge_ext_ints()

    # -- OOD consistency: constraints at z vs quotient chunks at z ---------
    alg = HostExtAlgebra()
    cvals = air.eval_transitions(alg, proof.ood_trace, proof.ood_trace_next)
    apow = (1, 0)
    comb = (0, 0)
    for cv in cvals:
        apow = fi.emul(apow, alpha)
        comb = fi.eadd(comb, fi.emul(apow, cv))
    zn = fi.epow(z, n)
    w_last = pow(w_gen, n - 1, P)
    zh = fi.esub(zn, (1, 0))
    z_min_last = fi.esub(z, (w_last, 0))
    comb = fi.emul(comb, fi.emul(z_min_last, fi.einv(zh)))
    for (row_idx, col_idx, value) in air.boundary:
        apow = fi.emul(apow, alpha)
        pt = pow(w_gen, row_idx, P)
        num = fi.esub(proof.ood_trace[col_idx], (value % P, 0))
        comb = fi.eadd(comb, fi.emul(apow, fi.emul(num, fi.einv(fi.esub(z, (pt, 0))))))
    # The quotient chunks are the c0/c1 component polynomials of the ext
    # composition: Comp(z) = sum_j z^{jN} (Q0_j(z) + x_ext * Q1_j(z)) where
    # x_ext is the ext generator (0,1).
    expected = (0, 0)
    zjn = (1, 0)
    for j in range(num_chunks):
        q0 = proof.ood_quotient[2 * j]
        q1 = proof.ood_quotient[2 * j + 1]
        qz = fi.eadd(q0, fi.emul((0, 1), q1))
        expected = fi.eadd(expected, fi.emul(zjn, qz))
        zjn = fi.emul(zjn, zn)
    if comb != expected:
        return False

    # -- Merkle openings ----------------------------------------------------
    fri_cfg = cfg.fri_config(n_lde)
    # replay FRI transcript to recover positions (validates vs proof inside
    # fri_verify; we need the openings checked against caps first)
    idx_list = sorted(proof.trace_openings.keys())
    idx_arr = np.array(idx_list, dtype=np.uint32)
    for openings, paths, cap_np in (
            (proof.trace_openings, proof.trace_paths, proof.trace_cap),
            (proof.quotient_openings, proof.quotient_paths, proof.quotient_cap)):
        rows = gl.from_int(np.array([openings[i] for i in idx_list], dtype=object))
        paths_gf = gl.from_int(np.stack([np.asarray(paths[i], dtype=object)
                                         for i in idx_list]))
        cap_gf = gl.from_int(np.asarray(cap_np, dtype=object))
        ok = mk.verify_paths(mk.hash_leaves(rows), idx_arr, paths_gf, cap_gf,
                             n_leaves=n_lde, cap_size=cfg.cap_size)
        if not bool(np.all(np.asarray(ok))):
            return False

    # -- DEEP values at queried indices ------------------------------------
    log_nl = n_lde.bit_length() - 1
    v = gl.primitive_root_of_unity(log_nl)

    def deep_at(idx: int) -> Tuple[int, int]:
        x = (shift * pow(v, idx, P)) % P
        t_row = proof.trace_openings[idx]
        q_row = proof.quotient_openings[idx]
        acc = (0, 0)
        gpow = (1, 0)
        inv_xz = fi.einv(fi.esub((x, 0), z))
        inv_xzw = fi.einv(fi.esub((x, 0), zw))
        for j in range(air.width):
            gpow = fi.emul(gpow, gamma)
            num = fi.esub((t_row[j], 0), proof.ood_trace[j])
            acc = fi.eadd(acc, fi.emul(gpow, fi.emul(num, inv_xz)))
        for j in range(air.width):
            gpow = fi.emul(gpow, gamma)
            num = fi.esub((t_row[j], 0), proof.ood_trace_next[j])
            acc = fi.eadd(acc, fi.emul(gpow, fi.emul(num, inv_xzw)))
        for j in range(2 * num_chunks):
            gpow = fi.emul(gpow, gamma)
            num = fi.esub((q_row[j], 0), proof.ood_quotient[j])
            acc = fi.eadd(acc, fi.emul(gpow, fi.emul(num, inv_xz)))
        return acc

    return fri_verify(proof.fri, n_lde, shift, tr, fri_cfg, deep_at)


def verify(*args, strict: bool = None, **kwargs) -> bool:
    """Structural-error-tolerant wrapper: a malformed proof (wrong lengths,
    bad types, truncated openings) must REJECT, not crash the verifier.
    `strict=True` (or env ZKEVM_VERIFY_STRICT=1) re-raises instead, so
    internal invariant bugs cannot hide behind "proof rejected"."""
    from .guard import tolerant_verify
    return tolerant_verify(_verify_inner, *args, strict=strict, **kwargs)
