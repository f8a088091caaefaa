"""FRI low-degree test: batched folding on device, Merkle-committed layers.

TPU-native counterpart of boojum's FRI inside `prove_from_precomputations`
(reference call site src/prover_utils.rs:338-348; configs
circuit_definitions/src/lib.rs:28-57 — base layer lde_factor 2, cap 16, no
PoW). Folding is radix-2 over the extension field: each round is one fused
kernel over the whole codeword; layer commitments use pair-leaves so a single
opening serves the butterfly.

Layer layout. codeword_0 (the DEEP composition, size N0 on coset g·<w>) is
NOT committed here — its queried values are recomputed by the verifier from
the trace/quotient openings. Layers 1..R-1 are committed with leaf
l ∈ [0, N_r/2) = [c0(a), c1(a), c0(b), c1(b)] for a = f(d_l), b = f(-d_l).
The final layer is sent as coefficients; the verifier checks its degree and
evaluates it directly.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import goldilocks as gl
from ..ops import merkle as mk
from ..ops import ntt as nt
from ..ops.goldilocks import GF, GF2, P
from ..utils import field_int as fi
from .transcript import Transcript

INV2 = pow(2, P - 2, P)


@dataclasses.dataclass(frozen=True)
class FriConfig:
    folding_rounds: int  # number of radix-2 folds (N0 -> N0 >> folding_rounds)
    cap_size: int = 16
    num_queries: int = 40
    lde_factor: int = 2  # rate; final poly degree bound = N_final / lde_factor


@dataclasses.dataclass
class FriLayerOpening:
    leaves: np.ndarray  # (q, 4) object ints [a0, a1, b0, b1]
    paths: np.ndarray  # (q, depth, 4) object ints


@dataclasses.dataclass
class FriProof:
    caps: List[np.ndarray]  # per committed layer: (cap, 4) object ints
    final_poly: List[Tuple[int, int]]  # ext coefficients, low-to-high
    openings: List[FriLayerOpening]  # per committed layer
    query_positions: np.ndarray  # (q,) in [0, N0)


def _fold_eager(cw: GF2, alpha: GF2, inv_domain: GF) -> GF2:
    """One radix-2 fold: new(y) = f_e(y) + alpha * f_o(y), y = x^2."""
    n = cw.shape[0]
    h = n // 2
    a, b = cw[:h], cw[h:]
    inv2 = gl.broadcast_to(gl.from_int(INV2), (h,))
    e = gl.GF2(gl.mul(gl.add(a.c0, b.c0), inv2), gl.mul(gl.add(a.c1, b.c1), inv2))
    o = gl.GF2(gl.mul(gl.sub(a.c0, b.c0), inv2), gl.mul(gl.sub(a.c1, b.c1), inv2))
    o = gl.ext_mul_base(o, inv_domain)
    alpha_b = gl.GF2(gl.broadcast_to(alpha.c0, (h,)), gl.broadcast_to(alpha.c1, (h,)))
    return gl.ext_add(e, gl.ext_mul(alpha_b, o))


_fold_jitted = None


def _fold_once(cw: GF2, alpha: GF2, inv_domain: GF) -> GF2:
    global _fold_jitted
    if jax.default_backend() == "cpu":
        return _fold_eager(cw, alpha, inv_domain)
    if _fold_jitted is None:
        _fold_jitted = jax.jit(_fold_eager)
    return _fold_jitted(cw, alpha, inv_domain)


def _inv_domain_half(n: int, shift: int) -> GF:
    """[1/d_0 .. 1/d_{n/2-1}] for d_i = shift * w^i, w of order n — a
    shape constant, cached device-resident (the per-round host power loop
    + upload serialized the otherwise-async fold loop)."""
    log_n = n.bit_length() - 1
    w_inv = pow(gl.primitive_root_of_unity(log_n), P - 2, P)
    s_inv = pow(shift, P - 2, P)
    return gl.powers_dev_cached(w_inv, n // 2, mult=s_inv)


def _gf2_to_np(x: GF2) -> np.ndarray:
    c0 = gl.to_ints(x.c0)
    c1 = gl.to_ints(x.c1)
    return np.stack([c0, c1], axis=-1)


def _pair_leaf_rows(cw: GF2) -> GF:
    """(n,) ext codeword -> (n/2, 4) leaf rows [a0, a1, b0, b1]."""
    n = cw.shape[0]
    h = n // 2
    a, b = cw[:h], cw[h:]
    return gl.stack([a.c0, a.c1, b.c0, b.c1], axis=-1)


def fri_prove(codeword: GF2, shift: int, tr: Transcript, cfg: FriConfig,
              backend=None) -> FriProof:
    """`backend` switches the layer-tree hasher + cap absorption to an
    alternative hash backend (prover/hash_backend.Bn254Backend for the
    compression-for-wrapper mode); None keeps Goldilocks Poseidon2."""
    n0 = codeword.shape[0]
    codewords = [codeword]
    trees: List[mk.MerkleTree] = []
    caps_np: List[np.ndarray] = []

    from ..utils import tracing
    cur = codeword
    cur_shift = shift
    alphas: List[GF2] = []
    _sp = tracing.span("fri_folds")
    _sp.__enter__()
    for r in range(cfg.folding_rounds):
        alpha = tr.challenge_ext()
        alphas.append(alpha)
        inv_dom = _inv_domain_half(cur.shape[0], cur_shift)
        cur = _fold_once(cur, alpha, inv_dom)
        cur_shift = (cur_shift * cur_shift) % P
        codewords.append(cur)
        if r < cfg.folding_rounds - 1:
            # commit the folded layer (pair leaves for the NEXT fold)
            rows = _pair_leaf_rows(cur)
            cap_sz = min(cfg.cap_size, rows.shape[0])
            if backend is not None:
                tree = backend.commit_rows(gl.to_ints(rows), cap_sz)
                trees.append(tree)
                tr.absorb_fr(tree.cap)
            else:
                if jax.default_backend() == "cpu":
                    tree = mk.build_tree(mk.hash_leaves(rows), cap_sz)
                else:
                    tree = mk.commit(rows, cap_sz)
                trees.append(tree)
                tr.absorb_gf_device(tree.cap)  # no host fetch in the fold loop

    _sp.__exit__(None, None, None)
    _sp = tracing.span("fri_final")
    _sp.__enter__()
    # final polynomial from the last codeword (coset intt + unscale)
    final_cw = codewords[-1]
    n_f = final_cw.shape[0]
    c0 = nt.intt(final_cw.c0)
    c1 = nt.intt(final_cw.c1)
    unscale = gl.powers_dev_cached(pow(cur_shift, P - 2, P), n_f)
    c0 = gl.mul(c0, unscale)
    c1 = gl.mul(c1, unscale)
    # ONE batched fetch for the final coefficients AND every layer cap:
    # each gl.to_ints was its own tunnel round-trip (~0.2 s over the
    # remote-TPU link), so the per-item loop cost ~12 RTTs per prove
    fetch = {"c0": (c0.lo, c0.hi), "c1": (c1.lo, c1.hi)}
    if backend is None:
        for i, tree in enumerate(trees):
            fetch[f"cap{i}"] = (tree.cap.lo, tree.cap.hi)
    got = jax.device_get(fetch)

    def _u64(pair):
        lo, hi = (np.asarray(a, dtype=np.uint64) for a in pair)
        return lo | (hi << np.uint64(32))

    final_coeffs = [(int(a), int(b))
                    for a, b in zip(_u64(got["c0"]), _u64(got["c1"]))]
    # one absorb call == one scanned permutation kernel; the per-pair loop
    # was n_f/4 sequential device permutes (same transcript state either
    # way — absorb_ints buffering is associative over call boundaries)
    tr.absorb_ints([v for pair in final_coeffs for v in pair])

    if backend is not None:
        for tree in trees:
            caps_np.append(np.asarray(tree.cap, dtype=object))
    else:
        for i in range(len(trees)):
            caps_np.append(_u64(got[f"cap{i}"]))

    # queries
    positions = tr.query_indices(cfg.num_queries, n0)

    _sp.__exit__(None, None, None)
    _sp = tracing.span("fri_openings")
    _sp.__enter__()
    openings: List[FriLayerOpening] = []
    pos = positions.copy()
    # dispatch every layer's gathers async, then fetch once — the per-layer
    # to_ints pattern cost one tunnel round-trip per committed layer
    staged = []
    for r in range(1, cfg.folding_rounds):
        cw_r = codewords[r]
        n_r = cw_r.shape[0]
        tree = trees[r - 1]
        pos_r = pos % np.uint32(n_r)
        leaf_idx = pos_r % np.uint32(n_r // 2)
        rows = _pair_leaf_rows(cw_r)
        leaves = gl.take(rows, jnp.asarray(leaf_idx), axis=0)
        if backend is not None:
            staged.append((leaves, ("host", backend.open(tree, leaf_idx))))
        else:
            staged.append((leaves, ("dev", mk.open_indices(tree, leaf_idx))))
    # leaves AND device merkle paths in ONE fetch (per-layer gl.to_ints
    # was one RTT per committed layer)
    fetched = jax.device_get(
        [((lv.lo, lv.hi),
          (pth.lo, pth.hi) if kind == "dev" else None)
         for lv, (kind, pth) in staged])
    for (lv, (kind, pth)), ((lo, hi), pp) in zip(staged, fetched):
        lo = np.asarray(lo, dtype=np.uint64)
        hi = np.asarray(hi, dtype=np.uint64)
        leaves_np = (lo | (hi << np.uint64(32))).astype(object)
        if kind == "dev":
            plo, phi = (np.asarray(a, dtype=np.uint64) for a in pp)
            paths_np = plo | (phi << np.uint64(32))
        else:
            paths_np = pth
        openings.append(FriLayerOpening(leaves_np, paths_np))

    _sp.__exit__(None, None, None)
    return FriProof(caps=caps_np, final_poly=final_coeffs, openings=openings,
                    query_positions=positions)


def fri_verify(proof: FriProof, n0: int, shift: int, tr: Transcript,
               cfg: FriConfig, codeword0_at, backend=None) -> bool:
    """Verify a FRI proof.

    `codeword0_at(position) -> (c0, c1)` returns the layer-0 (DEEP) value at
    an LDE index; the STARK verifier derives it from the trace/quotient
    openings. Transcript must be in the same state as the prover's was at
    fri_prove entry.
    """
    # 1. replay transcript: alphas, caps, final poly, positions
    alphas = []
    for r in range(cfg.folding_rounds):
        alphas.append(tr.challenge_ext_ints())
        if r < cfg.folding_rounds - 1:
            cap = proof.caps[r]
            if backend is not None:
                tr.absorb_fr([int(v) for v in
                              np.asarray(cap, dtype=object).ravel()])
            else:
                tr.absorb_ints([int(v) for v in
                                np.asarray(cap, dtype=object).ravel()])
    tr.absorb_ints([v for pair in proof.final_poly for v in pair])
    positions = tr.query_indices(cfg.num_queries, n0)
    if not np.array_equal(positions, proof.query_positions):
        return False

    # 2. degree check on the final polynomial
    n_f = n0 >> cfg.folding_rounds
    if len(proof.final_poly) != n_f:
        return False
    deg_bound = n_f // cfg.lde_factor
    if any(c != (0, 0) for c in proof.final_poly[deg_bound:]):
        return False

    # 3. batch-verify Merkle paths of committed layers
    for r in range(1, cfg.folding_rounds):
        n_r = n0 >> r
        pos_r = positions % np.uint32(n_r)
        leaf_idx = pos_r % np.uint32(n_r // 2)
        op = proof.openings[r - 1]
        if backend is not None:
            digests = backend.hash_rows(np.asarray(op.leaves, dtype=object))
            if not backend.verify_paths(
                    digests, [int(v) for v in leaf_idx],
                    np.asarray(op.paths, dtype=object),
                    [int(v) for v in
                     np.asarray(proof.caps[r - 1], dtype=object).ravel()]):
                return False
        else:
            leaves_gf = gl.from_int(np.asarray(op.leaves, dtype=object))
            paths_gf = gl.from_int(np.asarray(op.paths, dtype=object))
            cap_gf = gl.from_int(np.asarray(proof.caps[r - 1], dtype=object))
            digests = mk.hash_leaves(leaves_gf)
            ok = mk.verify_paths(digests, leaf_idx, paths_gf, cap_gf,
                                 n_leaves=n_r // 2,
                                 cap_size=min(cfg.cap_size, n_r // 2))
            if not bool(np.all(np.asarray(ok))):
                return False

    # 4. fold-consistency per query (exact ints)
    log_n0 = n0.bit_length() - 1
    w_r = [gl.primitive_root_of_unity(log_n0 - r) for r in range(cfg.folding_rounds + 1)]
    shifts = [shift]
    for _ in range(cfg.folding_rounds):
        shifts.append((shifts[-1] * shifts[-1]) % P)

    for qi, p0 in enumerate(positions):
        p0 = int(p0)
        # layer 0 values from the callback
        h0 = n0 // 2
        j0 = p0 % h0
        a = codeword0_at(j0)
        b = codeword0_at(j0 + h0)
        value = None
        j = j0
        for r in range(cfg.folding_rounds):
            n_r = n0 >> r
            h_r = n_r // 2
            if r > 0:
                op = proof.openings[r - 1]
                leaf = [int(v) for v in op.leaves[qi]]
                a_leaf = (leaf[0], leaf[1])
                b_leaf = (leaf[2], leaf[3])
                # consistency: previous folded value must equal the component
                # of this leaf at our position
                expected = a_leaf if j < h_r else b_leaf
                if value != expected:
                    return False
                a, b = a_leaf, b_leaf
                j = j % h_r
            # fold a,b at index j of layer r
            d = (shifts[r] * pow(w_r[r], j, P)) % P
            e = fi.escale(fi.eadd(a, b), INV2)
            o = fi.escale(fi.emul(fi.esub(a, b), (fi.finv(d), 0)), INV2)
            value = fi.eadd(e, fi.emul(alphas[r], o))
            j = j  # next-layer index: position j in folded codeword of size h_r
        # final check: value == final_poly(x) at x = shifts[R] * w_R^j
        x = (shifts[cfg.folding_rounds] * pow(w_r[cfg.folding_rounds], j % n_f, P)) % P
        got = fi.eval_poly_ext(proof.final_poly, (x, 0))
        if got != value:
            return False
    return True
