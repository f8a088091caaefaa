"""NTT / inverse NTT / coset LDE over Goldilocks, batched for TPU.

TPU-native replacement for boojum's polynomial-oracle machinery used inside
`prove_from_precomputations` (reference: src/prover_utils.rs:338-348 — column
LDE via coset NTT with lde_factor 2). The transform runs over the LAST axis
and is batched over all leading axes, so a (num_cols, N) trace does all
columns in one fused program; sharding across chips is per-column (see
parallel/mesh.py).

Algorithm: iterative radix-2 DIT with a precomputed bit-reversal gather and
per-stage twiddle tables (host-precomputed exact integers, cached). The stage
loop is a static python loop (log2 N <= 21 for our geometries), each stage one
vectorized butterfly: t = w ⊙ odd; (even + t, even - t).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl
from .goldilocks import GF, P


@functools.lru_cache(maxsize=None)
def bit_reverse_indices(n: int) -> np.ndarray:
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _stage_twiddles(log_n: int, inverse: bool):
    """Per-stage twiddle tables [w_m^0 .. w_m^(m/2-1)], m = 2^(s+1)."""
    tables = []
    for s in range(log_n):
        m = 1 << (s + 1)
        w = gl.primitive_root_of_unity(s + 1)
        if inverse:
            w = pow(w, P - 2, P)
        tables.append(gl.powers_host(w, m // 2))
    return tables


def _ntt_small(values: GF, log_n: int, inverse: bool) -> GF:
    """Classic iterative radix-2 DIT over the last axis."""
    n = 1 << log_n
    rev = bit_reverse_indices(n)
    x = gl.take(values, jnp.asarray(rev), axis=-1)
    batch = values.shape[:-1]
    tables = _stage_twiddles(log_n, inverse)
    for s in range(log_n):
        half = 1 << s
        groups = n >> (s + 1)
        x = x.reshape(*batch, groups, 2, half)
        even = x[..., 0, :]
        odd = x[..., 1, :]
        w = gl.from_u64(tables[s])  # (half,)
        t = gl.mul(odd, gl.broadcast_to(w, odd.shape))
        out0 = gl.add(even, t)
        out1 = gl.sub(even, t)
        x = gl.stack([out0, out1], axis=-2).reshape(*batch, n)
    return x


def _ntt_axis2(values: GF, log_m: int, inverse: bool) -> GF:
    """Radix-2 DIT over axis -2, keeping the minor axis intact.

    The minor (lane) dimension stays the full length-L last axis through
    every stage, so all butterflies are well-tiled vector ops — the
    classic last-axis form degrades to lane width `half` (1, 2, 4, ...)
    in its early stages, which measured ~5x off the NTT's bandwidth bound
    at prover shapes (BASELINE.md round-5)."""
    m = 1 << log_m
    rev = bit_reverse_indices(m)
    x = gl.take(values, jnp.asarray(rev), axis=-2)
    batch = values.shape[:-2]
    L = values.shape[-1]
    tables = _stage_twiddles(log_m, inverse)
    for s in range(log_m):
        half = 1 << s
        groups = m >> (s + 1)
        x = x.reshape(*batch, groups, 2, half, L)
        even = x[..., 0, :, :]
        odd = x[..., 1, :, :]
        w = gl.from_u64(tables[s])  # (half,)
        wb = GF(w.lo[:, None], w.hi[:, None])  # (half, 1): lane-constant
        t = gl.mul(odd, gl.broadcast_to(wb, odd.shape))
        out0 = gl.add(even, t)
        out1 = gl.sub(even, t)
        x = gl.stack([out0, out1], axis=-3).reshape(*batch, m, L)
    return x


@functools.lru_cache(maxsize=None)
def _four_step_grid_indices(log_n: int) -> np.ndarray:
    """(n1, n2) int32 grid of (k1 * j2) mod n — gather indices into the
    length-n power table for the inter-step twiddle w_n^(k1*j2)."""
    n = 1 << log_n
    log1 = log_n // 2
    n1, n2 = 1 << log1, n >> log1
    grid = (np.outer(np.arange(n1, dtype=np.int64),
                     np.arange(n2, dtype=np.int64)) % n).astype(np.int32)
    return grid


@functools.lru_cache(maxsize=None)
def _four_step_twiddles(log_n: int, inverse: bool):
    """Full (n1, n2) inter-step twiddle matrix as host uint64 (cached)."""
    n = 1 << log_n
    w = gl.primitive_root_of_unity(log_n)
    if inverse:
        w = pow(w, P - 2, P)
    pw = gl.powers_host(w, n)  # (n,) uint64
    return pw[_four_step_grid_indices(log_n)]


_FOUR_STEP_MIN_LOG = 14


def _ntt_core(values: GF, log_n: int, inverse: bool) -> GF:
    """NTT over the last axis; four-step decomposition for large n.

    n = n1*n2: (1) length-n1 NTTs down the columns of the (n1, n2) view
    (axis -2, minor dim n2 intact), (2) full twiddle grid w_n^(k1*j2),
    (3) transpose, (4) length-n2 NTTs (axis -2 again, minor dim n1). The
    result C[k2, k1] flattens directly to natural order (k = k1 + n1*k2).
    Exact field arithmetic -> bit-identical to the radix-2 form (pinned
    by tests/test_ntt.py::test_four_step_matches_small)."""
    if log_n < _FOUR_STEP_MIN_LOG:
        return _ntt_small(values, log_n, inverse)
    n = 1 << log_n
    log1 = log_n // 2
    n1, n2 = 1 << log1, n >> log1
    batch = values.shape[:-1]
    A = values.reshape(*batch, n1, n2)
    B = _ntt_axis2(A, log1, inverse)
    W = gl.from_u64(_four_step_twiddles(log_n, inverse))  # (n1, n2)
    B = gl.mul(B, gl.broadcast_to(W, B.shape))
    Bt = GF(jnp.swapaxes(B.lo, -1, -2), jnp.swapaxes(B.hi, -1, -2))
    C = _ntt_axis2(Bt, log_n - log1, inverse)
    return C.reshape(*batch, n)


@functools.partial(jax.jit, static_argnums=(1,))
def _ntt_jit(values: GF, key):
    log_n, inverse = key
    return _ntt_core(values, log_n, inverse)


def ntt(values: GF) -> GF:
    """Coefficients -> evaluations on the order-n subgroup (natural order)."""
    n = values.shape[-1]
    assert n & (n - 1) == 0, f"NTT length must be a power of two, got {n}"
    return _ntt_jit(values, (n.bit_length() - 1, False))


def intt(values: GF) -> GF:
    """Evaluations on the subgroup -> coefficients."""
    n = values.shape[-1]
    assert n & (n - 1) == 0, f"NTT length must be a power of two, got {n}"
    out = _ntt_jit(values, (n.bit_length() - 1, True))
    n_inv = pow(n, P - 2, P)
    return gl.mul(out, gl.broadcast_to(gl.from_int(n_inv), out.shape))


@functools.partial(jax.jit, static_argnums=(1,))
def powers_device(base_arr: GF, n: int) -> GF:
    """[1, b, b^2, ..., b^(n-1)] via log-doubling on device. base_arr: scalar GF."""
    assert n & (n - 1) == 0
    p = gl.ones((1,))
    cur = gl.stack([gl.ones(()), GF(base_arr.lo.reshape(()), base_arr.hi.reshape(()))])
    length = 2
    while length < n:
        # cur holds [b^0 .. b^(length-1)]; append cur * b^length
        step = cur[length - 1:length]
        step = gl.mul(step, GF(base_arr.lo.reshape(1), base_arr.hi.reshape(1)))
        shifted = gl.mul(cur, gl.broadcast_to(step, cur.shape))
        cur = gl.concatenate([cur, shifted])
        length *= 2
    if n == 1:
        return p
    return cur


def scale_by_powers(values: GF, base: int) -> GF:
    """values[..., i] * base^i (coset shift of coefficients)."""
    n = values.shape[-1]
    pw = gl.from_u64(gl.powers_host(base, n))
    return gl.mul(values, gl.broadcast_to(pw, values.shape))


@functools.partial(jax.jit, static_argnums=(1, 2))
def coset_lde(evals: GF, lde_factor: int, shift: int = gl.MULTIPLICATIVE_GENERATOR) -> GF:
    """Low-degree extend evaluations on H (size n) to the coset shift*K of the
    size n*lde_factor subgroup K. Returns (..., n * lde_factor), natural order.

    Matches the reference FRI domain layout: evaluations over the coset of the
    larger subgroup (boojum lde_factor=2 for base layer; up to 4096 for
    compression modes — circuit_definitions/src/lib.rs:28-57).
    """
    n = evals.shape[-1]
    coeffs = intt(evals)
    big_n = n * lde_factor
    batch = evals.shape[:-1]
    padded = gl.concatenate([coeffs, gl.zeros(batch + (big_n - n,))], axis=-1)
    shifted = scale_by_powers(padded, shift)
    return ntt(shifted)


def ext_powers_device(x: gl.GF2, n: int) -> gl.GF2:
    """[1, x, ..., x^(n-1)] for a scalar extension point, via log-doubling.

    O(log n) vector ext-muls instead of an O(n) Horner chain — keeps both the
    XLA graph and the sequential depth small for n up to 2^21.
    """
    assert n & (n - 1) == 0 and n >= 1
    if n == 1:
        return gl.ext_ones((1,))
    x1 = gl.GF2(GF(x.c0.lo.reshape(()), x.c0.hi.reshape(())),
                GF(x.c1.lo.reshape(()), x.c1.hi.reshape(())))
    cur = gl.ext_stack([gl.ext_ones(()), x1])  # (2,)
    length = 2
    while length < n:
        x_l = gl.ext_mul(cur[_ext_idx(length - 1)], x1)  # x^length, scalar
        block = gl.ext_mul(cur, _ext_bcast(x_l, (length,)))
        cur = gl.GF2(gl.concatenate([cur.c0, block.c0]),
                     gl.concatenate([cur.c1, block.c1]))
        length *= 2
    return cur


def _ext_idx(i):
    return slice(i, i + 1)


def _ext_bcast(x: gl.GF2, shape) -> gl.GF2:
    return gl.GF2(gl.broadcast_to(x.c0, shape), gl.broadcast_to(x.c1, shape))


@functools.partial(jax.jit, static_argnums=())
def eval_poly_at(coeffs: GF, x: gl.GF2) -> gl.GF2:
    """Evaluate base-field polynomial(s) at an extension point.

    coeffs: (..., n); x: scalar GF2. Returns (...,) GF2.
    sum_i c_i x^i computed as powers ⊙ coeffs then a log-depth tree sum.
    """
    n = coeffs.shape[-1]
    pws = ext_powers_device(x, n)  # (n,)
    shape = coeffs.shape
    terms = gl.GF2(gl.mul(gl.broadcast_to(pws.c0, shape), coeffs),
                   gl.mul(gl.broadcast_to(pws.c1, shape), coeffs))
    return gl.ext_sum_axis(terms, axis=-1)
