"""Goldilocks field GF(p), p = 2^64 - 2^32 + 1, as batched JAX uint32-pair kernels.

TPU has no native 64-bit integer path, so a field element is a pair of uint32
planes (lo, hi) held in a `GF` NamedTuple (a JAX pytree). All ops are
elementwise/vectorized over arbitrary leading shapes and run on the VPU; XLA
fuses the limb arithmetic. The reduction strategy mirrors the standard
Goldilocks identities (2^64 ≡ 2^32 - 1, 2^96 ≡ -1 (mod p)).

Role parity with the reference harness (era-zkevm_test_harness): this module
replaces boojum's `GoldilocksField` used throughout src/prover_utils.rs (e.g.
`F = GoldilocksField` at src/prover_utils.rs:36-44) and the quadratic extension
`GoldilocksExt2` (non-residue 7). All public-API values are kept canonical
(< p) so equality and serialization are well-defined.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

P = 0xFFFFFFFF_00000001  # Goldilocks prime 2^64 - 2^32 + 1
EPSILON = 0xFFFFFFFF  # 2^64 mod p = 2^32 - 1
_EPS32 = np.uint32(0xFFFFFFFF)
MULTIPLICATIVE_GENERATOR = 7  # generator of GF(p)^*, also ext non-residue
TWO_ADICITY = 32

_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)


class GF(NamedTuple):
    """A Goldilocks element array: value = hi * 2^32 + lo, canonical (< p)."""

    lo: jax.Array  # uint32
    hi: jax.Array  # uint32

    @property
    def shape(self):
        return self.lo.shape

    @property
    def ndim(self):
        return self.lo.ndim

    def __getitem__(self, idx):
        return GF(self.lo[idx], self.hi[idx])

    def reshape(self, *shape):
        return GF(self.lo.reshape(*shape), self.hi.reshape(*shape))


# ---------------------------------------------------------------------------
# Construction / conversion
# ---------------------------------------------------------------------------

def from_int(values: Union[int, Sequence[int], np.ndarray]) -> GF:
    """Host-side: build a GF array from python ints / numpy integers (mod p).

    Fast path: when every value fits uint64 the conversion is vectorized
    (one astype + one conditional subtract — any v < 2^64 is < 2P, so a
    single subtraction canonicalizes). The per-element python loop only
    runs for arbitrary-magnitude inputs. Witness fills hand this function
    (cols x n) object arrays — the loop was ~10 s per MainVM instance."""
    if isinstance(values, np.ndarray) and values.dtype in (np.uint64,
                                                           np.uint32):
        u = values.astype(np.uint64, copy=False)  # no object boxing at all
    else:
        arr = np.asarray(values, dtype=object)
        try:
            u = arr.astype(np.uint64)
        except (OverflowError, TypeError, ValueError):
            u = None
    if u is not None:
        u = np.where(u >= np.uint64(P), u - np.uint64(P), u)
        return GF(jnp.asarray((u & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
                  jnp.asarray((u >> np.uint64(32)).astype(np.uint32)))
    flat = np.array([int(v) % P for v in arr.ravel()], dtype=object)
    lo = np.array([v & 0xFFFFFFFF for v in flat], dtype=np.uint32).reshape(arr.shape)
    hi = np.array([v >> 32 for v in flat], dtype=np.uint32).reshape(arr.shape)
    return GF(jnp.asarray(lo), jnp.asarray(hi))


def to_ints(a: GF) -> np.ndarray:
    """Host-side: numpy object array of python ints (vectorized: uint64
    recombine + one object cast, which boxes to arbitrary-precision ints)."""
    lo = np.asarray(jax.device_get(a.lo), dtype=np.uint64)
    hi = np.asarray(jax.device_get(a.hi), dtype=np.uint64)
    u = lo | (hi << np.uint64(32))
    return u.astype(object)


def from_u64(arr) -> GF:
    """Build from a numpy uint64 array (values must already be < p)."""
    arr = np.asarray(arr, dtype=np.uint64)
    return GF(jnp.asarray((arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
              jnp.asarray((arr >> np.uint64(32)).astype(np.uint32)))


def to_u64(a: GF) -> np.ndarray:
    lo = np.asarray(jax.device_get(a.lo), dtype=np.uint64)
    hi = np.asarray(jax.device_get(a.hi), dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def zeros(shape=()) -> GF:
    return GF(jnp.zeros(shape, _U32), jnp.zeros(shape, _U32))


def ones(shape=()) -> GF:
    return GF(jnp.ones(shape, _U32), jnp.zeros(shape, _U32))


def full(shape, value: int) -> GF:
    value %= P
    return GF(jnp.full(shape, np.uint32(value & 0xFFFFFFFF), _U32),
              jnp.full(shape, np.uint32(value >> 32), _U32))


def broadcast_to(a: GF, shape) -> GF:
    return GF(jnp.broadcast_to(a.lo, shape), jnp.broadcast_to(a.hi, shape))


def concatenate(parts: Sequence[GF], axis=0) -> GF:
    return GF(jnp.concatenate([p.lo for p in parts], axis),
              jnp.concatenate([p.hi for p in parts], axis))


def stack(parts: Sequence[GF], axis=0) -> GF:
    return GF(jnp.stack([p.lo for p in parts], axis),
              jnp.stack([p.hi for p in parts], axis))


def take(a: GF, idx, axis=0) -> GF:
    return GF(jnp.take(a.lo, idx, axis=axis), jnp.take(a.hi, idx, axis=axis))


# ---------------------------------------------------------------------------
# 64-bit limb helpers (uint32 pairs)
# ---------------------------------------------------------------------------

def _mul32(x: jax.Array, y: jax.Array):
    """Full 32x32 -> 64 product as (lo, hi) uint32, via 16-bit halves."""
    x0 = x & _MASK16
    x1 = x >> 16
    y0 = y & _MASK16
    y1 = y >> 16
    p00 = x0 * y0
    p01 = x0 * y1
    p10 = x1 * y0
    p11 = x1 * y1
    mid = p01 + p10
    mid_c = (mid < p01).astype(_U32)  # carry out of the 32-bit mid sum
    lo = p00 + (mid << 16)
    lo_c = (lo < p00).astype(_U32)
    hi = p11 + (mid >> 16) + (mid_c << 16) + lo_c
    return lo, hi


def _add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 with carry-out bit."""
    lo = alo + blo
    c0 = (lo < alo).astype(_U32)
    t = ahi + bhi
    c1 = (t < ahi).astype(_U32)
    hi = t + c0
    c2 = (hi < t).astype(_U32)
    return lo, hi, c1 | c2


def _sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 with borrow-out bit."""
    lo = alo - blo
    b0 = (alo < blo).astype(_U32)
    t = ahi - bhi
    b1 = (ahi < bhi).astype(_U32)
    hi = t - b0
    b2 = (t < b0).astype(_U32)
    return lo, hi, b1 | b2


def _ge_p(lo, hi):
    return (hi == np.uint32(0xFFFFFFFF)) & (lo >= np.uint32(1))


# ---------------------------------------------------------------------------
# Field ops (inputs and outputs canonical)
# ---------------------------------------------------------------------------

@jax.jit
def add(a: GF, b: GF) -> GF:
    lo, hi, carry = _add64(a.lo, a.hi, b.lo, b.hi)
    # carry => value ≡ s + EPSILON; no-carry but >= p => subtract p, which is
    # the same wrapped +EPSILON. Both corrections cannot re-overflow past p
    # for canonical inputs.
    fix = (carry != 0) | _ge_p(lo, hi)
    flo = lo + _EPS32
    fhi = hi + (flo < lo).astype(_U32)
    return GF(jnp.where(fix, flo, lo), jnp.where(fix, fhi, hi))


@jax.jit
def sub(a: GF, b: GF) -> GF:
    lo, hi, borrow = _sub64(a.lo, a.hi, b.lo, b.hi)
    fix = borrow != 0
    flo = lo - _EPS32
    fhi = hi - (lo < _EPS32).astype(_U32)
    return GF(jnp.where(fix, flo, lo), jnp.where(fix, fhi, hi))


def neg(a: GF) -> GF:
    return sub(zeros(a.shape), a)


def double(a: GF) -> GF:
    return add(a, a)


def _reduce128(w0, w1, w2, w3) -> GF:
    """Reduce a 128-bit value (little-endian uint32 words) mod p, canonical.

    value = lo64 + 2^64*w2 + 2^96*w3 ≡ lo64 + (2^32-1)*w2 - w3 (mod p).
    """
    # t = lo64 - w3 (borrow => wrapped-subtract EPSILON more; cannot underflow)
    tlo, thi, bor = _sub64(w0, w1, w3, jnp.zeros_like(w3))
    b = bor != 0
    t2lo = tlo - _EPS32
    t2hi = thi - (tlo < _EPS32).astype(_U32)
    tlo = jnp.where(b, t2lo, tlo)
    thi = jnp.where(b, t2hi, thi)
    # u = w2 * (2^32 - 1) = (w2 << 32) - w2
    ulo = jnp.zeros_like(w2) - w2
    uhi = jnp.where(w2 == 0, np.uint32(0), w2 - np.uint32(1))
    # r = t + u ; carry => add EPSILON (cannot carry again: u <= (2^32-1)^2)
    rlo, rhi, carry = _add64(tlo, thi, ulo, uhi)
    c = carry != 0
    r2lo = rlo + _EPS32
    r2hi = rhi + (r2lo < rlo).astype(_U32)
    rlo = jnp.where(c, r2lo, rlo)
    rhi = jnp.where(c, r2hi, rhi)
    # canonicalize
    g = _ge_p(rlo, rhi)
    r3lo = rlo + _EPS32
    r3hi = rhi + (r3lo < rlo).astype(_U32)
    return GF(jnp.where(g, r3lo, rlo), jnp.where(g, r3hi, rhi))


@jax.jit
def mul(a: GF, b: GF) -> GF:
    ll_lo, ll_hi = _mul32(a.lo, b.lo)  # bits 0..63
    lh_lo, lh_hi = _mul32(a.lo, b.hi)  # bits 32..95
    hl_lo, hl_hi = _mul32(a.hi, b.lo)  # bits 32..95
    hh_lo, hh_hi = _mul32(a.hi, b.hi)  # bits 64..127
    w0 = ll_lo
    # w1 accumulates ll_hi + lh_lo + hl_lo
    w1 = ll_hi + lh_lo
    c1 = (w1 < ll_hi).astype(_U32)
    w1b = w1 + hl_lo
    c2 = (w1b < w1).astype(_U32)
    # w2 accumulates lh_hi + hl_hi + hh_lo + carries
    w2 = lh_hi + hl_hi
    d1 = (w2 < lh_hi).astype(_U32)
    w2b = w2 + hh_lo
    d2 = (w2b < w2).astype(_U32)
    w2c = w2b + (c1 + c2)  # c1+c2 <= 2, cannot overflow twice
    d3 = (w2c < w2b).astype(_U32)
    w3 = hh_hi + d1 + d2 + d3
    return _reduce128(w0, w1b, w2c, w3)


def sqr(a: GF) -> GF:
    return mul(a, a)


def mul_scalar(a: GF, c: int) -> GF:
    """Multiply by a small host-known constant."""
    return mul(a, broadcast_to(from_int(c), a.shape))


@functools.partial(jax.jit, static_argnums=1)
def pow_const(a: GF, e: int) -> GF:
    """a ** e for a host-known exponent.

    Small exponents unroll into straight-line code; large ones (e.g. Fermat
    inversion) run a fori_loop over the exponent bits so the XLA graph stays
    compact (a fully-unrolled 64-step ladder takes minutes to compile).
    """
    if e == 0:
        return ones(a.shape)
    if e.bit_length() + bin(e).count("1") <= 24:
        result = None
        base = a
        while e > 0:
            if e & 1:
                result = base if result is None else mul(result, base)
            e >>= 1
            if e:
                base = sqr(base)
        return result
    bits = jnp.asarray(np.array([(e >> i) & 1 for i in range(e.bit_length())],
                                dtype=np.uint32))

    def body(i, carry):
        result, base = carry
        take_bit = bits[i] == 1
        result = select(take_bit, mul(result, base), result)
        return result, sqr(base)

    result, _ = jax.lax.fori_loop(0, e.bit_length(), body, (ones(a.shape), a))
    return result


@jax.jit
def inv(a: GF) -> GF:
    """Inverse via Fermat: a^(p-2). a==0 maps to 0 (caller beware)."""
    return pow_const(a, P - 2)


@jax.jit
def pow7(a: GF) -> GF:
    """x^7, the Poseidon2 S-box exponent (gcd(7, p-1) = 1)."""
    a2 = sqr(a)
    a3 = mul(a2, a)
    a6 = sqr(a3)
    return mul(a6, a)


def equal(a: GF, b: GF) -> jax.Array:
    return (a.lo == b.lo) & (a.hi == b.hi)


def is_zero(a: GF) -> jax.Array:
    return (a.lo == 0) & (a.hi == 0)


def select(mask: jax.Array, a: GF, b: GF) -> GF:
    """mask ? a : b, elementwise."""
    return GF(jnp.where(mask, a.lo, b.lo), jnp.where(mask, a.hi, b.hi))


# ---------------------------------------------------------------------------
# Batched linear algebra over GF
# ---------------------------------------------------------------------------

def dot_const_matrix(m: np.ndarray, x: GF) -> GF:
    """y = m @ x for a small host-side integer matrix m (k, n) and x (..., n).

    Used for MDS-like layers; unrolled host-side so XLA sees straight-line
    limb arithmetic it can fuse.
    """
    k, n = m.shape
    outs = []
    for i in range(k):
        acc = None
        for j in range(n):
            c = int(m[i, j]) % P
            if c == 0:
                continue
            xj = x[..., j]
            term = xj if c == 1 else mul(xj, broadcast_to(from_int(c), xj.shape))
            acc = term if acc is None else add(acc, term)
        outs.append(acc if acc is not None else zeros(x.shape[:-1]))
    return stack(outs, axis=-1)


def sum_axis(a: GF, axis=-1) -> GF:
    """Modular sum along an axis via a log-depth tree of field adds."""
    n = a.shape[axis]
    a = GF(jnp.moveaxis(a.lo, axis, 0), jnp.moveaxis(a.hi, axis, 0))
    while n > 1:
        half = n // 2
        lo_part = GF(a.lo[:half], a.hi[:half])
        hi_part = GF(a.lo[half:2 * half], a.hi[half:2 * half])
        s = add(lo_part, hi_part)
        if n % 2:
            s = concatenate([s, GF(a.lo[n - 1:n], a.hi[n - 1:n])], axis=0)
            n = half + 1
        else:
            n = half
        a = s
    return GF(a.lo[0], a.hi[0])


# ---------------------------------------------------------------------------
# Quadratic extension GF(p^2) = GF(p)[x] / (x^2 - 7)
# ---------------------------------------------------------------------------

EXT_NONRESIDUE = 7


class GF2(NamedTuple):
    """GoldilocksExt2 element array: c0 + c1 * x with x^2 = 7."""

    c0: GF
    c1: GF

    @property
    def shape(self):
        return self.c0.shape

    def __getitem__(self, idx):
        return GF2(self.c0[idx], self.c1[idx])

    def reshape(self, *shape):
        return GF2(self.c0.reshape(*shape), self.c1.reshape(*shape))


def ext_from_base(a: GF) -> GF2:
    return GF2(a, zeros(a.shape))


def ext_from_ints(c0, c1) -> GF2:
    a0 = from_int(c0)
    return GF2(a0, broadcast_to(from_int(c1), a0.shape))


def ext_zeros(shape=()) -> GF2:
    return GF2(zeros(shape), zeros(shape))


def ext_ones(shape=()) -> GF2:
    return GF2(ones(shape), zeros(shape))


def ext_add(a: GF2, b: GF2) -> GF2:
    return GF2(add(a.c0, b.c0), add(a.c1, b.c1))


def ext_sub(a: GF2, b: GF2) -> GF2:
    return GF2(sub(a.c0, b.c0), sub(a.c1, b.c1))


def ext_neg(a: GF2) -> GF2:
    return GF2(neg(a.c0), neg(a.c1))


@jax.jit
def ext_mul(a: GF2, b: GF2) -> GF2:
    # (a0 + a1 x)(b0 + b1 x) = a0 b0 + 7 a1 b1 + (a0 b1 + a1 b0) x
    t0 = mul(a.c0, b.c0)
    t1 = mul(a.c1, b.c1)
    c0 = add(t0, mul_scalar(t1, EXT_NONRESIDUE))
    c1 = add(mul(a.c0, b.c1), mul(a.c1, b.c0))
    return GF2(c0, c1)


def ext_mul_base(a: GF2, b: GF) -> GF2:
    return GF2(mul(a.c0, b), mul(a.c1, b))


def ext_sqr(a: GF2) -> GF2:
    return ext_mul(a, a)


@jax.jit
def ext_inv(a: GF2) -> GF2:
    # norm = a0^2 - 7 a1^2 ; inverse = (a0 - a1 x) / norm
    norm = sub(sqr(a.c0), mul_scalar(sqr(a.c1), EXT_NONRESIDUE))
    ninv = inv(norm)
    return GF2(mul(a.c0, ninv), mul(neg(a.c1), ninv))


def ext_pow_const(a: GF2, e: int) -> GF2:
    if e == 0:
        return ext_ones(a.shape)
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else ext_mul(result, base)
        e >>= 1
        if e:
            base = ext_sqr(base)
    return result


def ext_equal(a: GF2, b: GF2) -> jax.Array:
    return equal(a.c0, b.c0) & equal(a.c1, b.c1)


def ext_select(mask, a: GF2, b: GF2) -> GF2:
    return GF2(select(mask, a.c0, b.c0), select(mask, a.c1, b.c1))


def ext_sum_axis(a: GF2, axis=-1) -> GF2:
    return GF2(sum_axis(a.c0, axis), sum_axis(a.c1, axis))


def ext_stack(parts: Sequence[GF2], axis=0) -> GF2:
    return GF2(stack([p.c0 for p in parts], axis), stack([p.c1 for p in parts], axis))


# ---------------------------------------------------------------------------
# Roots of unity (host-side exact integer math)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def primitive_root_of_unity(log_n: int) -> int:
    """Generator of the order-2^log_n subgroup, as a python int."""
    assert 0 <= log_n <= TWO_ADICITY
    base = pow(MULTIPLICATIVE_GENERATOR, (P - 1) >> TWO_ADICITY, P)
    for _ in range(TWO_ADICITY - log_n):
        base = (base * base) % P
    return base


@functools.lru_cache(maxsize=None)
def powers_host(base: int, count: int) -> np.ndarray:
    """[1, base, base^2, ...] as uint64 numpy (host precompute for twiddles)."""
    out = np.empty(count, dtype=np.uint64)
    acc = 1
    for i in range(count):
        out[i] = acc
        acc = (acc * base) % P
    return out


@functools.lru_cache(maxsize=96)
def powers_dev_cached(base: int, count: int, mult: int = 1) -> "GF":
    """Device-resident [mult * base^i]_{i<count} mod p, memoized.

    The prover's twiddle/coset/denominator tables (w_pows, u_pows, xs,
    unscale, FRI per-round inverse domains) are challenge-independent
    constants of the circuit shape — recomputing them was an O(n) python
    loop (up to 2^22 iterations for the eval-domain unscale) plus an
    O(n) upload PER PROVE, all serialized on the host side of the
    dispatch stream. Cached, a warm prove skips both."""
    tbl = powers_host(base, count)
    if mult != 1:
        tbl = ((tbl.astype(object) * (mult % P)) % P).astype(np.uint64)
    return from_int(tbl)
