"""BN254 (alt_bn128): fields, G1, MSM, FFT domain — wrapper-layer groundwork.

The SNARK wrapper proves the final compression proof in a Bn254 PLONK circuit
(reference: bellman_ce assemblies, src/proof_wrapper_utils/wrapper.rs,
L1_VERIFIER_DOMAIN_SIZE_LOG = 24). This module provides the exact host-side
curve/field layer the wrapper's prover needs (G1 arithmetic, Pippenger MSM
over a CRS, Fr FFT domain with 2-adicity 28); the PLONK protocol itself and
the G2/pairing verification path land with the wrapper increment.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

# base and scalar fields
Q = 0x30644E72E131A029B85045B68181585D97816A916871CA8D3C208C16D87CFD47
R = 0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000001
FR_TWO_ADICITY = 28
FR_GENERATOR = 5

G1_GENERATOR = (1, 2)
B = 3  # y^2 = x^3 + 3


def fr_root_of_unity(log_n: int) -> int:
    assert log_n <= FR_TWO_ADICITY
    base = pow(FR_GENERATOR, (R - 1) >> FR_TWO_ADICITY, R)
    for _ in range(FR_TWO_ADICITY - log_n):
        base = base * base % R
    return base


def g1_is_on_curve(p) -> bool:
    if p is None:
        return True
    x, y = p
    return (y * y - x * x * x - B) % Q == 0


def g1_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % Q == 0:
            return None
        lam = 3 * x1 * x1 * pow(2 * y1, Q - 2, Q) % Q
    else:
        lam = (y2 - y1) * pow(x2 - x1, Q - 2, Q) % Q
    x3 = (lam * lam - x1 - x2) % Q
    return (x3, (lam * (x1 - x3) - y1) % Q)


def g1_neg(p):
    return None if p is None else (p[0], (-p[1]) % Q)


def g1_mul(p, k: int):
    k %= R
    acc = None
    while k:
        if k & 1:
            acc = g1_add(acc, p)
        p = g1_add(p, p)
        k >>= 1
    return acc


def g1_msm(points: Sequence, scalars: Sequence[int], window_bits: int = 8):
    """Pippenger bucket MSM (host reference; the TPU path is the planned
    Pallas big-int bucket kernel)."""
    acc = None
    n_windows = (254 + window_bits - 1) // window_bits
    mask = (1 << window_bits) - 1
    for w in reversed(range(n_windows)):
        if acc is not None:
            for _ in range(window_bits):
                acc = g1_add(acc, acc)
        buckets = {}
        for pt, s in zip(points, scalars):
            if pt is None:
                continue
            digit = (int(s) >> (w * window_bits)) & mask
            if digit:
                buckets[digit] = g1_add(buckets.get(digit), pt)
        running = None
        window_sum = None
        max_digit = max(buckets.keys(), default=0)
        for digit in range(max_digit, 0, -1):
            b = buckets.get(digit)
            if b is not None:
                running = g1_add(running, b)
            window_sum = g1_add(window_sum, running)
        acc = g1_add(acc, window_sum)
    return acc


def fr_fft(poly: Sequence[int]) -> List[int]:
    """Monomial -> evaluations on the 2^k subgroup (the wrapper's 2^24 domain
    in production; any power of two here)."""
    n = len(poly)
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    w = fr_root_of_unity(log_n)
    a = list(poly)
    rev = [int(format(i, f"0{log_n}b")[::-1], 2) for i in range(n)]
    a = [a[rev[i]] for i in range(n)]
    size = 2
    while size <= n:
        wm = pow(w, n // size, R)
        for start in range(0, n, size):
            wk = 1
            for j in range(size // 2):
                u = a[start + j]
                t = a[start + j + size // 2] * wk % R
                a[start + j] = (u + t) % R
                a[start + j + size // 2] = (u - t) % R
                wk = wk * wm % R
        size *= 2
    return a


def simulated_crs(max_degree: int, tau: int = 0xACE0FBA5E) -> List:
    """[tau^i]G1 powers for tests (the production CRS loads from the
    reference's CRS_FILE, utils.rs get_trusted_setup)."""
    out = []
    acc = 1
    for _ in range(max_degree):
        out.append(g1_mul(G1_GENERATOR, acc))
        acc = acc * tau % R
    return out


def kate_commit(crs: Sequence, coeffs: Sequence[int]):
    """Polynomial commitment [p(tau)]G1 over the monomial CRS."""
    return g1_msm(crs[:len(coeffs)], list(coeffs))
