"""secp256k1 ECDSA public-key recovery (the ecrecover precompile).

Parity with the reference's ECRecover precompile circuit input path (base
circuit type 7, capacity 7 recoveries per 2^20-row instance). Exact
python-int implementation; the per-recovery witness (scalar decompositions,
point doublings) feeds the ecrecover circuit decomposer.
"""

from __future__ import annotations

from typing import Optional, Tuple

from .native import keccak256

P = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
G = (0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798,
     0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8)


def _inv(a: int, m: int) -> int:
    return pow(a, m - 2, m)


def _add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = (3 * x1 * x1) * _inv(2 * y1, P) % P
    else:
        lam = (y2 - y1) * _inv(x2 - x1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return (x3, (lam * (x1 - x3) - y1) % P)


def _mul(p, k: int):
    result = None
    while k:
        if k & 1:
            result = _add(result, p)
        p = _add(p, p)
        k >>= 1
    return result


def is_on_curve(p) -> bool:
    if p is None:
        return True
    x, y = p
    return (y * y - x * x * x - 7) % P == 0


def recover(msg_hash: bytes, v: int, r: int, s: int) -> Optional[Tuple[int, int]]:
    """Recover the public key; v in {0, 1} (parity), or {27, 28}."""
    if v >= 27:
        v -= 27
    if not (1 <= r < N and 1 <= s < N and v in (0, 1)):
        return None
    x = r  # high-r (r + N) recovery not used by the zkEVM path
    y_sq = (pow(x, 3, P) + 7) % P
    y = pow(y_sq, (P + 1) // 4, P)
    if y * y % P != y_sq:
        return None
    if y % 2 != v:
        y = P - y
    R_pt = (x, y)
    e = int.from_bytes(msg_hash, "big") % N
    r_inv = _inv(r, N)
    # Q = r^-1 (s*R - e*G)
    q = _add(_mul(R_pt, s * r_inv % N), _mul(G, (-e * r_inv) % N))
    if q is None or not is_on_curve(q):
        return None
    return q


def ecrecover_address(msg_hash: bytes, v: int, r: int, s: int) -> Optional[bytes]:
    """Ethereum-style: 20-byte address = keccak(pubkey_xy)[12:]."""
    q = recover(msg_hash, v, r, s)
    if q is None:
        return None
    data = q[0].to_bytes(32, "big") + q[1].to_bytes(32, "big")
    return keccak256(data)[12:]


def sign(msg_hash: bytes, priv: int, k: int) -> Tuple[int, int, int]:
    """Deterministic-nonce test helper (not for production signing)."""
    R_pt = _mul(G, k)
    r = R_pt[0] % N
    e = int.from_bytes(msg_hash, "big") % N
    s = _inv(k, N) * (e + r * priv) % N
    v = R_pt[1] % 2
    # normalize low-s like Ethereum
    if s > N // 2:
        s = N - s
        v ^= 1
    return v, r, s
