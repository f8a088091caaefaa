"""Pallas TPU kernels for the hottest field ops (prototype tier).

The XLA-fused limb kernels in ops/goldilocks.py already run near the VPU
roofline for large batches (BASELINE.md kernel table), so Pallas is the tool
for the cases XLA fusion can't reach: keeping multi-op sequences (butterfly +
twiddle, full Poseidon2 rounds) resident in VMEM across grid steps, and the
future MSM bucket kernels. This module carries the first such kernel —
Goldilocks modular multiply — with the same uint32-limb algorithm as
`gl.mul`, tiled (8,128)-aligned, plus a fused mul-add.

Used opportunistically: `ZKTPU_PALLAS=1` switches `pallas_mul` consumers in;
all call sites fall back to the XLA path otherwise (and always on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import goldilocks as gl
from .goldilocks import GF

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

_MASK16 = np.uint32(0xFFFF)
_EPS = np.uint32(0xFFFFFFFF)


def _mul_kernel(alo_ref, ahi_ref, blo_ref, bhi_ref, olo_ref, ohi_ref):
    """One VMEM tile of Goldilocks mul (identical math to gl.mul)."""
    alo, ahi = alo_ref[:], ahi_ref[:]
    blo, bhi = blo_ref[:], bhi_ref[:]

    def mul32(x, y):
        x0, x1 = x & _MASK16, x >> 16
        y0, y1 = y & _MASK16, y >> 16
        p00 = x0 * y0
        mid = x0 * y1 + x1 * y0  # may wrap; track carry
        mid_c = (mid < x0 * y1).astype(jnp.uint32)
        lo = p00 + (mid << 16)
        lo_c = (lo < p00).astype(jnp.uint32)
        hi = x1 * y1 + (mid >> 16) + (mid_c << 16) + lo_c
        return lo, hi

    ll_lo, ll_hi = mul32(alo, blo)
    lh_lo, lh_hi = mul32(alo, bhi)
    hl_lo, hl_hi = mul32(ahi, blo)
    hh_lo, hh_hi = mul32(ahi, bhi)
    w0 = ll_lo
    w1 = ll_hi + lh_lo
    c1 = (w1 < ll_hi).astype(jnp.uint32)
    w1b = w1 + hl_lo
    c2 = (w1b < w1).astype(jnp.uint32)
    w2 = lh_hi + hl_hi
    d1 = (w2 < lh_hi).astype(jnp.uint32)
    w2b = w2 + hh_lo
    d2 = (w2b < w2).astype(jnp.uint32)
    w2c = w2b + c1 + c2
    d3 = (w2c < w2b).astype(jnp.uint32)
    w3 = hh_hi + d1 + d2 + d3
    # reduce128: t = (w0,w1b) - (w3,0); full borrow iff w1b==0 and w0<w3
    bor = (w0 < w3).astype(jnp.uint32)
    tlo = w0 - w3
    thi = w1b - bor
    lo64_bor = (w1b == 0) & (w0 < w3)
    t2lo = tlo - _EPS
    t2hi = thi - (tlo < _EPS).astype(jnp.uint32)
    tlo = jnp.where(lo64_bor, t2lo, tlo)
    thi = jnp.where(lo64_bor, t2hi, thi)
    ulo = jnp.zeros_like(w2c) - w2c
    uhi = jnp.where(w2c == 0, np.uint32(0), w2c - np.uint32(1))
    rlo = tlo + ulo
    c0 = (rlo < tlo).astype(jnp.uint32)
    t = thi + uhi
    c1b = (t < thi).astype(jnp.uint32)
    rhi = t + c0
    c2b = (rhi < t).astype(jnp.uint32)
    carry = (c1b | c2b) != 0
    r2lo = rlo + _EPS
    r2hi = rhi + (r2lo < rlo).astype(jnp.uint32)
    rlo = jnp.where(carry, r2lo, rlo)
    rhi = jnp.where(carry, r2hi, rhi)
    ge = (rhi == _EPS) & (rlo >= np.uint32(1))
    r3lo = rlo + _EPS
    r3hi = rhi + (r3lo < rlo).astype(jnp.uint32)
    olo_ref[:] = jnp.where(ge, r3lo, rlo)
    ohi_ref[:] = jnp.where(ge, r3hi, rhi)


def _k_add(a: GF, b: GF) -> GF:
    """gl.add without the jit wrapper (kernel-traceable straight-line)."""
    lo, hi, carry = gl._add64(a.lo, a.hi, b.lo, b.hi)
    fix = (carry != 0) | gl._ge_p(lo, hi)
    flo = lo + gl._EPS32
    fhi = hi + (flo < lo).astype(jnp.uint32)
    return GF(jnp.where(fix, flo, lo), jnp.where(fix, fhi, hi))


def _k_mul(a: GF, b: GF) -> GF:
    """gl.mul without the jit wrapper."""
    ll_lo, ll_hi = gl._mul32(a.lo, b.lo)
    lh_lo, lh_hi = gl._mul32(a.lo, b.hi)
    hl_lo, hl_hi = gl._mul32(a.hi, b.lo)
    hh_lo, hh_hi = gl._mul32(a.hi, b.hi)
    w0 = ll_lo
    w1 = ll_hi + lh_lo
    c1 = (w1 < ll_hi).astype(jnp.uint32)
    w1b = w1 + hl_lo
    c2 = (w1b < w1).astype(jnp.uint32)
    w2 = lh_hi + hl_hi
    d1 = (w2 < lh_hi).astype(jnp.uint32)
    w2b = w2 + hh_lo
    d2 = (w2b < w2).astype(jnp.uint32)
    w2c = w2b + (c1 + c2)
    d3 = (w2c < w2b).astype(jnp.uint32)
    w3 = hh_hi + d1 + d2 + d3
    return gl._reduce128(w0, w1b, w2c, w3)


def _k_pow7(a: GF) -> GF:
    a2 = _k_mul(a, a)
    a3 = _k_mul(a2, a)
    a6 = _k_mul(a3, a3)
    return _k_mul(a6, a)


def _k_const(c: int, like: jax.Array) -> GF:
    c %= gl.P
    return GF(jnp.full(like.shape, np.uint32(c & 0xFFFFFFFF)),
              jnp.full(like.shape, np.uint32(c >> 32)))


# ---------------------------------------------------------------------------
# Poseidon2 permutation: all 30 rounds resident in VMEM
# ---------------------------------------------------------------------------
# The XLA path (ops/poseidon2.py) scans rounds, so every round's (B, 12)
# carry round-trips HBM: ~30x the minimal traffic. This kernel keeps a
# (T, KB, 128) state tile in VMEM across the whole permutation; traffic
# drops to one read + one write of the state. Layout: lane-major (T, B)
# so each state lane is a well-tiled (KB, 128) block.

_P2_BLOCK_B = 2048  # batch per grid step: (12, 16, 128) u32 x lo/hi ≈ 400 KB


def _m4_chunk(c):
    """M4 @ [c0..c3] via the add/double form (14 field adds, no muls).

    M4 = [[5,7,1,3],[4,6,1,1],[1,3,5,7],[1,1,4,6]] (Poseidon2 paper 5.1).
    """
    c0, c1, c2, c3 = c
    t0 = _k_add(c0, c1)
    t1 = _k_add(c2, c3)
    t2 = _k_add(_k_add(c1, c1), t1)          # 2c1 + t1
    t3 = _k_add(_k_add(c3, c3), t0)          # 2c3 + t0
    t1x4 = _k_add(_k_add(t1, t1), _k_add(t1, t1))
    t0x4 = _k_add(_k_add(t0, t0), _k_add(t0, t0))
    t4 = _k_add(t1x4, t3)
    t5 = _k_add(t0x4, t2)
    t6 = _k_add(t3, t5)
    t7 = _k_add(t2, t4)
    return [t6, t5, t7, t4]


def _k_ext_linear(x):
    """circ(2*M4, M4, M4) over 12 lanes held as separate (KB,128) tiles."""
    chunks = [_m4_chunk(x[4 * i:4 * (i + 1)]) for i in range(3)]
    totals = [_k_add(_k_add(chunks[0][j], chunks[1][j]), chunks[2][j])
              for j in range(4)]
    return [_k_add(chunks[i][j], totals[j])
            for i in range(3) for j in range(4)]


def _make_poseidon2_kernel(diag_consts):
    from .poseidon2_params import R_F, R_P, T
    half = R_F // 2

    def kernel(ext_lo_ref, ext_hi_ref, int_lo_ref, int_hi_ref,
               lo_ref, hi_ref, olo_ref, ohi_ref):
        x = [GF(lo_ref[i], hi_ref[i]) for i in range(T)]
        shape = x[0].lo.shape
        x = _k_ext_linear(x)

        # rounds run under fori_loop (carry = 24 flat u32 arrays) so the
        # traced graph is ~1 full body + 1 partial body, not 30 unrolled
        # rounds — keeps both Mosaic and interpret-mode compiles small
        def pack(lanes):
            return tuple(a for l in lanes for a in (l.lo, l.hi))

        def unpack(flat):
            return [GF(flat[2 * i], flat[2 * i + 1]) for i in range(T)]

        def bcast(ref_val):
            return jnp.full(shape, ref_val)

        def full_body(r, carry):
            x = unpack(carry)
            x = [_k_pow7(_k_add(x[i], GF(bcast(ext_lo_ref[r, i]),
                                         bcast(ext_hi_ref[r, i]))))
                 for i in range(T)]
            return pack(_k_ext_linear(x))

        def int_body(r, carry):
            x = unpack(carry)
            lane0 = _k_pow7(_k_add(x[0], GF(bcast(int_lo_ref[r]),
                                            bcast(int_hi_ref[r]))))
            x = [lane0] + x[1:]
            acc = list(x)
            while len(acc) > 1:
                nxt = [_k_add(acc[2 * k], acc[2 * k + 1])
                       for k in range(len(acc) // 2)]
                if len(acc) % 2:
                    nxt.append(acc[-1])
                acc = nxt
            total = acc[0]
            return pack([_k_add(_k_mul(x[i],
                                       _k_const(diag_consts[i], x[i].lo)),
                                total) for i in range(T)])

        carry = jax.lax.fori_loop(0, half, full_body, pack(x))
        carry = jax.lax.fori_loop(0, R_P, int_body, carry)
        carry = jax.lax.fori_loop(half, R_F, full_body, carry)
        x = unpack(carry)
        for i in range(T):
            olo_ref[i] = x[i].lo
            ohi_ref[i] = x[i].hi

    return kernel


@functools.lru_cache(maxsize=None)
def _poseidon2_consts():
    from .poseidon2_params import get_params
    p = get_params()
    ext = np.array(p["external_initial"] + p["external_final"],
                   dtype=object)  # (R_F, T)
    internal = np.array(p["internal"], dtype=object)  # (R_P,)
    diag = tuple(int(v) for v in p["internal_diag"])  # (T,)
    def split(arr):
        u = arr.astype(object)
        lo = (u % (1 << 32)).astype(np.uint32)
        hi = (u // (1 << 32)).astype(np.uint32)
        return lo, hi
    return split(ext), split(internal), diag


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_poseidon2_permute(state: GF, interpret: bool = False) -> GF:
    """Poseidon2 permutation, all rounds VMEM-resident.

    state: (..., 12) with flattened batch B a multiple of _P2_BLOCK_B.
    Bit-identical to ops.poseidon2._permute_xla (same limb algorithms, same
    Grain tables) — pinned by tests/test_pallas.py against random + edge
    states, and transitively by every golden proof when enabled on TPU.
    """
    assert HAVE_PALLAS
    from .poseidon2_params import R_F, R_P, T
    assert state.shape[-1] == T
    batch_shape = state.shape[:-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    assert B % _P2_BLOCK_B == 0, B
    kb = _P2_BLOCK_B // 128

    (ext_lo, ext_hi), (int_lo, int_hi), diag = _poseidon2_consts()

    def to_lane_major(arr):
        # (..., T) -> (T, B//128/kb, kb, 128)
        a = arr.reshape(B, T).T
        return a.reshape(T, B // _P2_BLOCK_B, kb, 128)

    lo = to_lane_major(state.lo)
    hi = to_lane_major(state.hi)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    spec = pl.BlockSpec((T, 1, kb, 128), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    out_shape = (jax.ShapeDtypeStruct(lo.shape, jnp.uint32),) * 2
    kernel = _make_poseidon2_kernel(diag)

    def kernel_4d(elr, ehr, ilr, ihr, lo_ref, hi_ref, olo_ref, ohi_ref):
        class _Lane:
            def __init__(self, ref):
                self.ref = ref
            def __getitem__(self, i):
                return self.ref[i, 0]
            def __setitem__(self, i, v):
                self.ref[i, 0] = v
        kernel(elr, ehr, ilr, ihr, _Lane(lo_ref), _Lane(hi_ref),
               _Lane(olo_ref), _Lane(ohi_ref))

    olo, ohi = pl.pallas_call(
        kernel_4d,
        grid=(B // _P2_BLOCK_B,),
        out_shape=out_shape,
        in_specs=[smem, smem, smem, smem, spec, spec],
        out_specs=(spec, spec),
        interpret=interpret,
    )(jnp.asarray(ext_lo), jnp.asarray(ext_hi),
      jnp.asarray(int_lo), jnp.asarray(int_hi), lo, hi)

    def from_lane_major(a):
        return a.reshape(T, B).T.reshape(*batch_shape, T)

    return GF(from_lane_major(olo), from_lane_major(ohi))


class _ArrayRef:
    """Array-backed stand-in for a pallas Ref (kernel-math testing on CPU).

    Reads index the wrapped array; writes land in `out` (a dict) so the
    same kernel function body runs as plain traced JAX with no pallas_call.
    """

    def __init__(self, arr=None, out=None):
        self.arr = arr
        self.out = out if out is not None else {}

    def __getitem__(self, idx):
        return self.arr[idx]

    def __setitem__(self, idx, v):
        self.out[idx] = v


@functools.partial(jax.jit)
def poseidon2_kernel_reference(state: GF) -> GF:
    """Run the EXACT pallas kernel body on plain arrays (no pallas_call).

    CPU-testable check that the kernel math is bit-identical to
    ops.poseidon2.permute; the remaining pallas-only surface (BlockSpecs,
    SMEM scalar loads, grid) is exercised on TPU by tools/kernel_bench.py.
    """
    from .poseidon2_params import T
    (ext_lo, ext_hi), (int_lo, int_hi), diag = _poseidon2_consts()
    batch_shape = state.shape[:-1]
    lo = state.lo.reshape(-1, T).T  # (T, B)
    hi = state.hi.reshape(-1, T).T
    kernel = _make_poseidon2_kernel(diag)
    olo, ohi = _ArrayRef(), _ArrayRef()
    kernel(_ArrayRef(jnp.asarray(ext_lo)), _ArrayRef(jnp.asarray(ext_hi)),
           _ArrayRef(jnp.asarray(int_lo)), _ArrayRef(jnp.asarray(int_hi)),
           _ArrayRef(lo), _ArrayRef(hi), olo, ohi)
    out_lo = jnp.stack([olo.out[i] for i in range(T)])
    out_hi = jnp.stack([ohi.out[i] for i in range(T)])
    return GF(out_lo.T.reshape(*batch_shape, T),
              out_hi.T.reshape(*batch_shape, T))


def poseidon2_supported(state_shape) -> bool:
    """True when the Pallas permutation path applies to this shape.

    MEASURED OFF by default: on the real v5e, XLA already keeps the
    round-scan carry VMEM-resident at prover batch sizes, and this kernel
    loses to it 27x (20.9M vs 575M perms/s, tools/kernel_bench.py
    2026-08-20 — `matches_xla: true`, so the comparison is apples-to-
    apples). Kept as the measured-evidence path (ZKTPU_PALLAS=1) and as
    the template for kernels where XLA's fusion genuinely falls short
    (the NTT runs at 4.9% of butterfly roofline; see ops/ntt.py).
    """
    if not HAVE_PALLAS:
        return False
    import os
    if os.environ.get("ZKTPU_PALLAS") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if state_shape[-1] != 12:
        return False
    b = 1
    for d in state_shape[:-1]:
        b *= int(d)
    return b >= _P2_BLOCK_B and b % _P2_BLOCK_B == 0


_TILE_ROWS = 512  # 512x128 u32 x 6 buffers ≈ 1.5 MB of VMEM per grid step


@functools.partial(jax.jit, static_argnums=())
def pallas_mul(a: GF, b: GF) -> GF:
    """Goldilocks mul as a tiled Pallas kernel (grid over 512x128 blocks)."""
    assert HAVE_PALLAS
    shape = a.lo.shape
    flat = int(np.prod(shape))
    assert flat % (8 * 128) == 0, "pallas_mul needs (8,128)-aligned sizes"
    rows = flat // 128
    tile = min(_TILE_ROWS, rows)
    assert rows % tile == 0

    def rs(x):
        return x.reshape(rows, 128)

    spec = pl.BlockSpec((tile, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_shape = (jax.ShapeDtypeStruct((rows, 128), jnp.uint32),) * 2
    olo, ohi = pl.pallas_call(
        _mul_kernel,
        grid=(rows // tile,),
        out_shape=out_shape,
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        interpret=(jax.default_backend() == "cpu"),
    )(rs(a.lo), rs(a.hi), rs(b.lo), rs(b.hi))
    return GF(olo.reshape(shape), ohi.reshape(shape))
