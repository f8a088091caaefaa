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
