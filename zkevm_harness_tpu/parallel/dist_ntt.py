"""Distributed NTT: one polynomial's DOMAIN sharded across chips.

The "sequence-parallel" analogue for traces too tall for one chip (SURVEY §5:
a 2^20-row x 130-col x LDE trace sharded over chips): a four-step NTT where
each chip holds a contiguous slice of the evaluation domain and the global
transposes ride `lax.all_to_all` over ICI.

Algorithm (N = N1*N2, natural-order input x[n], n = n1*N2 + n2):
  1. all-to-all transpose: chip gets all n1 for its n2 slice,
  2. local NTT of length N1 (the column transforms),
  3. twiddle scaling by w_N^{n2*k1} (sharded table),
  4. all-to-all transpose back, local NTT of length N2,
  5. final all-to-all transpose so the output is natural-order sharded.
Fused pipelines can skip step 5 and keep the transposed layout (the inverse
transform accepts it); correctness-first here returns natural order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P_

from ..ops import goldilocks as gl
from ..ops import ntt as nt
from ..ops.goldilocks import GF, P


@functools.lru_cache(maxsize=None)
def _split(n: int):
    """N = N1 * N2 with N1 <= N2, both powers of two."""
    log_n = n.bit_length() - 1
    l1 = log_n // 2
    return 1 << l1, 1 << (log_n - l1)


@functools.lru_cache(maxsize=None)
def _twiddle_table(n: int) -> np.ndarray:
    """tw[n2, k1] = w_N^{n2*k1} as (N2, N1) uint64 (host, cached)."""
    n1, n2 = _split(n)
    w = gl.primitive_root_of_unity(n.bit_length() - 1)
    row = gl.powers_host(w, n1).astype(object)  # w^{k1}
    out = np.empty((n2, n1), dtype=np.uint64)
    cur = np.ones(n1, dtype=object)
    wn2 = 1
    for i in range(n2):
        out[i] = np.array([int(v) for v in cur], dtype=np.uint64)
        wn2 = wn2  # w_N^{(i+1)k1} = (w^{k1})^{i+1}
        cur = (cur * row) % P
    return out


def distributed_ntt(values: GF, mesh: Mesh, axis: str = "x") -> GF:
    """values: (C, N) with N sharded over the mesh axis; returns the NTT with
    the same natural-order sharding."""
    c, n = values.shape
    d = mesh.shape[axis]
    n1, n2 = _split(n)
    assert n1 % d == 0 and n2 % d == 0, "device count must divide both factors"
    tw = _twiddle_table(n)
    tw_gf = GF(jnp.asarray((tw & 0xFFFFFFFF).astype(np.uint32)),
               jnp.asarray((tw >> np.uint64(32)).astype(np.uint32)))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P_(None, axis), P_(None, axis), P_(axis, None), P_(axis, None)),
        out_specs=P_(None, axis))
    def _run(x_lo, x_hi, tw_lo, tw_hi):
        # local (C, N/D) == (C, N1/D, N2)
        def a2a(a, split_axis, concat_axis):
            return jax.lax.all_to_all(a, axis, split_axis, concat_axis,
                                      tiled=True)

        loc = GF(x_lo.reshape(c, n1 // d, n2), x_hi.reshape(c, n1 // d, n2))
        # transpose 1: -> (C, N1, N2/D): all n1 local, n2 sharded
        loc = GF(a2a(loc.lo, 2, 1), a2a(loc.hi, 2, 1))
        # local column NTTs (length N1): move n1 to last axis
        colmaj = GF(jnp.swapaxes(loc.lo, 1, 2), jnp.swapaxes(loc.hi, 1, 2))
        y = nt.ntt(colmaj)  # (C, N2/D, N1) -> Y[n2_loc, k1]
        # twiddle: tw sharded rows (N2/D, N1)
        tw_loc = GF(tw_lo, tw_hi)
        y = gl.mul(y, gl.broadcast_to(GF(tw_loc.lo[None], tw_loc.hi[None]),
                                      y.shape))
        # transpose 2: split k1, concat n2 -> (C, N2, N1/D)
        y = GF(a2a(y.lo, 2, 1), a2a(y.hi, 2, 1))
        # local row NTTs (length N2) for each k1
        y = GF(jnp.swapaxes(y.lo, 1, 2), jnp.swapaxes(y.hi, 1, 2))
        z = nt.ntt(y)  # (C, N1/D, N2) = Z[k1_loc, k2]
        # transpose 3: natural order X[k1 + N1 k2]: shard k2, keep all k1
        z = GF(a2a(z.lo, 2, 1), a2a(z.hi, 2, 1))  # (C, N1, N2/D)
        z = GF(jnp.swapaxes(z.lo, 1, 2), jnp.swapaxes(z.hi, 1, 2))
        return z.lo.reshape(c, (n2 // d) * n1), z.hi.reshape(c, (n2 // d) * n1)

    lo, hi = _run(values.lo, values.hi, tw_gf.lo, tw_gf.hi)
    return GF(lo, hi)


def shard_domain(values: GF, mesh: Mesh, axis: str = "x") -> GF:
    sh = NamedSharding(mesh, P_(None, axis))
    return GF(jax.device_put(values.lo, sh), jax.device_put(values.hi, sh))
