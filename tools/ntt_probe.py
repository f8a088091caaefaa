"""Microbench: per-coset NTT cost at prove shapes + gather-vs-stream split."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import numpy as np
from zkevm_harness_tpu.ops import goldilocks as gl, ntt as nt

def t(f, *a, n=3):
    f(*a)  # compile
    jax.block_until_ready(f(*a))
    best = 1e9
    for _ in range(n):
        t0 = time.time(); jax.block_until_ready(f(*a)); best = min(best, time.time()-t0)
    return best

rows, L = 300, 1 << 19
x = gl.from_u64(np.random.randint(0, 1 << 63, size=(rows, L), dtype=np.uint64))
print("ntt (300,2^19):", round(t(nt.ntt, x), 3), "s", flush=True)
print("intt (300,2^19):", round(t(nt.intt, x), 3), "s", flush=True)

# gather-only cost: the bit-reverse take
rev = jnp.asarray(nt.bit_reverse_indices(L))
g = jax.jit(lambda v: gl.take(v, rev, axis=-1))
print("bitrev gather (300,2^19):", round(t(g, x), 3), "s", flush=True)

# one fused mul pass for scale reference
m = jax.jit(lambda v: gl.mul(v, v))
print("elementwise mul (300,2^19):", round(t(m, x), 3), "s", flush=True)
