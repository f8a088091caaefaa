"""Sharded-kernel tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.ops import merkle as mk
from zkevm_harness_tpu.ops import ntt as nt
from zkevm_harness_tpu.ops import poseidon2 as p2
from zkevm_harness_tpu.parallel import mesh as pm


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return pm.make_mesh(8)


def test_sharded_lde_matches_single(mesh, rng):
    w, n = 16, 64
    trace = gl.from_int(rng.integers(0, 2**63, size=(w, n), dtype=np.uint64))
    want = nt.coset_lde(trace, 2)
    got = pm.sharded_coset_lde(pm.shard_columns(trace, mesh), 2, mesh)
    assert bool(np.all(np.asarray(gl.equal(got, want))))


def test_sharded_leaf_hash_matches(mesh, rng):
    w, n = 8, 64
    evals = gl.from_int(rng.integers(0, 2**63, size=(w, n), dtype=np.uint64))
    import jax.numpy as jnp
    rows = gl.GF(jnp.moveaxis(evals.lo, 0, 1), jnp.moveaxis(evals.hi, 0, 1))
    want = mk.hash_leaves(rows)
    got = pm.sharded_leaf_hash(pm.shard_columns(evals, mesh), mesh)
    assert bool(np.all(np.asarray(gl.equal(got, want))))


def test_sharded_poseidon_matches(mesh, rng):
    states = gl.from_int(rng.integers(0, 2**63, size=(16, 12), dtype=np.uint64))
    want = p2.permute(states)
    got = pm.sharded_poseidon_throughput_step(pm.shard_columns(states, mesh), mesh)
    assert bool(np.all(np.asarray(gl.equal(got, want))))


def test_distributed_ntt_matches_single(mesh, rng):
    from zkevm_harness_tpu.parallel import dist_ntt as dn
    from zkevm_harness_tpu.ops import ntt as nt2
    c, n = 3, 1024
    vals = gl.from_int(rng.integers(0, 2**63, size=(c, n), dtype=np.uint64))
    want = nt2.ntt(vals)
    sharded = dn.shard_domain(vals, dn.Mesh(np.array(jax.devices()[:8]), ("x",)))
    m = dn.Mesh(np.array(jax.devices()[:8]), ("x",))
    got = dn.distributed_ntt(dn.shard_domain(vals, m), m)
    assert bool(np.all(np.asarray(gl.equal(got, want))))


def test_sharded_commit_matches_single(mesh, rng):
    import jax.numpy as jnp
    from zkevm_harness_tpu.ops import merkle as mk2
    w, n, rate, cap = 16, 64, 2, 8
    cols = gl.from_int(rng.integers(0, 2**63, size=(w, n), dtype=np.uint64))
    # single-chip reference
    lde = nt.coset_lde(cols, rate)
    rows = gl.GF(jnp.moveaxis(lde.lo, 0, 1), jnp.moveaxis(lde.hi, 0, 1))
    want_tree = mk2.build_tree(mk2.hash_leaves(rows), cap)
    got_lde, got_digests, got_cap = pm.sharded_commit(
        pm.shard_columns(cols, mesh), rate, cap, mesh)
    assert bool(np.all(np.asarray(gl.equal(got_lde, lde))))
    assert bool(np.all(np.asarray(gl.equal(got_digests, want_tree.levels[0]))))
    assert bool(np.all(np.asarray(gl.equal(got_cap, want_tree.cap))))
