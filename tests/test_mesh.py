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


def test_multichip_full_prove_bit_identical():
    """Full prove with column-sharded witness/setup over the 8-device mesh:
    the proof is BIT-IDENTICAL to single-chip (same transcript) and verifies
    (VERDICT multi-chip-full-prove criterion)."""
    import numpy as np
    from zkevm_harness_tpu.circuits import flagship as fl
    from zkevm_harness_tpu.parallel import mesh as pm
    from zkevm_harness_tpu.prover import plonkish as pk

    cfg = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=8,
                            final_fri_size=8)
    ir = fl.flagship_ir(log_n=6, width=16)
    setup = fl.flagship_setup(ir, cfg)
    W = fl.flagship_witness(ir)
    p1 = pk.prove(ir, setup, W, cfg)
    mesh = pm.make_mesh(8)
    p2 = pm.prove_column_sharded(ir, setup, W, cfg, mesh)
    assert p1.public_inputs == p2.public_inputs
    assert np.array_equal(np.asarray(p1.witness_cap),
                          np.asarray(p2.witness_cap))
    assert np.array_equal(np.asarray(p1.stage2_cap),
                          np.asarray(p2.stage2_cap))
    assert np.array_equal(np.asarray(p1.quotient_cap),
                          np.asarray(p2.quotient_cap))
    assert p1.ood_witness == p2.ood_witness
    assert p1.ood_quotient == p2.ood_quotient
    assert p1.fri.final_poly == p2.fri.final_poly
    assert np.array_equal(p1.fri.query_positions, p2.fri.query_positions)
    assert p1.openings["witness"] == p2.openings["witness"]
    assert pk.verify(ir, setup.vk(), p2, cfg)
