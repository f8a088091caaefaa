"""Queue simulator invariants (mirrors the reference's basic_queue_test style,
circuit_encodings/src/lib.rs:715-787) + permutation-argument kernels."""

import numpy as np

from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.witness import queues as q

P = gl.P


def _enc(rng, n):
    return np.array([[int(v) % P for v in row]
                     for row in rng.integers(0, P, size=(n, 8), dtype=np.uint64)],
                    dtype=object)


def test_tail_chain_matches_manual(rng):
    enc = _enc(rng, 5)
    sim = q.QueueSimulator()
    sim.push_many(enc)
    tails = sim.tails()
    # manual: tail_{i+1} = P2(enc_i || tail_i)[:4]
    from zkevm_harness_tpu.ops import poseidon2 as p2
    t = (0, 0, 0, 0)
    for i in range(5):
        state = gl.from_int(np.array(list(enc[i]) + list(t), dtype=object))
        out = gl.to_ints(p2.permute(state))[:4]
        t = tuple(int(v) for v in out)
        assert tuple(int(v) for v in tails[i + 1]) == t
    assert sim.state().length == 5


def test_split_merge_roundtrip(rng):
    enc = _enc(rng, 10)
    sim = q.QueueSimulator()
    sim.push_many(enc)
    parts = sim.split_by(3)
    assert [len(p) for p in parts] == [3, 3, 3, 1]
    # continuity
    for a, b in zip(parts, parts[1:]):
        assert a.tail == tuple(b.head)
    merged = parts[0]
    for nxt in parts[1:]:
        merged = q.QueueSimulator.merge(merged, nxt)
    assert merged.tail == sim.tail
    assert len(merged) == 10


def test_empty_queue():
    sim = q.QueueSimulator()
    assert sim.tail == (0, 0, 0, 0)
    assert sim.state().length == 0


def test_grand_product_chain(rng):
    vals = [int(v) % P for v in rng.integers(1, P, size=33, dtype=np.uint64)]
    out = gl.to_ints(q.grand_product_chain(gl.from_int(vals)))
    acc = 1
    for i, v in enumerate(vals):
        acc = acc * v % P
        assert int(out[i]) == acc


def test_sort_by_u64_keys(rng):
    n = 64
    keys = rng.integers(0, 2**64, size=n, dtype=np.uint64)
    vals = [int(v) % P for v in rng.integers(0, P, size=n, dtype=np.uint64)]
    import jax.numpy as jnp
    kh = jnp.asarray((keys >> np.uint64(32)).astype(np.uint32))
    kl = jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    sh, sl, sv, idx = q.sort_by_u64_keys(kh, kl, gl.from_int(vals))
    got_keys = (np.asarray(sh).astype(np.uint64) << np.uint64(32)) | np.asarray(sl)
    assert np.all(got_keys == np.sort(keys))
    order = np.argsort(keys, kind="stable")
    got_vals = gl.to_ints(sv)
    for i in range(n):
        assert int(got_vals[i]) == vals[order[i]]


def test_fs_challenge_terms(rng):
    n, k = 7, 3
    tuples = np.array([[int(v) % P for v in row]
                       for row in rng.integers(0, P, size=(n, k), dtype=np.uint64)],
                      dtype=object)
    ch = [3, 5, 7]
    gamma = 11
    got = gl.to_ints(q.fs_challenge_terms(gl.from_int(tuples), gl.from_int(ch),
                                          gl.from_int(gamma)))
    for i in range(n):
        want = (gamma + sum(int(c) * int(t) for c, t in zip(ch, tuples[i]))) % P
        assert int(got[i]) == want
