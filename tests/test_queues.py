"""Queue simulator invariants (mirrors the reference's basic_queue_test style,
circuit_encodings/src/lib.rs:715-787) + permutation-argument kernels."""

import numpy as np

from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.ops import poseidon2 as p2
from zkevm_harness_tpu.witness import queues as q

P = gl.P


def _enc(rng, n, w):
    return np.array([[int(v) % P for v in row]
                     for row in rng.integers(0, P, size=(n, w), dtype=np.uint64)],
                    dtype=object)


def _permute_ints(state):
    out = gl.to_ints(p2.permute(gl.from_int(np.array(state, dtype=object))))
    return [int(v) for v in out]


def test_narrow_tail_chain_matches_manual(rng):
    """Narrow queue (log-query flavor, width 20): each push hashes
    [enc(20) || tail(4)] from a fresh zero state in 3 overwrite rounds
    (QueueSimulator::push, lib.rs:179-221)."""
    enc = _enc(rng, 4, 20)
    sim = q.QueueSimulator(width=20)
    sim.push_many(enc)
    tails = sim.tails()
    t = [0, 0, 0, 0]
    for i in range(4):
        to_hash = list(enc[i]) + t
        state = [0] * 12
        for r in range(3):
            state[:8] = [int(v) % P for v in to_hash[8 * r:8 * (r + 1)]]
            state = _permute_ints(state)
        t = state[:4]
        assert tuple(int(v) for v in tails[i + 1]) == tuple(t)
    assert sim.state().length == 4


def test_full_width_chain_matches_manual(rng):
    """Full-width queue (memory flavor, width 8): the 12-lane state IS the
    tail; each push overwrites the rate lanes and permutes
    (FullWidthQueueSimulator::push, lib.rs:391-429)."""
    enc = _enc(rng, 5, 8)
    sim = q.FullWidthQueueSimulator()
    sim.push_many(enc)
    tails = sim.tails()
    state = [0] * 12
    for i in range(5):
        state[:8] = [int(v) % P for v in enc[i]]
        state = _permute_ints(state)
        assert tuple(int(v) for v in tails[i + 1]) == tuple(state)
    assert sim.tail == tuple(state)


def test_split_merge_roundtrip(rng):
    for cls, w in ((q.QueueSimulator, 20), (q.FullWidthQueueSimulator, 8)):
        enc = _enc(rng, 10, w)
        sim = cls(width=w)
        sim.push_many(enc)
        parts = sim.split_by(3)
        assert [len(p) for p in parts] == [3, 3, 3, 1]
        for a, b in zip(parts, parts[1:]):
            assert a.tail == tuple(b.head)
        merged = parts[0]
        for nxt in parts[1:]:
            merged = cls.merge(merged, nxt)
        assert merged.tail == sim.tail
        assert len(merged) == 10


def test_empty_queue():
    sim = q.QueueSimulator()
    assert sim.tail == (0, 0, 0, 0)
    assert sim.state().length == 0
    full = q.FullWidthQueueSimulator()
    assert full.tail == (0,) * 12


def test_grand_product_chain(rng):
    vals = [int(v) % P for v in rng.integers(1, P, size=33, dtype=np.uint64)]
    out = gl.to_ints(q.grand_product_chain(gl.from_int(vals)))
    acc = 1
    for i, v in enumerate(vals):
        acc = acc * v % P
        assert int(out[i]) == acc


def test_fs_challenge_terms(rng):
    n, k = 7, 8
    tuples = _enc(rng, n, k)
    ch = [int(v) % P for v in rng.integers(0, P, size=k, dtype=np.uint64)]
    gamma = int(rng.integers(0, P, dtype=np.uint64))
    out = gl.to_ints(q.fs_challenge_terms(
        gl.from_int(tuples), gl.from_int(ch), gl.from_int(gamma)))
    for i in range(n):
        want = (sum(int(tuples[i][j]) * ch[j] for j in range(k)) + gamma) % P
        assert int(out[i]) == want


def test_sort_by_u64_keys(rng):
    n = 16
    hi = rng.integers(0, 4, size=n).astype(np.uint32)
    lo = rng.integers(0, 1000, size=n).astype(np.uint32)
    vals = gl.from_int(np.arange(n, dtype=np.uint64))
    sh, sl, sv, idx = q.sort_by_u64_keys(
        np.asarray(hi), np.asarray(lo), vals)
    keys = [(int(h) << 32) | int(l) for h, l in zip(hi, lo)]
    order = sorted(range(n), key=lambda i: keys[i])  # stable
    got = [int(v) for v in gl.to_u64(sv)]
    assert got == order
    assert [int(v) for v in np.asarray(idx)] == order
