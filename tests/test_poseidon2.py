"""Poseidon2 kernel vs an independent pure-python-int implementation."""

import numpy as np

from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.ops import poseidon2 as p2
from zkevm_harness_tpu.ops.poseidon2_params import M4, R_F, R_P, T, get_params

P = gl.P


def ref_external_linear(state):
    out = [0] * T
    mixed = []
    for c in range(3):
        chunk = state[4 * c:4 * c + 4]
        mixed.extend(
            sum(int(M4[i, j]) * chunk[j] for j in range(4)) % P for i in range(4))
    totals = [(mixed[i] + mixed[i + 4] + mixed[i + 8]) % P for i in range(4)]
    for c in range(3):
        for i in range(4):
            out[4 * c + i] = (mixed[4 * c + i] + totals[i]) % P
    return out


def ref_permute(state):
    p = get_params()
    state = ref_external_linear(state)
    ext = p["external_initial"] + p["external_final"]
    diag = p["internal_diag"]
    half = R_F // 2
    for r in range(half):
        state = [pow((s + rc) % P, 7, P) for s, rc in zip(state, ext[r])]
        state = ref_external_linear(state)
    for r in range(R_P):
        state = list(state)
        state[0] = pow((state[0] + p["internal"][r]) % P, 7, P)
        total = sum(state) % P
        state = [(m * s + total) % P for s, m in zip(state, diag)]
    for r in range(half):
        state = [pow((s + rc) % P, 7, P) for s, rc in zip(state, ext[half + r])]
        state = ref_external_linear(state)
    return state


def test_permute_matches_reference(rng):
    batch = 5
    vals = rng.integers(0, P, size=(batch, T), dtype=np.uint64)
    vals = np.array([[int(v) % P for v in row] for row in vals], dtype=object)
    got = gl.to_ints(p2.permute(gl.from_int(vals)))
    for b in range(batch):
        want = ref_permute([int(v) for v in vals[b]])
        assert [int(x) for x in got[b]] == want


def test_permute_zero_state_nonzero():
    out = gl.to_ints(p2.permute(gl.zeros((T,))))
    assert any(int(x) != 0 for x in out)


def test_hash_two_to_one_and_elements(rng):
    l = gl.from_int(rng.integers(0, 2**63, size=(3, 4), dtype=np.uint64))
    r = gl.from_int(rng.integers(0, 2**63, size=(3, 4), dtype=np.uint64))
    d1 = p2.hash_two_to_one(l, r)
    d2 = p2.hash_two_to_one(l, r)
    assert np.all(np.asarray(gl.equal(d1, d2)))
    d3 = p2.hash_two_to_one(r, l)
    assert not np.all(np.asarray(gl.equal(d1, d3)))
    # hash_elements: one full rate chunk == manual permute
    e = gl.from_int(rng.integers(0, 2**63, size=(8,), dtype=np.uint64))
    he = p2.hash_elements(e)
    state = gl.concatenate([e, gl.zeros((4,))], axis=-1)
    want = p2.permute(state)[..., :4]
    assert np.all(np.asarray(gl.equal(he, want)))


def test_full_width_absorb_chains(rng):
    enc = gl.from_int(rng.integers(0, 2**63, size=(2, 8), dtype=np.uint64))
    s0 = gl.zeros((2, 12))
    s1 = p2.full_width_absorb(s0, enc)
    s2 = p2.full_width_absorb(s1, enc)
    assert not np.all(np.asarray(gl.equal(s1, s2)))
    assert s1.shape == (2, 12)
    # manual: overwrite rate lanes then permute
    manual = p2.permute(gl.concatenate([enc, s0[..., 8:]], axis=-1))
    assert np.all(np.asarray(gl.equal(s1, manual)))


def test_pinned_permutation_vector():
    """Hard-pinned vector over the FRAMEWORK's production constant tables
    (Grain-generated; boojum's tables are unreachable from this environment
    — BASELINE.md "Conformance"). Catches any constant/matrix drift that
    the independent-reimplementation test above would silently follow."""
    out = gl.to_ints(p2.permute(gl.from_int(list(range(T)))))
    assert [int(v) for v in out] == [
        16554216206709474952, 11165653368081738105, 15510491069834582656,
        904424896032794924, 4443680892611024698, 12657429491349814692,
        16757781937420386340, 15944128758986577910, 13120191295696364543,
        15956608950573169034, 2873883470026321187, 4028397520777608596]


def test_pinned_bn254_permutation_vector():
    from zkevm_harness_tpu.utils import poseidon2_bn254 as p2b
    assert p2b.permute([1, 2, 3]) == [
        5805939551255980992707535583775870472601805236204535772365613264253722973064,
        19559931707547793599803032231721000083507983364950872992024294724572520071158,
        4976522103639171676503152883494686011491937338896597361562954819691229224059]
    assert p2b.hash_elements([7, 8, 9]) == \
        15379595650334150049885354912616643046889771321752806482583946137951678495436
