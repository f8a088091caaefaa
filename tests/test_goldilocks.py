"""Property tests for Goldilocks field ops vs exact python-int arithmetic."""

import numpy as np
import pytest

from zkevm_harness_tpu.ops import goldilocks as gl

P = gl.P



def eq_ints(got, want):
    got = list(got)
    want = list(want)
    assert len(got) == len(want)
    return all(int(g) == int(w) for g, w in zip(got, want))

def rand_elems(rng, n, include_edges=True):
    vals = rng.integers(0, P, size=n, dtype=np.uint64).astype(object)
    vals = np.array([int(v) % P for v in vals], dtype=object)
    if include_edges and n >= 8:
        edges = [0, 1, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, P - 0xFFFFFFFF, 2**63]
        vals[: len(edges)] = [e % P for e in edges]
    return vals


def test_roundtrip(rng):
    vals = rand_elems(rng, 64)
    a = gl.from_int(vals)
    back = gl.to_ints(a)
    assert all(int(x) == int(y) for x, y in zip(back, vals))


def test_add_sub_neg(rng):
    va, vb = rand_elems(rng, 256), rand_elems(rng, 256, include_edges=False)
    a, b = gl.from_int(va), gl.from_int(vb)
    assert eq_ints(gl.to_ints(gl.add(a, b)), [(x + y) % P for x, y in zip(va, vb)])
    assert eq_ints(gl.to_ints(gl.sub(a, b)), [(x - y) % P for x, y in zip(va, vb)])
    assert eq_ints(gl.to_ints(gl.neg(a)), [(-x) % P for x in va])


def test_mul(rng):
    va, vb = rand_elems(rng, 512), rand_elems(rng, 512, include_edges=False)
    a, b = gl.from_int(va), gl.from_int(vb)
    got = gl.to_ints(gl.mul(a, b))
    assert all(int(g) == (x * y) % P for g, x, y in zip(got, va, vb))


def test_mul_edge_products():
    # worst-case limb patterns
    edge = [P - 1, P - 2, 0xFFFFFFFF, 0xFFFFFFFF00000000 % P, 2**32, 2**63, 1, 0]
    va = [x % P for x in edge for _ in edge]
    vb = [y % P for _ in edge for y in edge]
    got = gl.to_ints(gl.mul(gl.from_int(va), gl.from_int(vb)))
    assert all(int(g) == (x * y) % P for g, x, y in zip(got, va, vb))


def test_pow_inv(rng):
    va = rand_elems(rng, 64)
    a = gl.from_int(va)
    assert eq_ints(gl.to_ints(gl.pow_const(a, 7)), [pow(x, 7, P) for x in va])
    inv = gl.to_ints(gl.inv(a))
    for x, g in zip(va, inv):
        if x == 0:
            assert g == 0
        else:
            assert (int(g) * x) % P == 1
    assert eq_ints(gl.to_ints(gl.pow7(a)), [pow(x, 7, P) for x in va])


def test_sum_axis(rng):
    va = rand_elems(rng, 100, include_edges=False)
    a = gl.from_int(va).reshape(4, 25)
    got = gl.to_ints(gl.sum_axis(a, axis=-1))
    want = [sum(int(v) for v in va[i * 25:(i + 1) * 25]) % P for i in range(4)]
    assert eq_ints(got, want)


def test_dot_const_matrix(rng):
    m = np.array([[5, 7, 1, 3], [4, 6, 1, 1], [1, 3, 5, 7], [1, 1, 4, 6]])
    va = rand_elems(rng, 32, include_edges=False)
    x = gl.from_int(va).reshape(8, 4)
    got = gl.to_ints(gl.dot_const_matrix(m, x))
    for r in range(8):
        row = [int(v) for v in va[r * 4:(r + 1) * 4]]
        for i in range(4):
            want = sum(int(m[i, j]) * row[j] for j in range(4)) % P
            assert int(got[r, i]) == want


def test_ext2_field_axioms(rng):
    va = rand_elems(rng, 32)
    vb = rand_elems(rng, 32, include_edges=False)
    vc = rand_elems(rng, 32, include_edges=False)
    a = gl.GF2(gl.from_int(va), gl.from_int(vb))
    b = gl.GF2(gl.from_int(vc), gl.from_int(va))
    # mul vs exact
    got = gl.ext_mul(a, b)
    for i in range(32):
        a0, a1, b0, b1 = int(va[i]), int(vb[i]), int(vc[i]), int(va[i])
        c0 = (a0 * b0 + 7 * a1 * b1) % P
        c1 = (a0 * b1 + a1 * b0) % P
        assert int(gl.to_ints(got.c0)[i]) == c0
        assert int(gl.to_ints(got.c1)[i]) == c1
    # inverse
    ainv = gl.ext_inv(a)
    prod = gl.ext_mul(a, ainv)
    nz = ~(gl.is_zero(a.c0) & gl.is_zero(a.c1))
    ones = gl.ext_ones(a.shape)
    assert bool(np.all(np.asarray(gl.ext_equal(prod, ones)) | ~np.asarray(nz)))


def test_roots_of_unity():
    for log_n in [1, 2, 5, 10, 20]:
        w = gl.primitive_root_of_unity(log_n)
        assert pow(w, 2**log_n, P) == 1
        assert pow(w, 2 ** (log_n - 1), P) == P - 1  # primitive
    assert gl.primitive_root_of_unity(1) == P - 1


def test_select_equal(rng):
    va = rand_elems(rng, 16)
    vb = rand_elems(rng, 16, include_edges=False)
    a, b = gl.from_int(va), gl.from_int(vb)
    mask = np.arange(16) % 2 == 0
    got = gl.to_ints(gl.select(mask, a, b))
    want = [x if m else y for x, y, m in zip(va, vb, mask)]
    assert eq_ints(got, want)
