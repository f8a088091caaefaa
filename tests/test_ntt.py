"""NTT/LDE tests vs naive exact-integer evaluation."""

import numpy as np

from zkevm_harness_tpu.ops import goldilocks as gl
from zkevm_harness_tpu.ops import ntt as nt

P = gl.P


def naive_eval_domain(coeffs, domain):
    out = []
    for x in domain:
        acc = 0
        xp = 1
        for c in coeffs:
            acc = (acc + c * xp) % P
            xp = (xp * x) % P
        out.append(acc)
    return out


def test_ntt_matches_naive(rng):
    n = 64
    coeffs = [int(v) % P for v in rng.integers(0, P, size=n, dtype=np.uint64)]
    w = gl.primitive_root_of_unity(6)
    domain = [pow(w, i, P) for i in range(n)]
    want = naive_eval_domain(coeffs, domain)
    got = gl.to_ints(nt.ntt(gl.from_int(coeffs)))
    assert [int(x) for x in got] == want


def test_intt_roundtrip(rng):
    n = 1024
    vals = gl.from_int([int(v) % P for v in rng.integers(0, P, size=n, dtype=np.uint64)])
    back = nt.ntt(nt.intt(vals))
    assert bool(np.all(np.asarray(gl.equal(back, vals))))
    back2 = nt.intt(nt.ntt(vals))
    assert bool(np.all(np.asarray(gl.equal(back2, vals))))


def test_batched_ntt(rng):
    n, b = 32, 3
    coeffs = np.array([[int(v) % P for v in row]
                       for row in rng.integers(0, P, size=(b, n), dtype=np.uint64)],
                      dtype=object)
    got = gl.to_ints(nt.ntt(gl.from_int(coeffs)))
    w = gl.primitive_root_of_unity(5)
    domain = [pow(w, i, P) for i in range(n)]
    for r in range(b):
        want = naive_eval_domain([int(c) for c in coeffs[r]], domain)
        assert [int(x) for x in got[r]] == want


def test_coset_lde(rng):
    n, k = 32, 4
    coeffs = [int(v) % P for v in rng.integers(0, P, size=n, dtype=np.uint64)]
    w = gl.primitive_root_of_unity(5)
    evals = gl.from_int(naive_eval_domain(coeffs, [pow(w, i, P) for i in range(n)]))
    lde = gl.to_ints(nt.coset_lde(evals, k))
    wk = gl.primitive_root_of_unity(7)
    g = gl.MULTIPLICATIVE_GENERATOR
    big_domain = [(g * pow(wk, i, P)) % P for i in range(n * k)]
    want = naive_eval_domain(coeffs, big_domain)
    assert [int(x) for x in lde] == want


def test_eval_poly_at_ext(rng):
    n = 64
    coeffs = [int(v) % P for v in rng.integers(0, P, size=n, dtype=np.uint64)]
    x0, x1 = 123456789123456789 % P, 987654321987654321 % P
    got = nt.eval_poly_at(gl.from_int(coeffs), gl.ext_from_ints(x0, x1))
    # exact ext arithmetic: (a0+a1 w)(b0+b1 w) with w^2=7
    acc = (0, 0)
    xp = (1, 0)
    for c in coeffs:
        acc = ((acc[0] + c * xp[0]) % P, (acc[1] + c * xp[1]) % P)
        xp = ((xp[0] * x0 + 7 * xp[1] * x1) % P, (xp[0] * x1 + xp[1] * x0) % P)
    assert int(gl.to_ints(got.c0)) == acc[0]
    assert int(gl.to_ints(got.c1)) == acc[1]


def test_four_step_matches_small(rng):
    """The four-step core (engaged at log_n >= 14) must be bit-identical
    to the radix-2 form — every committed polynomial at prover shapes
    flows through it."""
    import numpy as np
    from zkevm_harness_tpu.ops import ntt as nt
    log_n = nt._FOUR_STEP_MIN_LOG
    n = 1 << log_n
    x = gl.from_u64(rng.integers(0, gl.P, size=(2, n), dtype=np.uint64))
    for inverse in (False, True):
        a = gl.to_u64(nt._ntt_small(x, log_n, inverse))
        b = gl.to_u64(nt._ntt_core(x, log_n, inverse))
        assert np.array_equal(a, b)
