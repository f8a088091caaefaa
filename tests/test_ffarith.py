"""Foreign-field modmul rows: exactness, chaining, inverses, tampering."""

import dataclasses as dc

import pytest

from zkevm_harness_tpu.circuits import ffarith as ff
from zkevm_harness_tpu.prover import plonkish as pk

SECP_P = 2**256 - 2**32 - 977
PAR = ff.FFParams(modulus=SECP_P, limb_bits=8, num_limbs=32)
CFG = pk.PlonkishConfig(rate=2, cap_size=4, num_queries=4, final_fri_size=8)

X = 0xDEADBEEF_CAFEBABE_12345678_9ABCDEF0_0F1E2D3C_4B5A6978_87695A4B_3C2D1E0F
Y = 0x1111111F_22222222_33333333_44444444_55555555_66666666_77777777_88888888


@pytest.fixture(scope="module")
def rig():
    prog = ff.FFProgram(PAR)
    x = prog.input()
    y = prog.input()
    xy = prog.mul(x, y)                      # x*y mod p
    s = prog.fma_const(xy, 3, y)             # 3*xy + y
    inv = prog.inverse(s)                    # s^-1 (checked s*inv == 1)
    out = prog.mul_const(inv, 7)             # 7/s
    layout = ff.build_ff_layout(prog, public_results=(out,))
    ir, setup = ff.ff_setup(layout, CFG)
    W = ff.ff_witness(layout, ir, {(x.row, "A"): X, (y.row, "A"): Y})
    proof = pk.prove(ir, setup, W, CFG)
    return dict(layout=layout, ir=ir, setup=setup, W=W, proof=proof, out=out)


def test_values_match_host_math(rig):
    expected = 7 * pow((3 * (X * Y) + Y) % SECP_P, SECP_P - 2, SECP_P) % SECP_P
    got = ff.result_value(rig["layout"], rig["W"], rig["out"])
    assert got == expected
    # the proven PIs are exactly the result's limbs
    assert [int(v) for v in rig["proof"].public_inputs] == \
        PAR.split(expected)


def test_proves_and_verifies(rig):
    assert pk.verify(rig["ir"], rig["setup"].vk(), rig["proof"], CFG)


def test_tampered_result_pi_rejected(rig):
    proof = rig["proof"]
    pis = list(proof.public_inputs)
    pis[0] = (int(pis[0]) + 1) % pk.gl.P
    bad = dc.replace(proof, public_inputs=tuple(pis))
    assert not pk.verify(rig["ir"], rig["setup"].vk(), bad, CFG)


def test_bad_inverse_rejected_by_witness():
    prog = ff.FFProgram(PAR)
    x = prog.input()
    prog.inverse(x)
    layout = ff.build_ff_layout(prog)
    ir, _ = ff.ff_setup(layout, CFG)
    # forcing a wrong hint breaks the carry chain / r_const identity
    layout.program.rows[1]["a_hint"] = lambda v: 12345
    with pytest.raises(AssertionError):
        W = ff.ff_witness(layout, ir, {(x.row, "A"): X})
        # r_const row demands R == 1; a wrong inverse yields R != 1, which
        # the witness filler cannot satisfy (or the proof would not verify)
        assert ff.result_value(layout, W, ff.FFVar(1, "R")) == 1


def test_modadd_and_const_paths():
    prog = ff.FFProgram(PAR)
    x = prog.input()
    y = prog.input()
    s = prog.add(x, y)
    t = prog.add_const(s, SECP_P - 5)
    layout = ff.build_ff_layout(prog, public_results=(t,))
    ir, setup = ff.ff_setup(layout, CFG)
    W = ff.ff_witness(layout, ir, {(x.row, "A"): X, (y.row, "A"): Y})
    assert ff.result_value(layout, W, t) == (X + Y - 5) % SECP_P
    proof = pk.prove(ir, setup, W, CFG)
    assert pk.verify(ir, setup.vk(), proof, CFG)
