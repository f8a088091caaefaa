"""secp256k1 ecrecover tests (sign -> recover roundtrip + negatives)."""

from zkevm_harness_tpu.utils import secp256k1 as ec
from zkevm_harness_tpu.utils.native import keccak256
from zkevm_harness_tpu.vm.environment import DefaultPrecompilesProcessor


def test_sign_recover_roundtrip():
    priv = 0xC0FFEE1234567890ABCDEF
    pub = ec._mul(ec.G, priv)
    h = keccak256(b"hello zkevm")
    v, r, s = ec.sign(h, priv, k=987654321987654321)
    got = ec.recover(h, v, r, s)
    assert got == pub
    addr = ec.ecrecover_address(h, v, r, s)
    want = keccak256(pub[0].to_bytes(32, "big") + pub[1].to_bytes(32, "big"))[12:]
    assert addr == want
    # wrong hash -> different key
    assert ec.recover(keccak256(b"other"), v, r, s) != pub
    # invalid r -> None
    assert ec.recover(h, v, 0, s) is None
    assert ec.recover(h, 5, r, s) is None


def test_precompile_dispatch():
    priv = 0xDEADBEEF
    pub = ec._mul(ec.G, priv)
    h = keccak256(b"msg")
    v, r, s = ec.sign(h, priv, k=31337)
    data = h + v.to_bytes(32, "big") + r.to_bytes(32, "big") + s.to_bytes(32, "big")
    pp = DefaultPrecompilesProcessor()
    out = pp.process(DefaultPrecompilesProcessor.ECRECOVER_ADDRESS, data)
    want = keccak256(pub[0].to_bytes(32, "big") + pub[1].to_bytes(32, "big"))[12:]
    assert out[12:] == want and out[:12] == b"\x00" * 12


def test_ecrecover_decomposer():
    from zkevm_harness_tpu.witness.ecrecover_witness import ecrecover_decompose
    priv = 0x1234567
    h = keccak256(b"x")
    v, r, s = ec.sign(h, priv, k=777)
    good = h + v.to_bytes(32, "big") + r.to_bytes(32, "big") + s.to_bytes(32, "big")
    bad = h + (9).to_bytes(32, "big") + r.to_bytes(32, "big") + s.to_bytes(32, "big")
    insts = ecrecover_decompose([good] * 8 + [bad], capacity=7)
    assert [len(i.invocations) for i in insts] == [7, 2]
    assert insts[0].invocations[0].success
    assert not insts[1].invocations[-1].success
    assert insts[1].invocations[-1].address is None
