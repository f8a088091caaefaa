"""Verifier structural-error guard (prover/guard.py).

`_verify_inner` explicitly validates proof shape up front (wrong lengths /
missing keys return False cleanly), so an exception escaping it indicates an
INTERNAL verifier bug. The guard keeps the tolerant contract (reject, never
crash) while making swallowed exceptions observable (tracing counter) and
strict mode (kwarg or ZKEVM_VERIFY_STRICT=1) re-raise them — round-1 VERDICT
weak #8."""

import pytest

from zkevm_harness_tpu.prover import guard, plonkish as pk, stark
from zkevm_harness_tpu.utils import tracing


def _boom(*a, **k):
    raise AssertionError("internal invariant fired")


def test_tolerant_swallows_and_counts(monkeypatch):
    monkeypatch.setattr(tracing.GLOBAL, "enabled", True)
    before = tracing.GLOBAL.counters.get("verify_structural_reject", 0)
    assert guard.tolerant_verify(_boom) is False
    after = tracing.GLOBAL.counters.get("verify_structural_reject", 0)
    assert after == before + 1
    assert tracing.GLOBAL.counters.get(
        "verify_structural_reject/AssertionError", 0) >= 1


def test_strict_kwarg_raises():
    with pytest.raises(AssertionError):
        guard.tolerant_verify(_boom, strict=True)


def test_strict_env_raises(monkeypatch):
    monkeypatch.setenv("ZKEVM_VERIFY_STRICT", "1")
    assert guard.strict_default()
    with pytest.raises(AssertionError):
        guard.tolerant_verify(_boom)
    monkeypatch.setenv("ZKEVM_VERIFY_STRICT", "0")
    assert not guard.strict_default()


def test_non_structural_exceptions_always_propagate():
    def inner():
        raise RuntimeError("not a proof-shape error")

    with pytest.raises(RuntimeError):
        guard.tolerant_verify(inner)


@pytest.mark.parametrize("mod", [pk, stark])
def test_verify_entrypoints_route_through_guard(monkeypatch, mod):
    monkeypatch.setattr(mod, "_verify_inner", _boom)
    assert mod.verify() is False
    with pytest.raises(AssertionError):
        mod.verify(strict=True)


def test_good_result_passes_through():
    assert guard.tolerant_verify(lambda: True, strict=True) is True
    assert guard.tolerant_verify(lambda: True) is True
