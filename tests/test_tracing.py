"""Tracing subsystem: spans, counters, report shape."""

import json

from zkevm_harness_tpu.utils.tracing import Tracer


def test_spans_and_counters():
    t = Tracer(enabled=True)
    with t.span("prove", circuit="main_vm"):
        with t.span("ntt"):
            pass
        with t.span("fri"):
            t.count("folds", 3)
    t.count("proofs")
    rep = t.report()
    assert rep["counters"] == {"folds": 3, "proofs": 1}
    assert rep["spans"][0]["name"] == "prove"
    kids = [c["name"] for c in rep["spans"][0]["children"]]
    assert kids == ["ntt", "fri"]
    flat = t.flat_durations()
    assert "prove/fri" in flat
    json.dumps(rep)  # serializable


def test_disabled_is_noop():
    t = Tracer(enabled=False)
    with t.span("x"):
        t.count("y")
    assert t.report() == {"spans": [], "counters": {}}
