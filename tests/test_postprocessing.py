"""CircuitMaker / closed-form-input commitment tests."""

import pytest

from zkevm_harness_tpu.witness import postprocessing as pp


def test_circuit_maker_chains_fsm_and_queues():
    cm = pp.CircuitMaker(8)  # RAM permutation
    obs_in = (11, 22)
    i0 = cm.process(obs_in, (0, 0), fsm_input=(0,), fsm_output=(5,),
                    is_last=False)
    i1 = cm.process(obs_in, (33, 44), fsm_input=(5,), fsm_output=(9,),
                    is_last=True)
    assert i0.closed_form_input.start_flag and not i0.closed_form_input.completion_flag
    assert i1.closed_form_input.completion_flag
    assert cm.first is i0 and cm.last is i1
    assert len(cm.queue) == 2
    # public inputs are distinct, deterministic commitments
    assert i0.public_input != i1.public_input
    again = pp.simulate_public_input_value(i0.closed_form_input)
    assert again == i0.public_input


def test_circuit_maker_rejects_broken_continuation():
    cm = pp.CircuitMaker(1)
    cm.process((1,), (2,), fsm_input=(0,), fsm_output=(7,), is_last=False)
    with pytest.raises(AssertionError):
        cm.process((1,), (2,), fsm_input=(8,), fsm_output=(9,), is_last=True)


def test_circuit_maker_rejects_changed_observable_input():
    cm = pp.CircuitMaker(1)
    cm.process((1,), (2,), fsm_input=(0,), fsm_output=(7,), is_last=False)
    with pytest.raises(AssertionError):
        cm.process((3,), (2,), fsm_input=(7,), fsm_output=(9,), is_last=True)


def test_process_real_digest_matches_leaf_recomputation():
    """process_real pushes the Poseidon2 digest of the REAL PI vector —
    byte-identical to what leaf circuits recompute from the child proof."""
    from zkevm_harness_tpu.ops import goldilocks as gl
    from zkevm_harness_tpu.ops import poseidon2 as p2
    cfi = pp.ClosedFormInput(True, True, (5,), (6,), (0, 0), (1, 2))
    pis = [11, 22, 33, 44, 55]
    cm = pp.CircuitMaker(8)
    inst = cm.process_real(cfi, pis)
    want = tuple(int(v) for v in gl.to_ints(
        p2.hash_elements(gl.from_int(pis))))
    assert inst.public_input == want
    assert cm.queue.tail != (0,) * 12


def test_process_real_rejects_broken_fsm_chain():
    cm = pp.CircuitMaker(8)
    cm.process_real(pp.ClosedFormInput(True, False, (5,), (), (0,), (7,)),
                    [1, 2])
    with pytest.raises(ValueError):
        cm.process_real(pp.ClosedFormInput(False, True, (5,), (), (8,), (9,)),
                        [3, 4])


def test_process_real_rejects_changed_observable_input():
    cm = pp.CircuitMaker(8)
    cm.process_real(pp.ClosedFormInput(True, False, (5,), (), (0,), (7,)),
                    [1, 2])
    with pytest.raises(ValueError):
        cm.process_real(pp.ClosedFormInput(False, True, (6,), (), (7,), (9,)),
                        [3, 4])


def test_process_real_rejects_misplaced_start_flag():
    cm = pp.CircuitMaker(8)
    with pytest.raises(ValueError):
        cm.process_real(pp.ClosedFormInput(False, True, (5,), (), (0,), (7,)),
                        [1, 2])
