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
