"""HMM container, serialization round-trips, and state-machine loading
(reference parity: tests/pairwiseAlignerTest.c:997-1089)."""

import io

import numpy as np
import pytest

from cpecan_tpu.models.hmm import Hmm, StateMachineType
from cpecan_tpu.models.state_machine import (
    state_machine5, state_machine3, state_machine_from_hmm, default_state_machine,
)


@pytest.mark.parametrize("hmm_type", list(StateMachineType))
class TestHmm:
    def test_normalise(self, hmm_type):
        rng = np.random.default_rng(0)
        hmm = Hmm(hmm_type)
        hmm.randomise(rng)
        np.testing.assert_allclose(hmm.transitions.sum(axis=1), 1.0, atol=1e-12)
        np.testing.assert_allclose(hmm.emissions.sum(axis=(1, 2)), 1.0, atol=1e-12)

    def test_text_roundtrip(self, hmm_type):
        rng = np.random.default_rng(1)
        hmm = Hmm(hmm_type)
        hmm.randomise(rng)
        hmm.likelihood = -123.5
        hmm2 = Hmm.loads(hmm.dumps())
        assert hmm2.type == hmm.type
        # text format is %f (6 decimals)
        np.testing.assert_allclose(hmm2.transitions, hmm.transitions, atol=1e-6)
        np.testing.assert_allclose(hmm2.emissions, hmm.emissions, atol=1e-6)
        assert abs(hmm2.likelihood - hmm.likelihood) < 1e-6

    def test_json_roundtrip(self, hmm_type):
        rng = np.random.default_rng(2)
        hmm = Hmm(hmm_type)
        hmm.randomise(rng)
        hmm2 = Hmm.from_json(hmm.to_json())
        np.testing.assert_allclose(hmm2.transitions, hmm.transitions)
        np.testing.assert_allclose(hmm2.emissions, hmm.emissions)

    def test_load_into_state_machine(self, hmm_type):
        rng = np.random.default_rng(3)
        hmm = Hmm(hmm_type)
        hmm.randomise(rng)
        sm = state_machine_from_hmm(hmm)
        assert sm.state_number == hmm_type.state_number
        # transition matrices must hold log probs of the loaded Hmm rows:
        # each active transition's exp sums to <= 1 per from-state
        for t in (sm.t_x, sm.t_m, sm.t_y):
            assert np.all(np.isfinite(t) | (t == -np.inf))

    def test_pseudocount(self, hmm_type):
        hmm = Hmm(hmm_type, pseudo_expectation=0.3)
        assert np.all(hmm.transitions == 0.3)
        assert np.all(hmm.emissions == 0.3)


class TestStateMachineDefaults:
    def test_five_state_constants(self):
        sm = state_machine5()
        # spot-check a few reference constants (impl/stateMachine.c:484-491)
        assert abs(sm.t_m[0, 0] - (-0.030064059121770816)) < 1e-6
        assert abs(sm.t_x[0, 1] - (-4.34381910900448)) < 1e-6
        assert abs(sm.t_x[3, 3] - (-0.003442492794189331)) < 1e-6
        # start: match only; ragged start: long gaps only (:401-410)
        assert sm.start[0] == 0 and np.all(np.isinf(sm.start[1:]))
        assert np.all(np.isinf(sm.ragged_start[:3])) and np.all(sm.ragged_start[3:] == 0)

    def test_three_state_constants(self):
        sm = state_machine3()
        assert abs(sm.t_x[0, 1] - (-4.21256642)) < 1e-6
        assert abs(sm.t_x[2, 1] - (-4.910694825551255)) < 1e-6  # gap switch active
        assert sm.start[0] == 0

    def test_n_emissions(self):
        sm = state_machine5()
        assert abs(sm.em_match[4, 0] - (-2.772588722)) < 1e-5
        assert abs(sm.em_gap_x[4] - (-1.386294361)) < 1e-5

    def test_short_long_swap(self):
        """EM can leave 'short' gaps extending longer than 'long' ones; the
        loader must swap them (reference impl/stateMachine.c:598-604)."""
        hmm = Hmm(StateMachineType.fiveState)
        hmm.randomise(np.random.default_rng(5))
        # force short extend > long extend
        hmm.transitions[1, 1] = 0.9
        hmm.transitions[2, 2] = 0.9
        hmm.transitions[3, 3] = 0.1
        hmm.transitions[4, 4] = 0.1
        sm = state_machine_from_hmm(hmm)
        assert sm.t_x[1, 1] < sm.t_x[3, 3]  # post swap: short extend < long extend


class TestSymbols:
    def test_encode_decode(self):
        from cpecan_tpu.utils.symbols import encode, decode
        assert encode("ACGTNacgtnX").tolist() == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 4]
        assert decode([0, 1, 2, 3, 4]) == "ACGTN"

    def test_reverse_complement(self):
        from cpecan_tpu.utils.symbols import reverse_complement
        assert reverse_complement("ACGT") == "ACGT"
        assert reverse_complement("AACG") == "CGTT"
        assert reverse_complement("aacg") == "cgtt"
