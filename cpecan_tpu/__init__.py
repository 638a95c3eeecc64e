"""cpecan_tpu — a TPU-native probabilistic sequence-alignment framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of cPecan
(probabilistic pairwise + multiple DNA alignment via banded pair-HMM
forward-backward, MEA decoding, and distributed Baum-Welch EM training).

The compute path is batched anti-diagonal wavefront dynamic programming in
log space on TPU (lax.scan engine + Pallas banded kernel); anchoring,
banding and the sequential decoders run on the host; EM scales over a
`jax.sharding.Mesh` with psum-reduced expectation tensors.

Reference behavior studied from /root/reference (benedictpaten/cPecan);
file:line citations in docstrings point there for parity checking.
"""

from cpecan_tpu.config import PairwiseAlignmentParameters
from cpecan_tpu.models.hmm import Hmm, StateMachineType
from cpecan_tpu.models.state_machine import StateMachine, state_machine5, state_machine3

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level API re-exports (avoid importing jax at package import).
    if name in (
        "get_aligned_pairs",
        "get_aligned_pairs_with_indels",
        "get_expectations",
        "compute_forward_probability",
    ):
        from cpecan_tpu.align import pairwise

        return getattr(pairwise, name)
    raise AttributeError(name)
