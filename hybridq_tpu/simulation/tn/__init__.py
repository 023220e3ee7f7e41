"""Sliced tensor-network contraction engine."""

from hybridq_tpu.simulation.tn.network import (Tensor, TensorNetwork,
                                               circuit_to_tn, build_tn)
from hybridq_tpu.simulation.tn.path import (ContractionTree, PathInfo,
                                            find_path)
from hybridq_tpu.simulation.tn.slicer import find_slices, SliceCost
from hybridq_tpu.simulation.tn.contract import (ContractionPlan,
                                                SlicedContractor)
from hybridq_tpu.simulation.tn.simulate import (simulate_tn,
                                                make_plan)

__all__ = ['Tensor', 'TensorNetwork', 'circuit_to_tn', 'build_tn',
           'ContractionTree', 'PathInfo', 'find_path', 'find_slices',
           'SliceCost', 'ContractionPlan', 'SlicedContractor',
           'simulate_tn', 'make_plan']
