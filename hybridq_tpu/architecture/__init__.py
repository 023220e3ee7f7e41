"""QPU architecture data: layouts and coupling layers."""

from hybridq_tpu.architecture.utils import get_layout_from_drawing
from hybridq_tpu.architecture import google, ibm, rigetti

__all__ = ['get_layout_from_drawing', 'google', 'ibm', 'rigetti']
