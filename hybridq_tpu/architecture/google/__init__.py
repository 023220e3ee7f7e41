from hybridq_tpu.architecture.google import sycamore

__all__ = ['sycamore']
