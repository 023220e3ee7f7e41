from hybridq_tpu.architecture.rigetti import aspen_7, aspen_11

__all__ = ['aspen_7', 'aspen_11']
