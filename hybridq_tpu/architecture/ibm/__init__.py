from hybridq_tpu.architecture.ibm import rochester, eagle

__all__ = ['rochester', 'eagle']
