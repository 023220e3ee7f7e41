"""Multi-process / multi-host wiring.

The reference distributes across nodes with mpi4py (``mpiexec -n N``,
``hybridq/circuit/simulation/simulation_mpi.py:70-479``); the TPU-native
equivalent is ``jax.distributed``: one process per host joins a
coordinator, ``jax.devices()`` spans every process, and the sharded
engines' meshes and collectives (``psum``/``ppermute``) ride ICI/DCN
unchanged.  Host-level work division (tensor-network slice ranges,
Clifford branch chunks) splits by process index exactly like the
reference's rank split (``simulation_mpi.py:459-468``).

Usage (one call per process, before any other JAX use)::

    from hybridq_tpu import parallel
    parallel.initialize()          # env-driven, or pass explicit args

Environment variables (used when arguments are omitted):
``HYBRIDQ_TPU_COORDINATOR`` (host:port), ``HYBRIDQ_TPU_NUM_PROCESSES``,
``HYBRIDQ_TPU_PROCESS_ID``.  On TPU pods with standard launchers the
bare ``initialize()`` defers to JAX's own autodetection.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

__all__ = ['initialize', 'is_distributed', 'process_index',
           'process_count', 'local_slice_range']

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join (or start) the distributed JAX runtime.

    Arguments default to the ``HYBRIDQ_TPU_*`` environment variables;
    with none set, JAX's own cluster autodetection runs (TPU pods).
    Safe to call more than once.
    """
    global _initialized
    if _initialized:
        return
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        'HYBRIDQ_TPU_COORDINATOR')
    if num_processes is None and 'HYBRIDQ_TPU_NUM_PROCESSES' in os.environ:
        num_processes = int(os.environ['HYBRIDQ_TPU_NUM_PROCESSES'])
    if process_id is None and 'HYBRIDQ_TPU_PROCESS_ID' in os.environ:
        process_id = int(os.environ['HYBRIDQ_TPU_PROCESS_ID'])

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True


def is_distributed() -> bool:
    import jax
    return jax.process_count() > 1


def process_index() -> int:
    import jax
    return jax.process_index()


def process_count() -> int:
    import jax
    return jax.process_count()


def local_slice_range(n_slices: int,
                      pid: Optional[int] = None,
                      n_procs: Optional[int] = None) -> Tuple[int, int]:
    """This process's ``(start, stop)`` share of ``n_slices`` tensor-
    network slices — the analog of the reference's MPI rank split
    (``simulation_mpi.py:429-468``).  Pass the result as ``slice_range=``
    to the TN engine; sum the per-process partials (they are plain
    complex numbers/tensors) to finish the contraction.
    """
    import jax
    pid = jax.process_index() if pid is None else pid
    n_procs = jax.process_count() if n_procs is None else n_procs
    base, extra = divmod(n_slices, n_procs)
    start = pid * base + min(pid, extra)
    stop = start + base + (1 if pid < extra else 0)
    return start, stop
