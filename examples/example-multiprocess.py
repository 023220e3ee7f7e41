"""Multi-process example — the analog of the reference's
``mpiexec -n 2 examples/example-mpi.py`` CI job
(``.github/workflows/python-example.yml:23-32``,
``examples/example-mpi.py:120-140``).

Run with no arguments: the script launches TWO worker processes that
join a ``jax.distributed`` coordinator (4 virtual CPU devices each → an
8-device global mesh), then each part asserts parity:

 1. **Sharded state vector across processes** — the indexed sharded
    evolver runs a 7-qubit RQC over the 8 global devices;
    outcome probabilities (a replicated psum output) must match a
    single-process dense evolution to 1e-5.
 2. **Tensor-network slice split** — the parent builds ONE sliced
    contraction plan (``tn.make_plan``, the analog of rank 0's
    ``SlicedContractor`` broadcast, reference ``simulation_mpi.py:451``);
    each worker contracts only its ``parallel.local_slice_range`` share
    and the parent sums the partials, which must equal the full
    contraction to 1e-5.
 3. **Distributed Clifford frontier** — ``update_pauli_string`` with
    the autodetected ``jax.distributed`` runtime splits the BFS branch
    frontier across the processes and all-gather-merges the partial
    dicts (the analog of the reference's MPI scatter + binary-tree
    merge, ``clifford.py:1227-1386``); every worker's merged dict must
    equal the parent's single-process result to 1e-6.
"""

import importlib.util
import os
import sys

if importlib.util.find_spec('hybridq_tpu') is None:
    # Fresh checkout without the editable install: run in-place.
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

import json
import os
import pickle
import subprocess
import sys
import tempfile

N = 7
DEPTH = 25
SEED = 1234
# Process topology — overridable so CI can also run the 8-process x
# 1-device layout, where every collective really crosses process
# boundaries (in-process multi-device meshes hide ppermute bugs).
N_PROC = int(os.environ.get('HYBRIDQ_TPU_EXAMPLE_NPROC', 2))
DEV_PER_PROC = int(os.environ.get('HYBRIDQ_TPU_EXAMPLE_DEVS', 4))


def build_workload():
    import numpy as np
    np.random.seed(SEED)
    from hybridq_tpu.circuit import Circuit
    from hybridq_tpu.extras.random import get_rqc
    from hybridq_tpu.gate import Gate

    return get_rqc(N, DEPTH, indexes=list(range(N))) + Circuit(
        Gate('H', [q]) for q in range(N))


def build_clifford_workload():
    """Clifford+T ladder + Pauli operator for the distributed frontier
    check: ~200 output strings, so the branch split is exercised for
    real (a random RQC often collapses to a handful of strings)."""
    from hybridq_tpu.circuit import Circuit
    from hybridq_tpu.gate import Gate

    nq = 6
    c = Circuit()
    for _ in range(3):
        for q in range(nq):
            c.append(Gate('H', [q]))
            c.append(Gate('T', [q]))
        for q in range(nq - 1):
            c.append(Gate('CX', [q, q + 1]))
    pauli = Circuit([Gate('X', [0]), Gate('Z', [3])])
    return c, pauli


def worker(out_path, plan_path):
    import numpy as np

    # In this environment jax may be pre-imported at interpreter startup
    # (the env vars alone are ignored then): force the CPU platform and
    # the per-process virtual device count through the live config.
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', DEV_PER_PROC)

    from hybridq_tpu import parallel
    parallel.initialize()

    assert jax.process_count() == N_PROC, jax.process_count()
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC
    pid = parallel.process_index()

    # --- Part 1: sharded state vector across processes ----------------
    from hybridq_tpu.simulation.sharded import ShardedIndexedEvolver

    c = build_workload()
    ev = ShardedIndexedEvolver(n_qubits=N, devices=jax.devices(),
                               seed=SEED)
    psi = ev.prepare_state('0' * N)
    psi = ev.evolve(psi, c, qubits=list(range(N)))
    # Probabilities of 3 qubits: replicated psum output, identical on
    # every process.
    psi, probs = ev.probabilities(psi, [0, 3, 5])
    probs = np.asarray(probs)

    # --- Part 2: TN slice range for this process ----------------------
    with open(plan_path, 'rb') as f:
        net, info, plan = pickle.load(f)
    from hybridq_tpu.simulation import simulate

    n_slices = 1
    for i in plan.sliced:
        n_slices *= 2
    start, stop = parallel.local_slice_range(n_slices)
    partial = simulate(net, optimize=(info, plan), backend='numpy',
                       slice_range=(start, stop))

    # --- Part 3: distributed Clifford branch frontier ------------------
    from hybridq_tpu.simulation.clifford import update_pauli_string

    cc, pauli = build_clifford_workload()
    cdb = update_pauli_string(cc, pauli, float_type='float64')

    with open(out_path, 'wb') as f:
        pickle.dump({'pid': pid, 'probs': probs,
                     'partial': complex(np.asarray(partial).reshape(-1)[0]),
                     'slice_range': (start, stop),
                     'n_slices': n_slices,
                     'clifford_db': dict(cdb)}, f)
    print(f"# worker {pid}: ok (slices {start}:{stop} of {n_slices}, "
          f"{len(cdb)} pauli strings)", flush=True)


def parent():
    import numpy as np

    # Reference values + the shared TN plan, computed single-process.
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'

    import jax
    jax.config.update('jax_platforms', 'cpu')

    c = build_workload()
    from hybridq_tpu.simulation import simulate
    from hybridq_tpu.simulation.tn import make_plan

    psi = np.asarray(simulate(c, initial_state='0',
                              complex_type='complex128')).reshape(-1)
    # Expected probabilities of qubits [0, 3, 5].
    T = np.abs(psi.reshape((2,) * N))**2
    expected_probs = T.sum(axis=tuple(
        a for a in range(N) if a not in (0, 3, 5))).reshape(-1)

    # Build ONE sliced plan for a closed amplitude (<1..1|psi>), shared
    # by every worker (the reference broadcasts rank 0's plan).
    net, opt = simulate(c, initial_state='0', final_state='1' * N,
                        optimize='tn', backend='numpy',
                        tensor_only=True, max_time=20)
    info, plan = make_plan(opt, target_size=2**2, time_budget=10)
    expected_amp = psi[-1]

    tmp = tempfile.mkdtemp(prefix='hqtpu_mp_')
    plan_path = os.path.join(tmp, 'plan.pkl')
    with open(plan_path, 'wb') as f:
        pickle.dump((net, info, plan), f)

    # Launch the workers.
    port = 12000 + (os.getpid() % 20000)
    procs = []
    outs = []
    for pid in range(N_PROC):
        out = os.path.join(tmp, f'out{pid}.pkl')
        outs.append(out)
        wenv = dict(os.environ)
        wenv.pop('JAX_PLATFORMS', None)
        wenv['JAX_PLATFORMS'] = 'cpu'
        wenv['XLA_FLAGS'] = (wenv.get('XLA_FLAGS', '') +
                             f' --xla_force_host_platform_device_count='
                             f'{DEV_PER_PROC}').strip()
        wenv['HYBRIDQ_TPU_COORDINATOR'] = f'localhost:{port}'
        wenv['HYBRIDQ_TPU_NUM_PROCESSES'] = str(N_PROC)
        wenv['HYBRIDQ_TPU_PROCESS_ID'] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), '--worker', out,
             plan_path], env=wenv))
    for p in procs:
        if p.wait(timeout=900) != 0:
            raise RuntimeError('worker failed')

    results = []
    for out in outs:
        with open(out, 'rb') as f:
            results.append(pickle.load(f))

    # Part 1: every process saw identical, correct probabilities.
    for r in results:
        np.testing.assert_allclose(r['probs'], expected_probs, atol=1e-5)

    # Part 2: slice ranges tile [0, n_slices) and partials sum to the
    # full amplitude.
    ranges = sorted(r['slice_range'] for r in results)
    n_slices = results[0]['n_slices']
    assert ranges[0][0] == 0 and ranges[-1][1] == n_slices
    for (a, b), (c2, d) in zip(ranges, ranges[1:]):
        assert b == c2, (ranges,)
    total = sum(r['partial'] for r in results)
    assert abs(total - expected_amp) < 1e-5, (total, expected_amp)

    # Part 3: every worker's all-gather-merged Clifford dict equals the
    # single-process expansion.
    from hybridq_tpu.simulation.clifford import update_pauli_string
    cc, pauli = build_clifford_workload()
    expected_db = dict(update_pauli_string(cc, pauli, use_mpi=False,
                                           float_type='float64'))
    for r in results:
        got = r['clifford_db']
        assert set(got) == set(expected_db), (
            len(got), len(expected_db))
        for k in expected_db:
            assert abs(got[k] - expected_db[k]) < 1e-6, k

    print(json.dumps({
        'example': 'multiprocess',
        'n_processes': N_PROC,
        'global_devices': N_PROC * DEV_PER_PROC,
        'prob_check': 'ok',
        'sliced_amplitude_check': 'ok',
        'clifford_merge_check': 'ok',
        'n_pauli_strings': len(expected_db),
        'n_slices': n_slices,
    }))


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == '--worker':
        worker(sys.argv[2], sys.argv[3])
    else:
        parent()
