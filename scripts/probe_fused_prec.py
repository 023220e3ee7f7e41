"""A/B the fused-kernel dot precision on the real chip.

``precision='highest'`` runs exact-f32 (6-pass bf16) dots; ``'high'``
runs 3-pass bf16 (~f32-grade operands, ~2x fewer MXU cycles).  The
MXU-bound classes (fused k_hi >= 3, swap ke >= 3) should speed up
~2x; this probe measures every class in both modes and checks the
numerical gap on a random 24-gate pass at full n.

Usage: python scripts/probe_fused_prec.py [--n 29] [--reps 4]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=29)
    ap.add_argument('--reps', type=int, default=4)
    ap.add_argument('--gates', type=int, default=12)
    args = ap.parse_args()

    from hybridq_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from bench import _workload
    from hybridq_tpu.simulation.fused_evolver import (FusedEvolver,
                                                      calibrate_fused)

    n = args.n
    out = {}
    for prec in ('highest', 'high'):
        ev = FusedEvolver(n, precision=prec)
        t0 = time.time()
        ev.warm(verbose=True)
        print(f"# {prec}: warmed in {time.time()-t0:.0f}s",
              file=sys.stderr, flush=True)
        res = calibrate_fused(ev, reps=args.reps, verbose=True)
        out[prec] = {k.split('|', 1)[1]: v for k, v in res.items()}

    # Numerical gap: one pass of random 4q gates from |0>, sampled amps.
    rng = np.random.default_rng(0)
    gates = _workload(n, 4, args.gates, rng, min_bit=3)
    amps = {}
    for prec in ('highest', 'high'):
        ev = FusedEvolver(n, precision=prec)
        st = ev.prepare_state('0' * n)
        for i, (U, qs) in enumerate(gates):
            st = ev.apply_gate(st, U, qs, gate_key=i)
        st = ev.flush(st)
        idx = np.random.default_rng(1).choice(2**n, 16, replace=False)
        flat = 2**n
        a = {}
        for i in idx:
            i = int(i)
            r, c = divmod(i, 128)
            ri, ci = divmod(i + flat, 128)
            a[i] = complex(
                float(np.asarray(st[r:r + 1, c:c + 1])[0, 0]),
                float(np.asarray(st[ri:ri + 1, ci:ci + 1])[0, 0]))
        amps[prec] = a
        del st
    rms = 2.0 ** (-n / 2)
    gap = max(abs(amps['high'][i] - amps['highest'][i])
              for i in amps['high']) / rms
    out['amp_gap_over_rms'] = gap
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()
