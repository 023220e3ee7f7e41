"""Correctness check of the fused Pallas kernel (interpret mode, CPU;
pass --tpu to run compiled on the chip)."""
import sys

import numpy as np

sys.path.insert(0, '/root/repo')

import jax

if '--tpu' not in sys.argv:
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402

from hybridq_tpu.simulation.pallas_fused import (  # noqa: E402
    build_w, fused_kernel, fused_meta)

INTERPRET = '--tpu' not in sys.argv


def dense_apply(psi, U, bits, n):
    """Oracle: apply U (MSB-first over ``bits``) to flat psi."""
    k = len(bits)
    perm = []
    rest = [b for b in range(n) if b not in bits]
    # index = (gate combo, rest combo) -> flat
    idx = np.arange(2 ** n, dtype=np.int64)
    g = np.zeros_like(idx)
    for a, b in enumerate(bits):
        g |= ((idx >> b) & 1) << (k - 1 - a)
    r = np.zeros_like(idx)
    for a, b in enumerate(rest):
        r |= ((idx >> b) & 1) << a
    out = np.zeros_like(psi)
    # out[i] = sum_j U[g(i), j] psi[i with gate bits replaced by j]
    base = idx & ~np.bitwise_or.reduce(
        [np.int64(1) << b for b in bits])
    for j in range(2 ** k):
        src = base.copy()
        for a, b in enumerate(bits):
            if (j >> (k - 1 - a)) & 1:
                src |= np.int64(1) << b
        out += U[g, j] * psi[src]
    return out


def run_case(n, bits, seed):
    rng = np.random.default_rng(seed)
    k = len(bits)
    m = rng.standard_normal((2 ** k, 2 ** k)) + \
        1j * rng.standard_normal((2 ** k, 2 ** k))
    U, _ = np.linalg.qr(m)
    psi = rng.standard_normal(2 ** n) + 1j * rng.standard_normal(2 ** n)
    psi /= np.linalg.norm(psi)

    want = dense_apply(psi, U, list(bits), n)

    k_hi, h_offs, rest_mask, _, _ = fused_meta(n, bits)
    W, h_offs, rest_mask = build_w(n, U, bits)
    st = np.concatenate([psi.real, psi.imag]).astype('float32')
    st = st.reshape(2 ** (n + 1 - 7), 128)
    fn = fused_kernel(n, k_hi, interpret=INTERPRET)
    out = fn(jnp.asarray(st), jnp.asarray(W),
             jnp.asarray(h_offs, dtype=jnp.int32),
             jnp.asarray([rest_mask], dtype=jnp.int32))
    out = np.asarray(out).reshape(-1)
    got = out[:2 ** n] + 1j * out[2 ** n:]
    err = np.max(np.abs(got - want))
    print(f"n={n} bits={bits} k_hi={k_hi}: err={err:.2e}", flush=True)
    assert err < 5e-6, err


def run_swap_case(n, bits, victims, seed):
    from hybridq_tpu.simulation.pallas_fused import (build_w_swap,
                                                     swap_kernel,
                                                     swap_meta)

    rng = np.random.default_rng(seed)
    k = len(bits)
    m = rng.standard_normal((2 ** k, 2 ** k)) + \
        1j * rng.standard_normal((2 ** k, 2 ** k))
    U, _ = np.linalg.qr(m)
    psi = rng.standard_normal(2 ** n) + 1j * rng.standard_normal(2 ** n)
    psi /= np.linalg.norm(psi)

    # Oracle: the kernel output layout has lane bits a_j and victims
    # v_j exchanged — i.e. it equals SWAP(gate(psi)) where SWAP
    # permutes the flat index bits.
    want = dense_apply(psi, U, list(bits), n)
    lane = sorted((b for b in bits if b < 7), reverse=True)
    idx = np.arange(2 ** n, dtype=np.int64)
    src = idx.copy()
    for a, v in zip(lane, victims):
        ba = (idx >> a) & 1
        bv = (idx >> v) & 1
        src = (src & ~((1 << a) | (1 << v))) | (bv << a) | (ba << v)
    want = want[src]

    k_hi, k_l, h_offs, rest_mask, Ms = swap_meta(n, bits, victims)
    W = build_w_swap(n, U, bits, victims)
    st = np.concatenate([psi.real, psi.imag]).astype('float32')
    st = st.reshape(2 ** (n + 1 - 7), 128)
    fn = swap_kernel(n, k_hi + k_l, k_l, interpret=INTERPRET)
    out = fn(jnp.asarray(st), jnp.asarray(W), jnp.asarray(Ms),
             jnp.asarray(h_offs, dtype=jnp.int32),
             jnp.asarray([rest_mask], dtype=jnp.int32))
    out = np.asarray(out).reshape(-1)
    got = out[:2 ** n] + 1j * out[2 ** n:]
    err = np.max(np.abs(got - want))
    print(f"swap n={n} bits={bits} victims={victims}: err={err:.2e}",
          flush=True)
    assert err < 5e-6, err


def run_factored_case(n, row_bits, lane_bits, seed):
    from hybridq_tpu.simulation.pallas_fused import (build_w_factored,
                                                     factored_kernel,
                                                     fused_meta)

    rng = np.random.default_rng(seed)
    kr, kl = len(row_bits), len(lane_bits)

    def rand_u(k):
        m = rng.standard_normal((2 ** k, 2 ** k)) + \
            1j * rng.standard_normal((2 ** k, 2 ** k))
        q, _ = np.linalg.qr(m)
        return q

    Ur = rand_u(kr) if kr else np.ones((1, 1), dtype=complex)
    Ul = rand_u(kl)
    psi = rng.standard_normal(2 ** n) + 1j * rng.standard_normal(2 ** n)
    psi /= np.linalg.norm(psi)
    U = np.kron(Ur, Ul)
    want = dense_apply(psi, U, list(row_bits) + list(lane_bits), n)

    k_hi = fused_meta(n, row_bits)[0] if kr else 0
    W, Br, Bi, h_offs, rest_mask = build_w_factored(
        n, Ur, row_bits, Ul, lane_bits)
    st = np.concatenate([psi.real, psi.imag]).astype('float32')
    st = st.reshape(2 ** (n + 1 - 7), 128)
    fn = factored_kernel(n, k_hi, interpret=INTERPRET)
    out = fn(jnp.asarray(st), jnp.asarray(W), jnp.asarray(Br),
             jnp.asarray(Bi), jnp.asarray(h_offs, dtype=jnp.int32),
             jnp.asarray([rest_mask], dtype=jnp.int32))
    out = np.asarray(out).reshape(-1)
    got = out[:2 ** n] + 1j * out[2 ** n:]
    err = np.max(np.abs(got - want))
    print(f"fact n={n} row={row_bits} lane={lane_bits}: err={err:.2e}",
          flush=True)
    assert err < 5e-6, err


if __name__ == '__main__':
    # n=14: run bits = 14+1-12 = 3 (2 rest-ish); high bits 12,13
    run_case(14, (13, 12), 0)         # pure high
    run_case(14, (13, 8), 1)          # high + sublane
    run_case(14, (11, 10, 9), 2)      # pure sublane
    run_case(14, (13, 12, 11, 7), 3)  # k_hi=2 mixed
    run_case(16, (15, 13, 9), 4)
    run_case(16, (15, 14, 13, 12), 5)  # k_hi=4
    run_case(16, (9, 15, 13), 13)      # UNSORTED gate order (3-cycle)
    run_case(14, (8, 13, 10), 14)      # unsorted, mixed ranges
    # swap path: lane bits exchanged with victim high bits
    run_swap_case(16, (5, 9), (14,), 6)            # 1 lane bit
    run_swap_case(16, (15, 3, 8), (13,), 7)        # hi+lane+sub
    run_swap_case(16, (6, 2, 10), (15, 13), 8)     # 2 lane bits
    run_swap_case(17, (16, 6, 1), (14, 12), 9)     # 2 lanes + hi
    # factored path: U_row (x) U_lane
    run_swap_case(16, (15, 14, 3), (13,), 30)      # k_hi=2 3-cycle
    run_swap_case(16, (15, 6, 1), (14, 13), 22)    # k_hi=1, k_l=2
    run_factored_case(16, (15, 9), (4, 2), 10)
    run_factored_case(16, (), (6, 3, 0), 11)       # pure lane
    run_factored_case(16, (14, 13), (5,), 12)
    run_factored_case(16, (9, 15), (2, 4), 15)     # unsorted both
    print("OK", flush=True)
