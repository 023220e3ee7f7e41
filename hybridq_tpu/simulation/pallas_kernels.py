"""Fused Pallas gate-application kernel (single pass over HBM).

The XLA indexed engine moves the state ~5 times per gate (gather in,
contract, gather out, for re and im).  This kernel is the speed-of-light
version — the TPU analog of the reference C++ hot loop
(``include/U.h:123-202``):

  * grid over row groups; each step DMAs the scattered state rows of its
    groups into VMEM (row addresses computed in-kernel from *runtime*
    gate positions — scalar prefetch, zero recompiles per position),
    contracts them against the gate matrix on the MXU, and DMAs the
    results back to the *same* rows.  The state never changes layout and
    each amplitude crosses HBM exactly twice (read + write);
  * **run-length coalescing**: consecutive groups differ only in index
    bits below the lowest gate bit p0, so their rows are contiguous —
    each DMA moves a run of ``RL = min(2^p0, cap)`` rows at once,
    dividing the DMA count (the latency bottleneck) by RL;
  * the gate matrix is Kronecker-expanded host-side to ``U ⊗ I(8·RL)``
    so each group-run contraction is one plain MXU matmul — no Mosaic
    shape casts;
  * in-place via ``input_output_aliases`` — no second state allocation.

Restriction: gate bits must lie in the row index (position ≥ L, L ≥ 10
so a state row is a whole (8, 128) f32 tile).  The evolver schedules
around this (``hybridq_tpu.simulation.kernels`` routes low/mixed gates
through the XLA path).
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ['apply_gate_rows', 'ROWS_PER_STEP']

ROWS_PER_STEP = 64        # only used when RL == 1 (p0 == 0)
_MAX_BLOCK_SUBLANES = 512  # 2^k * RL * 8 <= this (bounds Ukron at 1-4MB)

_CACHE: dict = {}


def _kernel(spos_ref, offs_ref, re_hbm, im_hbm, ur_ref, ui_ref,
            re_out, im_out, sre, sim, ore, oim, sems, *, k, RL,
            groups_per_step, C):
    """One grid step: gather ``groups_per_step`` runs of RL groups,
    apply the gate, scatter back to the same rows."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = 2**k
    s = pl.program_id(0)

    def run_start(t):
        # First group of the t-th run handled by this step; its base row
        # via bit expansion around the (sorted, runtime) gate positions.
        rg = (s * groups_per_step + t) * RL
        base = rg
        for b in range(k):
            p = spos_ref[b]
            low = base & ((1 << p) - 1)
            base = ((base >> p) << (p + 1)) | low
        return base

    n_copies = groups_per_step * G

    # Hoist the scalar address arithmetic: compute every run's start row
    # once (the scalar core is slow; recomputing per start/wait was a
    # real per-step cost).
    starts = [run_start(t) for t in range(groups_per_step)]
    rows = [(starts[t] + offs_ref[j]) * 8
            for t in range(groups_per_step) for j in range(G)]

    def copies(i):
        # Rows [base + offs[j], +RL) are contiguous (RL <= 2^p0).
        r0 = rows[i]
        dst = pl.ds(i * RL * 8, RL * 8)
        return (
            pltpu.make_async_copy(re_hbm.at[pl.ds(r0, RL * 8), :],
                                  sre.at[dst, :], sems.at[i]),
            pltpu.make_async_copy(im_hbm.at[pl.ds(r0, RL * 8), :],
                                  sim.at[dst, :], sems.at[n_copies + i]),
        )

    for i in range(n_copies):
        for dma in copies(i):
            dma.start()
    for i in range(n_copies):
        for dma in copies(i):
            dma.wait()

    # One MXU matmul per run: [8·RL·G, 8·RL·G] (U ⊗ I) times the run
    # block [8·RL·G, C/8].
    ur = ur_ref[:]
    ui = ui_ref[:]
    B = 8 * RL * G
    for t in range(groups_per_step):
        a_re = sre[pl.ds(t * B, B), :]
        a_im = sim[pl.ds(t * B, B), :]
        rr = jnp.dot(ur, a_re, preferred_element_type=jnp.float32)
        ii = jnp.dot(ui, a_im, preferred_element_type=jnp.float32)
        ri = jnp.dot(ur, a_im, preferred_element_type=jnp.float32)
        ir = jnp.dot(ui, a_re, preferred_element_type=jnp.float32)
        ore[pl.ds(t * B, B), :] = rr - ii
        oim[pl.ds(t * B, B), :] = ri + ir

    def out_copies(i):
        r0 = rows[i]
        src = pl.ds(i * RL * 8, RL * 8)
        return (
            pltpu.make_async_copy(ore.at[src, :],
                                  re_out.at[pl.ds(r0, RL * 8), :],
                                  sems.at[i]),
            pltpu.make_async_copy(oim.at[src, :],
                                  im_out.at[pl.ds(r0, RL * 8), :],
                                  sems.at[n_copies + i]),
        )

    for i in range(n_copies):
        for dma in out_copies(i):
            dma.start()
    for i in range(n_copies):
        for dma in out_copies(i):
            dma.wait()


def _build(n: int, k: int, L: int, RL: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() != 'tpu'

    R = 2**(n - L)
    C = 2**L
    G = 2**k
    rows_per_step = max(G * RL, min(ROWS_PER_STEP, R))
    groups_per_step = rows_per_step // (G * RL)
    rows_per_step = groups_per_step * G * RL
    n_steps = R // rows_per_step
    n_scratch_sublanes = rows_per_step * 8

    kern = functools.partial(_kernel, k=k, RL=RL,
                             groups_per_step=groups_per_step, C=C)

    fn = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # sorted positions, row offsets
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),      # re (HBM)
                pl.BlockSpec(memory_space=pl.ANY),      # im (HBM)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # Ur ⊗ I
                pl.BlockSpec(memory_space=pltpu.VMEM),  # Ui ⊗ I
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((n_scratch_sublanes, C // 8), jnp.float32),
                pltpu.VMEM((n_scratch_sublanes, C // 8), jnp.float32),
                pltpu.VMEM((n_scratch_sublanes, C // 8), jnp.float32),
                pltpu.VMEM((n_scratch_sublanes, C // 8), jnp.float32),
                pltpu.SemaphoreType.DMA((2 * groups_per_step * G,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((R * 8, C // 8), jnp.float32),
            jax.ShapeDtypeStruct((R * 8, C // 8), jnp.float32),
        ],
        input_output_aliases={2: 0, 3: 1},  # re/im in-place
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    def wrapper(pos, offs, re, im, ur, ui):
        # Kron-expand the (tiny, cheap-to-upload) gate matrix on device,
        # and keep the flat<->tiled reshapes inside the jit (free
        # bitcasts, not eager copies).
        eye = jnp.eye(8 * RL, dtype=jnp.float32)
        ur_k = jnp.kron(ur, eye)
        ui_k = jnp.kron(ui, eye)
        o_re, o_im = fn(pos, offs,
                        jnp.reshape(re, (R * 8, C // 8)),
                        jnp.reshape(im, (R * 8, C // 8)), ur_k, ui_k)
        return jnp.reshape(o_re, (-1,)), jnp.reshape(o_im, (-1,))

    return jax.jit(wrapper, donate_argnums=(2, 3))


def _run_length(k: int, row_positions) -> int:
    p0 = min(row_positions)
    cap = _MAX_BLOCK_SUBLANES // (8 * 2**k)
    return int(min(2**p0, max(1, cap)))


def apply_gate_rows(re, im, Ur, Ui, row_positions, n: int, L: int):
    """Apply a k-qubit gate whose bits all live in the row index.

    ``row_positions``: bit positions within the row index (0 = row LSB),
    gate MSB first.  ``re``/``im``: flat (2^n,) device arrays (donated).
    """
    import jax.numpy as jnp

    k = len(row_positions)
    RL = _run_length(k, row_positions)
    key = (n, k, L, RL)
    fn = _CACHE.get(key)
    if fn is None:
        fn = _build(n, k, L, RL)
        _CACHE[key] = fn

    pos = np.asarray(sorted(row_positions), dtype=np.int32)
    offs = np.zeros(2**k, dtype=np.int32)
    b = np.arange(2**k, dtype=np.int32)
    for j, p in enumerate(row_positions):
        offs |= ((b >> (k - 1 - j)) & 1) << p

    return fn(jnp.asarray(pos), jnp.asarray(offs), re, im,
              jnp.asarray(np.asarray(Ur, dtype='float32')),
              jnp.asarray(np.asarray(Ui, dtype='float32')))
