"""Pallas TPU kernel: fused 16-state min-plus Viterbi (SURVEY §7.3
hard-part 3; reference trellises src/ysf_decoder/trellis.c:8-109 and
src/nxdn_decoder/trellis.cpp:29-101).

``fec.viterbi.viterbi_decode``'s XLA formulation is a ``lax.scan`` over T
trellis steps of a [16]-wide min-plus update, vmapped over frames — T
dispatch-level scan iterations of tiny ops. This kernel runs the whole
decode (forward metrics AND traceback) for a 128-frame lane tile in ONE
kernel body:

- **metrics in VREGs**: the [16, 128] path-metric block is two f32
  vector registers; every trellis step is straight-line VPU/MXU work.
- **predecessor gather as a permutation matmul**: the static predecessor
  map ``p(i, k) = ((i << 1) & 14) | k`` becomes two constant [16, 16]
  permutation matrices; ``P_k @ metrics`` runs on the MXU (0/1 matrix,
  integer-valued f32 — exact). Mosaic has no cross-sublane dynamic
  gather; this is the canonical replacement.
- **branch distances with no table lookup**: the expected dibit per
  (new_state, k) is a static [16, 1] constant; popcount of a 2-bit XOR
  is ``(x & 1) + (x >> 1)``.
- **packed traceback without gathers**: decisions for step t live in a
  [16, 128] int32 scratch row; the backward pass selects
  ``decision[state]`` per lane via a one-hot compare against a sublane
  iota and a 16-row sum — vector selects, no scalar-core gather.
- **NXDN blocked start states** (trellis.cpp:34,56-57,84-85): the first
  ``blocked_steps`` (= 4) steps are peeled out of the ``fori_loop`` as
  static-slice steps that add a per-step +BIG bias to the k=1 candidate
  of blocked states — the rotating mask is data-independent, so it bakes
  into a [16, 4*128] bias input (kernel constants must be inputs, not
  closures, on Mosaic).

Tie-breaking matches the reference exactly: strict ``cand1 < cand0``
(k=0 wins equal metrics); the final state selection takes the
lowest-numbered state among the minima (min over a masked iota).
All arithmetic is exact (integer-valued f32 well inside 2**24), so the
kernel is bit-identical to the XLA scan — asserted in interpret mode by
tests/test_viterbi_pallas.py and on hardware by tools/tpu_smoke.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
BIG = np.float32(1 << 28)


@functools.lru_cache(maxsize=None)
def _constants(num_states: int, blocked_steps: int):
    """Static kernel inputs: permutation matmuls, expected dibits, and
    the blocked-start-state bias rows."""
    from ..fec.viterbi import TRANSITIONS_16, _branch_tables

    assert num_states == 16, "pallas kernel supports the 16-state codes"
    prev, exp = _branch_tables(num_states, TRANSITIONS_16)
    p_mats = []
    e_rows = []
    for k in range(2):
        P = np.zeros((num_states, num_states), np.float32)
        P[np.arange(num_states), prev[:, k]] = 1.0
        p_mats.append(P)
        e_rows.append(np.broadcast_to(
            exp[:, k:k + 1].astype(np.int32), (num_states, LANES)).copy())
    # per-peeled-step k=1 bias: +BIG on states blocked at step t
    # (fec.viterbi builds the same rotating mask for the scan path)
    n_peel = max(blocked_steps, 1)  # keep a nonzero input shape
    bias = np.zeros((num_states, n_peel * LANES), np.float32)
    blocked = num_states - 1
    for t in range(blocked_steps):
        mask = (np.arange(num_states) & blocked) != 0
        bias[mask, t * LANES:(t + 1) * LANES] = BIG
        blocked = (blocked << 1) & (num_states - 1)
    return p_mats[0], p_mats[1], e_rows[0], e_rows[1], bias


def _make_kernel(T: int, num_states: int, blocked_steps: int):
    # a sequence shorter than the peel count peels only T steps (the
    # XLA scan's min(blocked_steps, T) contract — OOB otherwise)
    blocked_steps = min(blocked_steps, T)
    from jax.experimental import pallas as pl

    S = num_states
    bits_shift = S.bit_length() - 2  # 3 for 16 states: out bit = i >> 3

    def kernel(obs_ref, p0_ref, p1_ref, e0_ref, e1_ref, bias_ref,
               bits_ref, metric_ref, dec_ref):
        p0 = p0_ref[...]
        p1 = p1_ref[...]
        e0 = e0_ref[...]
        e1 = e1_ref[...]

        def trellis_step(ob, m, k1_bias):
            # ob [1, LANES] int32; m [S, LANES] f32
            x0 = ob ^ e0
            x1 = ob ^ e1
            d0 = ((x0 & 1) + (x0 >> 1)).astype(jnp.float32)
            d1 = ((x1 & 1) + (x1 >> 1)).astype(jnp.float32)
            cand0 = jax.lax.dot(p0, m,
                                preferred_element_type=jnp.float32) + d0
            cand1 = jax.lax.dot(p1, m,
                                preferred_element_type=jnp.float32) + d1
            if k1_bias is not None:
                cand1 = cand1 + k1_bias
            take1 = cand1 < cand0  # strict: k=0 wins ties (reference)
            return jnp.where(take1, cand1, cand0), take1

        m = jnp.zeros((S, LANES), jnp.float32)
        # peeled blocked-start steps: static obs/bias slices
        for t in range(blocked_steps):
            ob = obs_ref[t, :][None, :]
            m, take1 = trellis_step(
                ob, m, bias_ref[:, t * LANES:(t + 1) * LANES])
            dec_ref[t, :, :] = take1.astype(jnp.int32)

        def fwd(t, m):
            ob = obs_ref[t, :][None, :]
            m, take1 = trellis_step(ob, m, None)
            dec_ref[t, :, :] = take1.astype(jnp.int32)
            return m

        m = jax.lax.fori_loop(blocked_steps, T, fwd, m)

        # lowest-numbered minimal final state (reference argmin order)
        mmin = jnp.min(m, axis=0, keepdims=True)
        iota = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 0)
        state = jnp.min(jnp.where(m == mmin, iota, S), axis=0,
                        keepdims=True)
        metric_ref[...] = mmin.astype(jnp.int32)

        def bwd(i, state):
            t = T - 1 - i
            dec_t = dec_ref[t, :, :]
            onehot = (iota == state).astype(jnp.int32)
            k = jnp.sum(dec_t * onehot, axis=0, keepdims=True)
            bits_ref[t, :] = (state >> bits_shift)[0, :]
            return ((state << 1) & (S - 2)) | k

        jax.lax.fori_loop(0, T, bwd, state)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("num_states", "blocked_steps",
                                    "interpret"))
def viterbi_decode_pallas(observed: jnp.ndarray, num_states: int = 16,
                          blocked_steps: int = 0,
                          interpret: bool = False):
    """Drop-in twin of ``fec.viterbi.viterbi_decode`` (16-state codes).

    observed: [..., T] int dibits. Returns (bits [..., T] int32,
    metric [...] int32), bit-identical to the XLA scan path.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..fec.viterbi import _check_blocked_steps

    _check_blocked_steps(num_states, blocked_steps)
    obs = observed.astype(jnp.int32)
    batch_shape = obs.shape[:-1]
    T = obs.shape[-1]
    flat = obs.reshape((-1, T))
    B = flat.shape[0]
    Bp = -(-B // LANES) * LANES
    if Bp != B:
        flat = jnp.pad(flat, ((0, Bp - B), (0, 0)))
    obs_t = flat.T  # [T, Bp]

    p0, p1, e0, e1, bias = _constants(num_states, blocked_steps)
    kernel = _make_kernel(T, num_states, blocked_steps)
    n_peel = bias.shape[1] // LANES

    bits_t, metric = pl.pallas_call(
        kernel,
        grid=(Bp // LANES,),
        in_specs=[
            pl.BlockSpec((T, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_states, num_states), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_states, num_states), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_states, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_states, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_states, n_peel * LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((T, num_states, LANES), jnp.int32)],
        interpret=interpret,
    )(obs_t, jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(e0),
      jnp.asarray(e1), jnp.asarray(bias))

    bits = bits_t.T[:B].reshape(batch_shape + (T,))
    met = metric[0, :B].reshape(batch_shape)
    return bits, met
