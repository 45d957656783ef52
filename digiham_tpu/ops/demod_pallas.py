"""Pallas TPU kernel: the fused century demodulator.

Replaces ``dsp.demod._demod_block_single``'s XLA scan (per-century
dynamic_slice + [100, sps] reshapes — small-tile ops with ~8% lane
utilization and a scalar-core gather for the per-channel window) with a
single kernel per channel tile:

- the whole [TILE, L] sample row block lives in VMEM; per-century the
  kernel takes ONE 128-aligned static slice and aligns each channel's
  window with a log-stage shifter (conditional static lane-rotations —
  Mosaic rejects dynamic lane offsets, so the dynamic per-channel read
  position becomes ~9 vectorized select stages instead);
- every per-symbol statistic (volume sum, mid-third sum, per-column
  timing sums) is ONE selection matmul on the MXU:
  ``window[TILE, 100*sps] @ SEL[100*sps, 100|sps]`` — the [100, sps]
  reshape never materializes;
- the AGC's 100-wide sliding min/max uses the same two-block
  cumulative-extrema trick as the XLA path, with the cumulative scans
  as log2 shifted-max steps (max/min are exact, so this is bit-identical
  to any other association);
- the ±1 timing slew is the same three-shifted-views select as the XLA
  path (dsp/demod.py _century), so symbol windows are identical.

Semantics follow src/fsk_demodulator/fsk_demodulator.cpp:25-111 /
gfsk_demodulator.cpp:24-122 via the block redesign documented in
dsp/demod.py. Float summation ORDER differs from the XLA reductions
(MXU tree accumulation) — inside the established f32 envelope; decision
outputs (dibits) are bit-identical to the XLA path in interpret-mode
tests, and on real TPU hardware measured at ~0.04% isolated knife-edge
slicer flips plus ~1% of timing updates resolving a flat variance-valley
tie to the other (equally valid) +-1 slew — the same precision class as
the documented RRC f32 envelope (docs/BER_PARITY.md), with no effect on
SER/frame-success statistics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.demod import (CENTURY, FLT_MIN, VMIN_GUARD, DemodState,
                         _eval_bounds)


def _selection_matrices(sps: int):
    """Static 0/1 f32 matrices turning a flat [100*sps] century window
    into per-symbol statistics on the MXU."""
    n = CENTURY * sps
    t = np.arange(n)
    lo, hi = _eval_bounds(sps)
    sym = t // sps
    off = t % sps
    sel_vol = (sym[:, None] == np.arange(CENTURY)[None, :]).astype(
        np.float32)
    sel_mid = (sel_vol * ((off >= lo) & (off < hi))[:, None]).astype(
        np.float32)
    p_col = (off[:, None] == np.arange(sps)[None, :]).astype(np.float32)
    return sel_vol, sel_mid, p_col


def _cummax_lanes(x, reverse=False):
    """Inclusive cumulative max along the last axis via log-steps of
    static shifted maxes (exact — max is associative)."""
    n = x.shape[-1]
    sh = 1
    while sh < n:
        if reverse:
            shifted = jnp.concatenate(
                [x[..., sh:], jnp.full_like(x[..., :sh], -np.inf)], -1)
        else:
            shifted = jnp.concatenate(
                [jnp.full_like(x[..., :sh], -np.inf), x[..., :-sh]], -1)
        x = jnp.maximum(x, shifted)
        sh *= 2
    return x


def _cummin_lanes(x, reverse=False):
    return -_cummax_lanes(-x, reverse=reverse)


def _sliding_minmax_100_k(ring, vol):
    """Pallas twin of dsp.demod._sliding_minmax_100 over the lane axis.

    ring, vol: [TILE, 100]. Window i spans concat[i+1 : i+101]."""
    suf_max = _cummax_lanes(ring, reverse=True)
    suf_min = _cummin_lanes(ring, reverse=True)
    pre_max = _cummax_lanes(vol)
    pre_min = _cummin_lanes(vol)
    left_max = jnp.concatenate([suf_max[:, 1:], suf_max[:, -1:]], -1)
    left_min = jnp.concatenate([suf_min[:, 1:], suf_min[:, -1:]], -1)
    use_left = (jax.lax.broadcasted_iota(jnp.int32, ring.shape, 1) < 99)
    wmax = jnp.where(use_left, jnp.maximum(left_max, pre_max), pre_max)
    wmin = jnp.where(use_left, jnp.minimum(left_min, pre_min), pre_min)
    return wmin, wmax


SH_BOUND = 512  # max supported (pos - aligned century base); see wrapper


def _make_kernel(n_centuries: int, sps: int, tile: int, mode: str,
                 invert: bool, load: int, ablate: tuple = ()):
    """ablate (PERF DIAGNOSTIC ONLY — wrong results): "shift" skips the
    alignment shifter, "timing" skips the variance matmuls, "agc" uses
    fixed thresholds. Used by tools/bench_demod_pallas.py to attribute
    kernel time; never set by production dispatch."""
    from jax.experimental.pallas import tpu as pltpu

    lo, hi = _eval_bounds(sps)
    n = CENTURY * sps
    span = n + 1
    n_stages = max(1, (SH_BOUND + 128 - 1).bit_length())

    def kernel(sel_vol_ref, sel_mid_ref, p_col_ref,
               y_ref, pos_ref, off_ref, ring_ref,
               dib_ref, pos_out, off_out, ring_out):
        sel_vol = sel_vol_ref[:, :]
        sel_mid = sel_mid_ref[:, :]
        p_col = p_col_ref[:, :]
        ring = ring_ref[:, :]
        offset = off_ref[:, 0]          # [TILE] int32
        pos = pos_ref[:, 0]             # [TILE] int32

        for c in range(n_centuries):
            # one aligned static window per century; per-channel alignment
            # to pos[ch] via the log-stage shifter (left-rotate by bit k of
            # the shift where set — static rolls + per-row selects only)
            start_c = max(0, (c * n // 128) * 128 - 128)
            W = y_ref[:, start_c:start_c + load]
            sh = pos - start_c          # [TILE] >= 0, < SH_BOUND + 128
            if "shift" not in ablate:
                for k in range(n_stages):
                    amt = 1 << k
                    rolled = pltpu.roll(W, load - amt, axis=1)
                    W = jnp.where(((sh & amt) != 0)[:, None], rolled, W)
            # W[:, t] == samples[ch, pos[ch] + t] for t < span
            # three shifted views (pending +-1 slew), row 0 unshifted
            v0 = W[:, 0:n]
            vp = pltpu.roll(W, load - 1, axis=1)[:, 0:n]
            # right-rotate wraps garbage into lane 0 — masked by first_sym
            vm = pltpu.roll(W, 1, axis=1)[:, 0:n]
            offc = offset[:, None]
            shifted = jnp.where(offc == 1, vp,
                                jnp.where(offc == -1, vm, v0))
            first_sym = (jax.lax.broadcasted_iota(
                jnp.int32, (tile, n), 1) < sps)
            sym_flat = jnp.where(first_sym, v0, shifted)

            vol_avg = jnp.dot(sym_flat, sel_vol,
                              preferred_element_type=jnp.float32) / sps
            mid_avg = jnp.dot(sym_flat, sel_mid,
                              preferred_element_type=jnp.float32) / (hi - lo)

            # AGC thresholds from the 100-symbol sliding volume window
            if "agc" in ablate:
                vmin_l = jnp.full_like(vol_avg, -1.0)
                wmax = jnp.ones_like(vol_avg)
            else:
                vmin_l, wmax = _sliding_minmax_100_k(ring, vol_avg)
            vmax = jnp.maximum(wmax, FLT_MIN)
            center = (vmax + vmin_l) / 2

            if mode == "gfsk":
                umid = (vmax - center) * 0.625 + center
                lmid = (vmin_l - center) * 0.625 + center
                dib = jnp.where(
                    mid_avg > center,
                    jnp.where(mid_avg > umid, 1, 0),
                    jnp.where(mid_avg < lmid, 3, 2),
                ).astype(jnp.int32)
            else:
                one = 0 if invert else 1
                dib = jnp.where(mid_avg > center, one, 1 - one).astype(
                    jnp.int32)
            # 128-aligned per-century store block (lanes 100..127 unused)
            dib_ref[:, c * 128:c * 128 + CENTURY] = dib

            # timing: per-column variance of the century window
            if "timing" in ablate:
                new_offset = jnp.zeros((tile,), jnp.int32)
            else:
                col_sums = jnp.dot(sym_flat, p_col,
                                   preferred_element_type=jnp.float32)
                col_mean = col_sums / CENTURY
                mean_flat = jnp.dot(col_mean, p_col.T,
                                    preferred_element_type=jnp.float32)
                d = mean_flat - sym_flat
                var = jnp.dot(d * d, p_col,
                              preferred_element_type=jnp.float32) / CENTURY
                vmin = jnp.min(var, axis=-1)
                vmin_pos = jnp.argmin(var, axis=-1).astype(jnp.int32)
                guard_ok = (vmin > 0) & (vmin <= VMIN_GUARD)
                step_left = (vmin_pos > 0) & (vmin_pos < sps // 2)
                step_right = (vmin_pos >= sps // 2) & (vmin_pos < sps - 1)
                new_offset = jnp.where(
                    guard_ok,
                    jnp.where(step_left, 1, jnp.where(step_right, -1, 0)),
                    0).astype(jnp.int32)

            pos = pos + n + offset
            offset = new_offset
            ring = vol_avg

        pos_out[:, 0] = pos
        off_out[:, 0] = offset
        ring_out[:, :] = ring

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_centuries", "sps", "mode",
                                    "invert", "tile", "interpret",
                                    "ablate"))
def pallas_demod_block(samples: jnp.ndarray, state: DemodState,
                       n_centuries: int, sps: int = 10,
                       mode: str = "gfsk", invert: bool = False,
                       tile: int = 8, interpret: bool = False,
                       ablate: tuple = ()):
    """Drop-in twin of dsp.demod.gfsk_demod_block / fsk_demod_block.

    samples: [C, L] float32, L >= max(pos) + n_centuries*(100*sps+1)+1.
    Requires pos[ch] - 128*floor(c*100*sps/128) < SH_BOUND + 128 for every
    century c a channel reads — i.e. the block-relative start position plus
    cumulative slew stays under ~SH_BOUND (streaming drivers rebase pos to
    < 2*sps, far inside the bound).
    Returns (symbols [C, n_centuries*100] uint8, new DemodState).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, L = samples.shape
    assert C % tile == 0, (C, tile)
    span = CENTURY * sps + 1
    n = CENTURY * sps
    load = -(-(span + SH_BOUND + 128) // 128) * 128
    # right-pad so every century's aligned [start_c, start_c + load) read
    # stays in bounds
    last_start = max(0, ((n_centuries - 1) * n // 128) * 128 - 128)
    L_pad = max(L, last_start + load)
    L_pad = -(-L_pad // 128) * 128
    if L_pad != L:
        samples = jnp.pad(samples, ((0, 0), (0, L_pad - L)))
    grid = (C // tile,)
    kernel = _make_kernel(n_centuries, sps, tile, mode, invert, load,
                          ablate)
    sel_vol, sel_mid, p_col = _selection_matrices(sps)

    dib, pos, off, ring = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, CENTURY), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, CENTURY), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, sps), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, L_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, CENTURY), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, n_centuries * 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, CENTURY), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, n_centuries * 128), jnp.int32),
            jax.ShapeDtypeStruct((C, 1), jnp.int32),
            jax.ShapeDtypeStruct((C, 1), jnp.int32),
            jax.ShapeDtypeStruct((C, CENTURY), jnp.float32),
        ),
        interpret=interpret,
    )(jnp.asarray(sel_vol), jnp.asarray(sel_mid), jnp.asarray(p_col),
      samples, state.pos[:, None], state.offset[:, None],
      state.volume_ring)
    dib = dib.reshape(C, n_centuries, 128)[:, :, :CENTURY].reshape(C, -1)
    return dib.astype(jnp.uint8), DemodState(pos[:, 0], off[:, 0], ring)
