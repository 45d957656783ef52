"""Pallas TPU kernel: the fused century demodulator.

Replaces ``dsp.demod._demod_block_single``'s XLA scan (per-century
dynamic_slice + [100, sps] reshapes — small-tile ops with ~8% lane
utilization and a scalar-core gather for the per-channel window) with a
single kernel per channel tile:

- the whole [TILE, L] sample row block lives in VMEM; per-century the
  kernel takes ONE 128-aligned static slice and aligns each channel's
  window with a log-stage shifter (conditional static lane-rotations —
  Mosaic rejects dynamic lane offsets, so the dynamic per-channel read
  position becomes 8 vectorized select stages instead: per-century
  start floors fold the worst-case backward slew into the static base,
  and the sps-aware pos guard keeps the total bound under 256);
- every per-symbol statistic (volume sum, mid-third sum, per-column
  timing sums) is ONE selection matmul on the MXU:
  ``window[TILE, 100*sps] @ SEL[100*sps, 100|sps]`` — the [100, sps]
  reshape never materializes;
- the AGC's 100-wide sliding min/max and the symbol slicer run ONCE for
  the whole block after the century loop (they do not feed the serial
  pos/offset chain): per-century volume averages concatenate into one
  [TILE, (n_centuries+1)*100] sequence and two segmented prefix/suffix
  extrema scans (log2 masked shifted-max steps — exact, min/max
  associative) yield every window at once. Batching this out of the
  loop measured ~3x on the whole kernel (the per-century version was
  ~450 tiny VPU ops of pure issue overhead);
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


# lane offsets of the three sections in the merged selection matrix:
# [0,100) volume, [128,228) mid-third, [256,256+sps) timing columns —
# every section starts on a 128-lane boundary so in-kernel slices are
# aligned; sps <= 128 keeps the timing section inside one lane tile
SEL_MID_OFF = 128
SEL_COL_OFF = 256
SEL_W = 384


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


def _merged_selection(sps: int) -> np.ndarray:
    """The three selection matrices packed side by side into one
    [n, 384] operand (sections 128-lane aligned, zero-padded): the three
    per-century statistics dots sharing the same LHS become ONE MXU
    matmul (ROADMAP round-3 lever (a)). Bitwise identical: each output
    column's K-accumulation is unchanged, and VMEM cost is identical
    too (the separate matrices padded to 128 lanes each anyway)."""
    assert sps <= 128, sps
    sel_vol, sel_mid, p_col = _selection_matrices(sps)
    n = sel_vol.shape[0]
    merged = np.zeros((n, SEL_W), np.float32)
    merged[:, :CENTURY] = sel_vol
    merged[:, SEL_MID_OFF:SEL_MID_OFF + CENTURY] = sel_mid
    merged[:, SEL_COL_OFF:SEL_COL_OFF + sps] = p_col
    return merged


POS_GUARD = 128  # absolute cap on pos_guard(sps) (back-compat export)


def pos_guard(sps: int) -> int:
    """Hot-path bound on the block-relative start position: the dispatch
    rebases rows with pos >= this (cold branch). Streaming drivers rebase
    pos below ~2*sps each block and the time-sharded step enters at
    pos < 2*drift_budget (default 2*24 = 48 — covered by the floor of
    56 below; a raised drift_budget > 28 falls to the correct-but-slow
    rebase branch), so an sps-aware guard keeps both hot while shaving
    a log-shifter stage: a tighter guard pulls the total shift bound
    under 256 (8 stages instead of 9)."""
    for g in (64, 96, 128):
        if g >= max(2 * sps, 48) + 8:
            return g
    return POS_GUARD


def _century_start(c: int, n: int) -> int:
    """128-aligned static base for century c's window: the lowest
    possible read position is c*n - c (pos0 >= 0, cumulative +-1 slew
    >= -c), floored to the lane-alignment boundary."""
    return max(0, ((c * n - c) // 128) * 128)


def _shift_bound(n_centuries: int, sps: int) -> int:
    """Max per-century (pos - aligned century base): the block-relative
    start position (< pos_guard(sps), wrapper-guarded) + the 128-aligned
    floor error (<= 127) + the worst spread between the slew folded into
    the base (-c) and the actual cumulative slew (+c)."""
    return pos_guard(sps) - 1 + 127 + 2 * n_centuries


def pick_tile(C: int, L: int, n_centuries: int, sps: int,
              dma: bool = False) -> int:
    """Largest channel tile that divides C and keeps one grid step's
    input row block inside a conservative VMEM budget (measured: tile=128
    at [128, 16512] f32 = 8.4 MB compiles and is the fastest at 256ch x
    16 centuries; wider selection matmuls use more MXU rows and fewer
    grid steps amortize fixed work).

    dma=True sizes for the ANY-memory kernel, where only a double-
    buffered [tile, load] century window (not the whole [tile, L] row
    block) is VMEM-resident — the restructure that lifts the tile cap
    the resident kernel needs (docs/ROADMAP.md item 3)."""
    import os
    import sys
    env = os.environ.get("DIGIHAM_DEMOD_TILE")
    if env:
        try:
            t = int(env)
        except ValueError:
            t = 0
        if t > 0 and C % t == 0:
            return t
        print(f"digiham_tpu: ignoring DIGIHAM_DEMOD_TILE={env!r} "
              f"(need a positive divisor of channels={C})",
              file=sys.stderr)
    span = CENTURY * sps + 1
    n = CENTURY * sps
    load = -(-(span + _shift_bound(n_centuries, sps)) // 128) * 128
    last_start = _century_start(n_centuries - 1, n)
    L_pad = -(-max(L, last_start + load) // 128) * 128
    # the grid-invariant merged selection matrix lives in the same
    # scoped VMEM. This estimator is HARDWARE-CALIBRATED, not truthful:
    # it uses the unpadded three-matrix size (the merged [n, 384]
    # operand occupies the same lanes the padded three always did), and
    # together with the conservative 14 MB budget it reproduces the
    # certified-good picks — tile=64 DMA at sps=40 runs (POCSAG 16.2
    # GS/s) while tile=128 OOM'd by 72 KB (round 4). Counting the full
    # padded footprint here dropped sps=20/40 tiles and cost POCSAG 2x
    # on hardware (round 4 regression, caught same session).
    # calibration is tied to the merged-matrix layout: if a section is
    # ever added to SEL_W the estimate must be re-derived on hardware
    # (this assert forces that, instead of a silent stale calibration)
    assert SEL_W == 384, "pick_tile sel_bytes calibrated for SEL_W=384"
    sel_bytes = (2 * n * CENTURY + n * sps) * 4
    budget = 14 * 2 ** 20 - sel_bytes
    if dma:
        # resident per grid step: the 2-slot DMA scratch, the batched-AGC
        # concatenations/scan temporaries (~8 live [tile, (nc+1)*100]
        # rows), and the double-buffered dibit output block
        for t in (128, 64, 32, 16, 8):
            need = (2 * t * load * 4
                    + 10 * t * (n_centuries + 1) * 128 * 4
                    + 2 * t * n_centuries * 128 * 4)
            if C % t == 0 and need <= budget:
                return t
        # nothing fits: take the SMALLEST dividing tile (least VMEM)
        return next(t for t in (8, 16, 32, 64, 128) if C % t == 0)
    # scoped VMEM is 16 MB and Mosaic double-buffers the grid-varying
    # input and output blocks; the selection matrices add ~0.9 MB.
    # Auto-pick caps at 32: tile=64/128 kernels compile standalone but
    # the remote TPU compile helper crashes on heavily-unrolled programs
    # embedding them (observed round 2), and with the batched-AGC kernel
    # the 32->64 gain is inside the dispatch-floor noise anyway; the
    # DIGIHAM_DEMOD_TILE override above remains for experiments.
    # The batched-AGC concatenations/scan temporaries (~10 live
    # [tile, (nc+1)*100] rows — same term as the dma branch) count
    # against the same scoped budget: omitting them OOM'd the resident
    # kernel at 256ch x 32 centuries on hardware (round 4,
    # "17.09M > 16.00M" at tile=32 where this estimate said 9.3M).
    for t in (32, 16, 8):
        need = (2 * t * L_pad * 4
                + 10 * t * (n_centuries + 1) * 128 * 4
                + 2 * t * n_centuries * 128 * 4)
        if C % t == 0 and need <= budget:
            return t
    # nothing fits: take the SMALLEST dividing tile (least VMEM)
    return next(t for t in (8, 16, 32) if C % t == 0)


def _make_kernel(n_centuries: int, sps: int, tile: int, mode: str,
                 invert: bool, load: int, ablate: tuple = (),
                 dma: bool = False):
    """ablate (PERF DIAGNOSTIC ONLY — wrong results): "shift" skips the
    alignment shifter, "timing" skips the variance matmuls, "agc" uses
    fixed thresholds. Used by tools/bench_demod_pallas.py to attribute
    kernel time; never set by production dispatch.

    dma=True: the sample rows stay in ANY memory (HBM on hardware) and
    each century's 128-aligned [tile, load] window is double-buffered
    into a VMEM scratch with async copies — century c+1's DMA overlaps
    century c's compute. Identical math on identical windows, so the
    outputs are bit-identical to the resident kernel. This is the
    production default (round-4 hardware A/B: fastest variant and VMEM
    footprint independent of L; a column-packed fused-stats variant was
    also A/B'd on hardware, showed no win, and was removed)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lo, hi = _eval_bounds(sps)
    n = CENTURY * sps
    span = n + 1
    bound = _shift_bound(n_centuries, sps)
    # MSB-first shifter: once every stage >= 128 has run, the residual
    # shift is < 128, so the remaining stages only need the first
    # round_up(127 + span, 128) lanes — progressive narrowing cuts the
    # low-stage roll width by ~1/3 at sps=10
    amts = [1 << k for k in reversed(range(bound.bit_length()))]
    narrow = -(-(127 + span) // 128) * 128

    n_sym = n_centuries * CENTURY
    out_w = -(-n_sym // 128) * 128
    big_w = (n_centuries + 1) * CENTURY
    pad_w = -(-big_w // 128) * 128

    def _seg_scan_minmax(x, reverse):
        """Per-CENTURY-segment inclusive cumulative min and max along
        lanes (exact — min/max associative). Segments start at lane 0;
        rolls wrap across boundaries but the segment mask discards them."""
        from jax.experimental.pallas import tpu as pltpu

        width = x.shape[-1]
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % CENTURY
        mn = mx = x
        sh = 1
        while sh < CENTURY:
            if reverse:
                sm_n = pltpu.roll(mn, width - sh, axis=1)
                sm_x = pltpu.roll(mx, width - sh, axis=1)
                keep = idx < CENTURY - sh
            else:
                sm_n = pltpu.roll(mn, sh, axis=1)
                sm_x = pltpu.roll(mx, sh, axis=1)
                keep = idx >= sh
            mn = jnp.where(keep, jnp.minimum(mn, sm_n), mn)
            mx = jnp.where(keep, jnp.maximum(mx, sm_x), mx)
            sh *= 2
        return mn, mx

    def kernel(*refs):
        (sel_ref, y_ref, pos_ref,
         off_ref, ring_ref, dib_ref, pos_out, off_out, ring_out,
         *scratch) = refs
        if dma:
            wbuf, dma_sem = scratch
            rows = pl.ds(pl.program_id(0) * tile, tile)

            def _copy(c):
                return pltpu.make_async_copy(
                    y_ref.at[rows, pl.ds(_century_start(c, n), load)],
                    wbuf.at[c % 2], dma_sem.at[c % 2])

            _copy(0).start()
        sel = sel_ref[:, :]            # [n, 384] merged selection matrix
        p_col = sel[:, SEL_COL_OFF:SEL_COL_OFF + sps]
        ring = ring_ref[:, :]
        offset = off_ref[:, 0]          # [TILE] int32
        pos = pos_ref[:, 0]             # [TILE] int32
        vols = []                       # per-century [TILE, 100] volume avgs
        mids = []                       # per-century [TILE, 100] mid-thirds

        for c in range(n_centuries):
            # one aligned static window per century; per-channel alignment
            # to pos[ch] via the log-stage shifter (left-rotate by bit k of
            # the shift where set — static rolls + per-row selects only),
            # MSB-first so the view can narrow once the residual is < 128
            start_c = _century_start(c, n)
            if dma:
                if c + 1 < n_centuries:
                    _copy(c + 1).start()
                _copy(c).wait()
                W = wbuf[c % 2]
            else:
                W = y_ref[:, start_c:start_c + load]
            sh = pos - start_c          # [TILE] >= 0, <= bound
            if "shift" not in ablate:
                for amt in amts:
                    if amt == 64:
                        W = W[:, :narrow]
                    width = W.shape[1]
                    rolled = pltpu.roll(W, width - amt, axis=1)
                    W = jnp.where(((sh & amt) != 0)[:, None], rolled, W)
            if W.shape[1] != narrow:
                W = W[:, :narrow]
            # W[:, t] == samples[ch, pos[ch] + t] for t < span
            # three shifted views (pending +-1 slew), row 0 unshifted
            v0 = W[:, 0:n]
            vp = pltpu.roll(W, narrow - 1, axis=1)[:, 0:n]
            # right-rotate wraps garbage into lane 0 — masked by first_sym
            vm = pltpu.roll(W, 1, axis=1)[:, 0:n]
            offc = offset[:, None]
            shifted = jnp.where(offc == 1, vp,
                                jnp.where(offc == -1, vm, v0))
            first_sym = (jax.lax.broadcasted_iota(
                jnp.int32, (tile, n), 1) < sps)
            sym_flat = jnp.where(first_sym, v0, shifted)

            # ONE selection matmul per century: volume sums, mid-third
            # sums and timing column sums share the LHS, so the merged
            # [n, 384] RHS computes all three in a single MXU pass
            # (identical per-column K-accumulation => bit-identical)
            stats = jnp.dot(sym_flat, sel,
                            preferred_element_type=jnp.float32)
            vol_avg = stats[:, :CENTURY] / sps
            mid_avg = stats[:, SEL_MID_OFF:SEL_MID_OFF + CENTURY] / (hi - lo)
            vols.append(vol_avg)
            mids.append(mid_avg)

            # timing: per-column variance of the century window
            if "timing" in ablate:
                new_offset = jnp.zeros((tile,), jnp.int32)
            else:
                col_sums = stats[:, SEL_COL_OFF:SEL_COL_OFF + sps]
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

        pos_out[:, 0] = pos
        off_out[:, 0] = offset
        ring_out[:, :] = vols[-1]

        # --- batched AGC + slicer over every century at once ----------
        # flat symbol t (century c, symbol i, t = c*100 + i) draws its
        # 100-wide sliding window from big = [ring | vol_0 | ... ], lanes
        # [t+1, t+101). With per-segment prefix (P) and suffix (S)
        # extrema over 100-lane segments, window start s gives
        # wmin[s] = min(S[s], P[s+99]) — exact, any association.
        mid_flat = jnp.concatenate(mids, axis=1)       # [TILE, n_sym]
        if mid_flat.shape[1] != out_w:
            mid_flat = jnp.concatenate(
                [mid_flat,
                 jnp.zeros((tile, out_w - n_sym), jnp.float32)], axis=1)
        if "agc" in ablate:
            vmin_flat = jnp.full_like(mid_flat, -1.0)
            wmax_flat = jnp.ones_like(mid_flat)
        else:
            big = jnp.concatenate([ring] + vols, axis=1)
            if big.shape[1] != pad_w:
                big = jnp.concatenate(
                    [big,
                     jnp.zeros((tile, pad_w - big_w), jnp.float32)],
                    axis=1)
            s_mn, s_mx = _seg_scan_minmax(big, reverse=True)
            p_mn, p_mx = _seg_scan_minmax(big, reverse=False)
            # lane t -> S[t+1] and P[t+100] (window start s = t+1)
            vmin_flat = jnp.minimum(
                pltpu.roll(s_mn, pad_w - 1, axis=1),
                pltpu.roll(p_mn, pad_w - CENTURY, axis=1))[:, :out_w]
            wmax_flat = jnp.maximum(
                pltpu.roll(s_mx, pad_w - 1, axis=1),
                pltpu.roll(p_mx, pad_w - CENTURY, axis=1))[:, :out_w]
        vmax = jnp.maximum(wmax_flat, FLT_MIN)
        center = (vmax + vmin_flat) / 2
        if mode == "gfsk":
            umid = (vmax - center) * 0.625 + center
            lmid = (vmin_flat - center) * 0.625 + center
            dib = jnp.where(
                mid_flat > center,
                jnp.where(mid_flat > umid, 1, 0),
                jnp.where(mid_flat < lmid, 3, 2),
            ).astype(jnp.int32)
        else:
            one = 0 if invert else 1
            dib = jnp.where(mid_flat > center, one, 1 - one).astype(
                jnp.int32)
        dib_ref[:, :] = dib

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_centuries", "sps", "mode",
                                    "invert", "tile", "interpret",
                                    "ablate", "dma"))
def pallas_demod_block(samples: jnp.ndarray, state: DemodState,
                       n_centuries: int, sps: int = 10,
                       mode: str = "gfsk", invert: bool = False,
                       tile: int = 8, interpret: bool = False,
                       ablate: tuple = (), dma: bool = False):
    """Drop-in twin of dsp.demod.gfsk_demod_block / fsk_demod_block.

    samples: [C, L] float32, L >= max(pos) + n_centuries*(100*sps+1)+1.
    Requires 0 <= pos[ch] < pos_guard(sps) (streaming drivers rebase
    pos to < 2*sps, inside the bound; the dsp.demod dispatch guards and
    rebases otherwise).
    dma=True (the production default set by dsp.demod) keeps the sample
    rows out of VMEM and double-buffers each century's aligned window in
    with async copies — bit-identical outputs, VMEM footprint
    independent of L, tiles up to 128.
    Returns (symbols [C, n_centuries*100] uint8, new DemodState).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, L = samples.shape
    assert C % tile == 0, (C, tile)
    span = CENTURY * sps + 1
    n = CENTURY * sps
    load = -(-(span + _shift_bound(n_centuries, sps)) // 128) * 128
    # right-pad so every century's aligned [start_c, start_c + load) read
    # stays in bounds
    last_start = _century_start(n_centuries - 1, n)
    L_pad = max(L, last_start + load)
    L_pad = -(-L_pad // 128) * 128
    if L_pad != L:
        samples = jnp.pad(samples, ((0, 0), (0, L_pad - L)))
    grid = (C // tile,)
    kernel = _make_kernel(n_centuries, sps, tile, mode, invert, load,
                          ablate, dma)
    sel_inputs = [jnp.asarray(_merged_selection(sps))]
    sel_specs = [
        pl.BlockSpec((n, SEL_W), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_w = -(-(n_centuries * CENTURY) // 128) * 128

    if dma:
        y_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch_shapes = [
            pltpu.VMEM((2, tile, load), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        y_spec = pl.BlockSpec((tile, L_pad), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        scratch_shapes = []

    dib, pos, off, ring = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=sel_specs + [
            y_spec,
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, CENTURY), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, out_w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, CENTURY), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, out_w), jnp.int32),
            jax.ShapeDtypeStruct((C, 1), jnp.int32),
            jax.ShapeDtypeStruct((C, 1), jnp.int32),
            jax.ShapeDtypeStruct((C, CENTURY), jnp.float32),
        ),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*sel_inputs,
      samples, state.pos[:, None], state.offset[:, None],
      state.volume_ring)
    dib = dib[:, :n_centuries * CENTURY]
    return dib.astype(jnp.uint8), DemodState(pos[:, 0], off[:, 0], ring)
