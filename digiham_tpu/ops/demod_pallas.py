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


@functools.lru_cache(maxsize=None)
def _atan_poly_coeffs(deg: int = 10) -> tuple:
    """Power-series coefficients of a Chebyshev fit to atan(q)/q as a
    polynomial in s = q*q over s in [0, 1], derived at import (the repo
    rule: derive tables, never paste magic constants).

    Mosaic has no atan/atan2 lowering (probed round 5:
    NotImplementedError for both), so the fused FM front evaluates this
    polynomial + the standard octant reduction instead. atan(sqrt(s))/
    sqrt(s) has its nearest singularity at s = -1, so Chebyshev
    coefficients decay ~5.83^-n: deg 10 leaves ~4e-9 fit error, below
    f32 resolution; the f32 Horner evaluation dominates at ~2 ulp
    (measured in tests/test_fused_front.py against np.arctan2)."""
    from numpy.polynomial import Polynomial, chebyshev

    s = np.linspace(0.0, 1.0, 8192)
    q = np.sqrt(s)
    with np.errstate(invalid="ignore"):
        g = np.where(q > 0, np.arctan(q) / np.where(q > 0, q, 1.0), 1.0)
    fit = chebyshev.Chebyshev.fit(s, g, deg=deg, domain=[0.0, 1.0])
    return tuple(np.float32(c) for c in fit.convert(kind=Polynomial).coef)


def _kernel_atan2(y, x):
    """Branch-free f32 atan2 for Mosaic kernels: octant-reduce to
    q = min(|x|,|y|)/max(|x|,|y|) in [0, 1], evaluate the derived
    polynomial (Horner), then undo the reduction with selects. Within a
    few f32 ulps of libm/XLA atan2 everywhere (the fm_rrc front's
    documented envelope); atan2(0, 0) returns 0 with no NaN (garbage
    halo lanes must stay finite through the banded matmul's zero
    rows)."""
    coeffs = _atan_poly_coeffs()
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    q = mn / jnp.where(mx > 0, mx, np.float32(1.0))
    s = q * q
    p = jnp.full_like(s, coeffs[-1])
    for c in reversed(coeffs[:-1]):
        p = p * s + c
    r = q * p
    r = jnp.where(ay > ax, np.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, np.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def _front_prefix(ntaps: int) -> int:
    """Lane width of the fused-front halo: the RRC needs ntaps-1 samples
    of history before each filtered position, rounded up to the 128-lane
    alignment every in-kernel slice needs (wide 81 taps -> 128, narrow
    161 -> 256)."""
    return -(-(ntaps - 1) // 128) * 128


@functools.lru_cache(maxsize=None)
def _front_band(taps_bytes: bytes, ntaps: int) -> np.ndarray:
    """[P+128, 128] banded RHS for the in-kernel RRC: filtered output
    q = o*128 + k of a century window is ext[:, o*128 : o*128+P+128] @ B
    where ext lane u holds the input sample at position (window start -
    P + u) and B[u, k] = taps[u - (P - halo) - k] inside the band, 0
    outside. Same contraction as dsp.rrc._banded_matrix (the certified
    MXU formulation, rrc.py:184) shifted by the halo padding."""
    taps = np.frombuffer(taps_bytes, dtype=np.float32)
    halo = ntaps - 1
    P = _front_prefix(ntaps)
    off0 = P - halo
    B = np.zeros((P + 128, 128), np.float32)
    for k in range(128):
        B[off0 + k:off0 + k + ntaps, k] = taps
    return B


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


def preferred_block_len(n_centuries: int, sps: int, ntaps: int = 0) -> int:
    """Smallest L the demod kernels accept WITHOUT an internal right-pad:
    jnp.pad materializes a full [C, L] copy (two for the fused front's
    planes) on every step when L < last_start + load — ~16.8 MB/step of
    pure HBM traffic at 256ch x 16 centuries. Benchmarks and streaming
    drivers that control their own block size should allocate this L
    up front (the pad branch stays as the safety net for arbitrary L).
    ntaps > 0 additionally covers the fused front's century-0 window."""
    span = CENTURY * sps + 1
    n = CENTURY * sps
    load = -(-(span + _shift_bound(n_centuries, sps)) // 128) * 128
    L = _century_start(n_centuries - 1, n) + load
    if ntaps:
        L = max(L, load + _front_prefix(ntaps))
    return -(-L // 128) * 128


def pick_tile(C: int, L: int, n_centuries: int, sps: int,
              dma: bool = False, front: str | None = None,
              ntaps: int = 0) -> int:
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
    if front:
        # fused-front kernel: DMA slots hold the RAW input window(s)
        # (wlen = load + P halo lanes; two planes for fm_rrc), plus the
        # FM/ext temporaries, the stacked-chunk matmul operands, the
        # filtered window, and the same batched-AGC/dibit terms as the
        # plain DMA kernel. Conservative first estimate — re-calibrate
        # on hardware like the dma branch was (round 4).
        planes = 2 if front == "fm_rrc" else 1
        P = _front_prefix(ntaps)
        wlen_f = load + P
        temps = 6 if front == "fm_rrc" else 2
        per_t = (2 * planes * wlen_f * 4
                 + temps * wlen_f * 4
                 + 2 * (load // 128) * (P + 128) * 4
                 + load * 4
                 + 10 * (n_centuries + 1) * 128 * 4
                 + 2 * n_centuries * 128 * 4)
        for t in (128, 64, 32, 16, 8):
            if C % t == 0 and t * per_t <= budget:
                return t
        return next(t for t in (8, 16, 32, 64, 128) if C % t == 0)
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
                 dma: bool = False, front: str | None = None,
                 ntaps: int = 0, fm_scale: float = 5000.0):
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
    also A/B'd on hardware, showed no win, and was removed).

    front="rrc" (requires dma): the HBM rows are the UNFILTERED input
    samples and each century's RRC-filtered window is computed in-kernel
    as (load//128) banded matmuls batched into one [chunks*tile, P+128]
    @ [P+128, 128] MXU pass per century (same contraction per output
    column as dsp.rrc._rrc_filter_block_matmul, so values agree within
    the documented f32 matmul envelope) — the filtered array never
    round-trips HBM (ROADMAP item 3 front-end fusion; the fused step is
    HBM-bound). front="fm_rrc" additionally computes the FM quadrature
    discriminator in-kernel from re/im sample planes (dsp/fm.py:21-31
    semantics; the complex product and arctan2 run on the VPU), so raw
    IQ is the only HBM input of the whole chain."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert front in (None, "rrc", "fm_rrc"), front
    if front:
        assert dma, "fused-front kernels are DMA-staged only"
        P = _front_prefix(ntaps)
        wlen = load + P
        n_chunks = load // 128
        if n_centuries > 1:
            assert _century_start(1, CENTURY * sps) >= P, (
                "century 1 window would underrun the block start", sps,
                ntaps)

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
        if front == "fm_rrc":
            (sel_ref, band_ref, yre_ref, yim_ref, lre_ref, lim_ref,
             hist_ref, pos_ref, off_ref, ring_ref, dib_ref, pos_out,
             off_out, ring_out, wre, wim, dma_sem) = refs
        elif front == "rrc":
            (sel_ref, band_ref, y_ref, hist_ref, pos_ref, off_ref,
             ring_ref, dib_ref, pos_out, off_out, ring_out, wbuf,
             dma_sem) = refs
        else:
            (sel_ref, y_ref, pos_ref,
             off_ref, ring_ref, dib_ref, pos_out, off_out, ring_out,
             *scratch) = refs
        if front:
            rows = pl.ds(pl.program_id(0) * tile, tile)

            def _src(c):
                # century 0 reads from the block origin (its halo is the
                # carried history strip); later centuries read their own
                # P-lane in-block halo. Both offsets are static
                # 128-multiples (start_c is 128-aligned, P is too).
                return 0 if c == 0 else _century_start(c, n) - P

            if front == "fm_rrc":
                def _copies(c):
                    return (
                        pltpu.make_async_copy(
                            yre_ref.at[rows, pl.ds(_src(c), wlen)],
                            wre.at[c % 2], dma_sem.at[c % 2, 0]),
                        pltpu.make_async_copy(
                            yim_ref.at[rows, pl.ds(_src(c), wlen)],
                            wim.at[c % 2], dma_sem.at[c % 2, 1]))
            else:
                def _copies(c):
                    return (pltpu.make_async_copy(
                        y_ref.at[rows, pl.ds(_src(c), wlen)],
                        wbuf.at[c % 2], dma_sem.at[c % 2]),)

            for cp in _copies(0):
                cp.start()

            def _front_window(c):
                """FM (optional) + in-kernel RRC for century c's
                [tile, load] filtered window."""
                if front == "fm_rrc":
                    re = wre[c % 2]
                    im = wim[c % 2]
                    # quadrature discriminator, dsp/fm.py:21-31 op
                    # order: prod = iq * conj(prev), atan2 / pi, then
                    # the pipeline's front-end gain — three separate
                    # f32 roundings, same as the XLA path
                    pre = pltpu.roll(re, 1, axis=1)
                    pim = pltpu.roll(im, 1, axis=1)
                    if c == 0:
                        lane0 = (jax.lax.broadcasted_iota(
                            jnp.int32, (tile, wlen), 1) == 0)
                        pre = jnp.where(lane0, lre_ref[:, :1], pre)
                        pim = jnp.where(lane0, lim_ref[:, :1], pim)
                    # lane 0 of c>=1 windows wraps garbage — consumed
                    # only by zero rows of the banded RHS (finite, so
                    # 0*x == 0 exactly)
                    prod_re = re * pre + im * pim
                    prod_im = im * pre - re * pim
                    audio = (_kernel_atan2(prod_im, prod_re)
                             / np.float32(np.pi)) * np.float32(fm_scale)
                else:
                    audio = wbuf[c % 2]
                if c == 0:
                    ext = jnp.concatenate(
                        [hist_ref[:, :], audio[:, :load]], axis=1)
                else:
                    ext = audio
                # ext lane u == input sample at (start_c - P + u); the
                # load//128 banded chunk matmuls share one RHS, so stack
                # the chunks along sublanes for a single wide MXU pass
                stacked = jnp.concatenate(
                    [ext[:, o * 128:o * 128 + P + 128]
                     for o in range(n_chunks)], axis=0)
                f = jnp.dot(stacked, band_ref[:, :],
                            preferred_element_type=jnp.float32)
                return jnp.concatenate(
                    [f[o * tile:(o + 1) * tile]
                     for o in range(n_chunks)], axis=1)
        elif dma:
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
            if front:
                if c + 1 < n_centuries:
                    for cp in _copies(c + 1):
                        cp.start()
                for cp in _copies(c):
                    cp.wait()
                W = _front_window(c)
            elif dma:
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


def _front_common(front, arrays, extras, hist, state, taps, n_centuries,
                  sps, mode, invert, tile, interpret, fm_scale):
    """Shared pallas_call builder for the fused-front kernels."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    taps_arr = np.frombuffer(taps, dtype=np.float32)
    ntaps = len(taps_arr)
    halo = ntaps - 1
    P = _front_prefix(ntaps)
    C, L = arrays[0].shape
    assert C % tile == 0, (C, tile)
    span = CENTURY * sps + 1
    n = CENTURY * sps
    load = -(-(span + _shift_bound(n_centuries, sps)) // 128) * 128
    wlen = load + P
    last_start = _century_start(n_centuries - 1, n)
    # century 0 reads [0, wlen) and the last century [last_start,
    # last_start + load); right-pad so both stay in bounds
    L_pad = max(L, last_start + load, wlen)
    L_pad = -(-L_pad // 128) * 128
    if L_pad != L:
        arrays = [jnp.pad(a, ((0, 0), (0, L_pad - L))) for a in arrays]
    # history strip: lanes [P-halo, P) hold the carried ntaps-1 input
    # samples (positions -halo..-1); leading zero lanes only ever meet
    # zero rows of the banded RHS
    hist_p = jnp.pad(hist.astype(jnp.float32), ((0, 0), (P - halo, 0)))
    grid = (C // tile,)
    kernel = _make_kernel(n_centuries, sps, tile, mode, invert, load,
                          (), True, front=front, ntaps=ntaps,
                          fm_scale=fm_scale)
    band = jnp.asarray(_front_band(taps, ntaps))
    sel = jnp.asarray(_merged_selection(sps))
    out_w = -(-(n_centuries * CENTURY) // 128) * 128

    def tile_spec(w):
        return pl.BlockSpec((tile, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((n, SEL_W), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P + 128, 128), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pl.ANY)] * len(arrays)
    inputs = [sel, band, *arrays]
    if front == "fm_rrc":
        lre, lim = extras
        in_specs += [tile_spec(1), tile_spec(1)]
        inputs += [lre.astype(jnp.float32)[:, None],
                   lim.astype(jnp.float32)[:, None]]
    in_specs += [tile_spec(P), tile_spec(1), tile_spec(1),
                 tile_spec(CENTURY)]
    inputs += [hist_p, state.pos[:, None], state.offset[:, None],
               state.volume_ring]
    scratch = [pltpu.VMEM((2, tile, wlen), jnp.float32)]
    if front == "fm_rrc":
        scratch += [pltpu.VMEM((2, tile, wlen), jnp.float32),
                    pltpu.SemaphoreType.DMA((2, 2))]
    else:
        scratch += [pltpu.SemaphoreType.DMA((2,))]
    dib, pos, off, ring = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(tile_spec(out_w), tile_spec(1), tile_spec(1),
                   tile_spec(CENTURY)),
        out_shape=(
            jax.ShapeDtypeStruct((C, out_w), jnp.int32),
            jax.ShapeDtypeStruct((C, 1), jnp.int32),
            jax.ShapeDtypeStruct((C, 1), jnp.int32),
            jax.ShapeDtypeStruct((C, CENTURY), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)
    dib = dib[:, :n_centuries * CENTURY]
    return dib.astype(jnp.uint8), DemodState(pos[:, 0], off[:, 0], ring)


@functools.partial(jax.jit,
                   static_argnames=("taps", "n_centuries", "sps", "mode",
                                    "invert", "tile", "interpret"))
def pallas_demod_front_block(samples: jnp.ndarray, hist: jnp.ndarray,
                             state: DemodState, *, taps: bytes,
                             n_centuries: int, sps: int = 10,
                             mode: str = "gfsk", invert: bool = False,
                             tile: int = 8, interpret: bool = False):
    """Fused RRC + century demod: the RRC FIR runs IN-KERNEL as banded
    chunk matmuls, so the filtered array never round-trips HBM.

    samples: [C, L] float32 UNFILTERED input samples (what
    dsp.rrc.rrc_filter_block would consume); hist: [C, ntaps-1] carried
    input history (RrcState.history); taps: the design's scaled_taps
    bytes (dsp.rrc.RrcDesign.scaled_taps). Demod semantics identical to
    pallas_demod_block on rrc_filter_block's output; filtered values
    agree with the MXU banded-matmul path within the documented f32
    envelope (same contraction per output column, MXU accumulation
    order may differ). Reference chain: src/rrc_filter/rrc_filter.cpp
    feeding src/fsk_demodulator/*.cpp. Requires 0 <= pos < pos_guard.
    Returns (symbols, new DemodState); the new RrcState history is the
    caller's job (samples[:, L-ntaps+1:], bitwise-identical to the
    unfused carry).
    """
    return _front_common("rrc", [samples], None, hist, state, taps,
                         n_centuries, sps, mode, invert, tile, interpret,
                         0.0)


@functools.partial(jax.jit,
                   static_argnames=("taps", "n_centuries", "sps", "mode",
                                    "invert", "tile", "interpret",
                                    "fm_scale"))
def pallas_demod_fm_front_block(re: jnp.ndarray, im: jnp.ndarray,
                                last_re: jnp.ndarray,
                                last_im: jnp.ndarray, hist: jnp.ndarray,
                                state: DemodState, *, taps: bytes,
                                n_centuries: int, sps: int = 10,
                                mode: str = "gfsk", invert: bool = False,
                                tile: int = 8, interpret: bool = False,
                                fm_scale: float = 5000.0):
    """Fully-fused raw-IQ front end: FM quadrature discriminator
    (dsp/fm.py:21-31 op order) + RRC FIR + century demod in ONE kernel —
    raw IQ planes are the only HBM input of the chain.

    re/im: [C, L] float32 IQ component planes (this tunnel cannot even
    transfer complex64 — planar ingest is the production layout);
    last_re/last_im: [C] previous block's final IQ sample (the
    fm_discriminator carry); hist: [C, ntaps-1] carried SCALED audio
    history (RrcState.history — the unfused chain's
    audio/pi*fm_scale values). The in-kernel arctan2 is Mosaic's, which
    may differ from XLA's in final-ulp rounding — the same precision
    class as the documented MXU envelope; goldens stay on the XLA path.
    """
    return _front_common("fm_rrc", [re, im], (last_re, last_im), hist,
                         state, taps, n_centuries, sps, mode, invert,
                         tile, interpret, fm_scale)
