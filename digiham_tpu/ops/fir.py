"""Pallas TPU kernel: many-channel FIR (the RRC hot path).

Layout choice: channels ride the **lane** dimension (128-wide) and time
rides sublanes, so one VPU op advances 128 channels at once and the taps
are scalar broadcasts — the natural TPU shape for a channelized filter
bank, vs. the reference's one-sample-at-a-time delay line
(src/rrc_filter/rrc_filter.cpp:22-34).

Each grid step DMAs one time tile plus its ``ntaps-1`` overlap from HBM
into VMEM (overlap-save windows overlap by a non-block-multiple, so the
halo is fetched with an explicit async copy rather than a BlockSpec), then
accumulates ``ntaps`` shifted multiply-adds fully fused in VMEM: HBM
traffic is one read + one write of the stream.

This kernel is the default on the TPU backend (honestly benched 2.5x the
XLA conv at 256ch; superseded as TPU default by the banded-matmul MXU
path in dsp.rrc — see dsp.rrc._tpu_impl); the XLA conv path remains
the default elsewhere (f32-reassociation compatible, validated against the
conv path in tests)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

def pallas_fir_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        return True
    except ImportError:  # pragma: no cover
        return False


_FIR_CHUNK = 512  # output lanes per inner iteration (128-aligned)


def _pick_fir_tile(C: int, Lp: int, ntaps: int, halo_pad: int) -> int:
    """Largest channel tile dividing C whose double-buffered [tile, Lp]
    f32 input + output row blocks plus the inner chunk's roll
    temporaries (the Mosaic scheduler keeps the independent per-tap
    rolls live) stay inside the 16 MB scoped VMEM."""
    budget = 14 * 2 ** 20
    for t in (128, 64, 32, 16, 8):
        need = (4 * t * Lp * 4
                + ntaps * t * (_FIR_CHUNK + halo_pad) * 4)
        if C % t == 0 and need <= budget:
            return t
    return next((t for t in (32, 16, 8) if C % t == 0), C)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_fir_cmajor(x: jnp.ndarray, taps: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """FIR over a [C, T + ntaps - 1] channel-major block (time in lanes).

    This layout matches the pipeline's native [channels, time] arrays (no
    transposes around the kernel) and rides channels on sublanes so any
    channels % 8 == 0 bank qualifies. A time-major twin (channels in
    lanes) existed through round 4 for A/B only; the A/B is decided —
    the banded-matmul MXU path (dsp.rrc) is the production default and
    this kernel is the certified non-MXU fallback — so the twin was
    retired (docs/ARCHITECTURE.md variant matrix).

    Structure: a fori_loop walks 512-lane output chunks (dynamic ref
    slices at provably 128-aligned offsets) and the taps accumulate over
    static lane-rotations of the chunk's [tile, 512 + halo_pad] window —
    full-row rolls would leave ntaps row-sized temporaries live at once
    (measured 112 MB > the 16 MB scoped VMEM).

    x: [C, T + ntaps - 1] float32 (leading ntaps-1 columns = history).
    taps: [ntaps] float32.  Returns y [C, T], y[:, t] = sum_j taps[j] *
    x[:, t + j].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ntaps = taps.shape[0]
    halo = ntaps - 1
    halo_pad = -(-halo // 128) * 128
    win = _FIR_CHUNK + halo_pad
    C, Lx = x.shape
    T = Lx - halo
    T_pad = -(-T // _FIR_CHUNK) * _FIR_CHUNK
    Lp = -(-max(Lx, T_pad + halo_pad) // 128) * 128
    if Lp != Lx:
        x = jnp.pad(x, ((0, 0), (0, Lp - Lx)))
    tile = _pick_fir_tile(C, Lp, ntaps, halo_pad)

    def kernel(taps_ref, x_ref, y_ref):
        def body(b, carry):
            W = x_ref[:, pl.ds(b * _FIR_CHUNK, win)]
            acc = taps_ref[0] * W[:, :_FIR_CHUNK]
            for j in range(1, ntaps):
                # static left-rotate by j: lane t reads x[b*CHUNK + t + j]
                acc = acc + taps_ref[j] * pltpu.roll(
                    W, win - j, axis=1)[:, :_FIR_CHUNK]
            y_ref[:, pl.ds(b * _FIR_CHUNK, _FIR_CHUNK)] = acc
            return carry
        jax.lax.fori_loop(0, T_pad // _FIR_CHUNK, body, 0)

    y = pl.pallas_call(
        kernel,
        grid=(C // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, Lp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, T_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, T_pad), jnp.float32),
        interpret=interpret,
    )(taps, x)
    return y[:, :T]


def rrc_filter_block_pallas(samples: jnp.ndarray, history: jnp.ndarray,
                            taps: np.ndarray, interpret: bool = False):
    """[C, T] channel-major entry point for the Pallas FIR.

    history: [C, ntaps-1] previous samples (RrcState.history).
    Returns (y [C, T], new_history [C, ntaps-1]).
    """
    x = jnp.concatenate([history, samples], axis=-1)  # [C, T + ntaps - 1]
    y = pallas_fir_cmajor(x, jnp.asarray(taps), interpret=interpret)
    ntaps = len(taps)
    return y, x[:, x.shape[-1] - (ntaps - 1):]
