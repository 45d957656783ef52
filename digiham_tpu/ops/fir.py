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
XLA conv at 256ch; see dsp.rrc._pallas_default); the XLA conv path remains
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


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def pallas_fir(x_tc: jnp.ndarray, taps: jnp.ndarray,
               block_t: int = 512, interpret: bool = False) -> jnp.ndarray:
    """FIR over a [T, C] block (time-major, channels in lanes).

    x_tc: [T + ntaps - 1, C] float32 — the leading ``ntaps-1`` rows are
    the overlap-save history.
    taps: [ntaps] float32 (gain already folded in).
    Returns y [T, C] with y[t] = sum_j taps[j] * x[t + j].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ntaps = taps.shape[0]
    halo = ntaps - 1
    T = x_tc.shape[0] - halo
    C = x_tc.shape[1]
    n_blocks = pl.cdiv(T, block_t)
    T_pad = n_blocks * block_t
    if T_pad != T:
        x_tc = jnp.pad(x_tc, ((0, T_pad - T), (0, 0)))

    def kernel(taps_ref, x_hbm, y_ref, scratch, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * block_t, block_t + halo), :],
            scratch, sem)
        dma.start()
        dma.wait()
        acc = jnp.zeros((block_t, C), jnp.float32)
        for j in range(ntaps):
            acc = acc + taps_ref[j] * scratch[j:j + block_t, :]
        y_ref[:, :] = acc

    y = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block_t, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_t + halo, C), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(taps, x_tc)
    return y[:T]


def rrc_filter_block_pallas(samples: jnp.ndarray, history: jnp.ndarray,
                            taps: np.ndarray, interpret: bool = False):
    """[C, T] channel-major wrapper: transpose -> kernel -> transpose.

    history: [C, ntaps-1] previous samples (RrcState.history).
    Returns (y [C, T], new_history [C, ntaps-1]).
    """
    x = jnp.concatenate([history, samples], axis=-1)  # [C, T + ntaps - 1]
    y = pallas_fir(x.T, jnp.asarray(taps), interpret=interpret).T
    ntaps = len(taps)
    return y, x[:, x.shape[-1] - (ntaps - 1):]
