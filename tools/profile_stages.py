"""Per-stage timing of the DMR pipeline on the current backend.

Pass states as ARGUMENTS, never closures: closing over state arrays bakes
them into the HLO as constants, which steered XLA into a ~100x slower
layout for the demod scan when this tool was first written.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from digiham_tpu.dsp.rrc import WIDE_RRC, RrcState, rrc_filter_block
from digiham_tpu.dsp.demod import demod_init, gfsk_demod_block
from digiham_tpu.pipeline.dmr import dmr_sync_correlate, dmr_decode_frames
from digiham_tpu.protocols.dmr.phases import FRAME_SIZE

C = 256
SPS = 10
N_CENT = 8
ITERS = 30


def bench(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:24s} {dt*1e3:8.3f} ms/step")
    return dt


def main():
    print("backend:", jax.devices()[0].platform, jax.devices()[0])
    rng = np.random.default_rng(0)
    L = N_CENT * (100 * SPS + 1) + 8
    x = jnp.asarray(rng.normal(0, 100, (C, L)).astype(np.float32))
    rrc_state = RrcState.init(C, WIDE_RRC)
    dm_state = demod_init(C)

    rrc_jit = jax.jit(lambda s, st: rrc_filter_block(s, st, WIDE_RRC))
    t_rrc = bench("rrc_filter", rrc_jit, x, rrc_state)

    y, _ = rrc_jit(x, rrc_state)
    t_dem = bench("gfsk_demod",
                  lambda s, st: gfsk_demod_block(s, st, N_CENT, SPS),
                  y, dm_state)

    dibits, _ = gfsk_demod_block(y, dm_state, N_CENT, SPS)
    t_sync = bench("sync_correlate", dmr_sync_correlate, dibits)

    n_frames = (N_CENT * 100) // FRAME_SIZE
    frames = dibits[:, :n_frames * FRAME_SIZE].reshape(C, n_frames, FRAME_SIZE)
    t_dec = bench("frame_decode", dmr_decode_frames, frames)

    total = t_rrc + t_dem + t_sync + t_dec
    samples = C * N_CENT * 100 * SPS
    print(f"{'sum of stages':24s} {total*1e3:8.3f} ms "
          f"=> {samples/total/1e6:.0f} Msamples/s")


if __name__ == "__main__":
    main()
