"""Per-stage timing of the DMR pipeline, cache-proof edition.

This session's TPU backend caches results of byte-identical calls AND
does not block in block_until_ready, so every rep uses fresh on-device
random inputs, every stage is checksum-reduced to a scalar, and the
scalar is FETCHED to host (the only reliable completion barrier here).
Medians reported; each timing includes one tunnel RTT (~30 ms), so
per-stage numbers are upper bounds useful for RELATIVE comparisons —
sustained throughput comes from bench.py. States pass as arguments
(closure constants steer XLA into pathological layouts).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from digiham_tpu.dsp.rrc import WIDE_RRC, RrcState, rrc_filter_block
from digiham_tpu.dsp.demod import demod_init, gfsk_demod_block
from digiham_tpu.pipeline import DmrPipeline
from digiham_tpu.pipeline.dmr import dmr_sync_correlate, dmr_decode_frames
from digiham_tpu.protocols.dmr.phases import FRAME_SIZE

C = 256
SPS = 10
N_CENT = 8
REPS = 7

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

L = N_CENT * (100 * SPS + 1) + 8


@jax.jit
def gen_f32(seed):
    return jax.random.normal(jax.random.key(seed), (C, L), jnp.float32) * 100


@jax.jit
def gen_dibits(seed):
    return jax.random.randint(jax.random.key(seed),
                              (C, N_CENT * 100), 0, 4, jnp.int32)


def bench(name, fn, gen, *extra):
    # checksum-reduce and FETCH: the only true completion barrier here
    red = jax.jit(lambda x, *e: fn(x, *e).astype(jnp.float32).sum())
    for w in (998, 999):  # two warmups absorb deferred backend compile
        float(red(gen(w), *extra))
    times = []
    for rep in range(REPS):
        x = gen(rep)
        float(x.sum())  # materialize the input before timing
        t0 = time.perf_counter()
        float(red(x, *extra))
        times.append(time.perf_counter() - t0)
    med = sorted(times[1:])[len(times[1:]) // 2]
    print(f"{name:24s} median {med*1e3:8.3f} ms incl ~RTT  "
          f"(all: {[round(t*1e3,2) for t in times]})")
    return med


def main():
    print("backend:", jax.devices()[0].platform, jax.devices()[0])
    rrc_state = RrcState.init(C, WIDE_RRC)
    dm_state = demod_init(C)
    pipe = DmrPipeline(channels=C, sps=SPS, n_centuries=N_CENT)
    full_state = pipe.init_state()

    t_rrc = bench(
        "rrc_filter",
        jax.jit(lambda x, st: rrc_filter_block(x, st, WIDE_RRC)[0]),
        gen_f32, rrc_state)
    t_dem = bench(
        "gfsk_demod",
        jax.jit(lambda x, st: gfsk_demod_block(x, st, N_CENT, SPS)[0]),
        gen_f32, dm_state)
    t_sync = bench("sync_correlate", dmr_sync_correlate, gen_dibits)
    n_frames = (N_CENT * 100) // FRAME_SIZE
    t_dec = bench(
        "frame_decode",
        jax.jit(lambda d: dmr_decode_frames(
            d[:, :n_frames * FRAME_SIZE].reshape(C, n_frames, FRAME_SIZE)
        )["voice_payload"]),
        gen_dibits)
    t_full = bench(
        "FULL fused step",
        jax.jit(lambda x, st: pipe.step(x, st)[0]["voice_payload"]),
        gen_f32, full_state)

    total = t_rrc + t_dem + t_sync + t_dec
    print(f"{'sum of stages':24s} {total*1e3:8.3f} ms (each incl ~RTT)")
    print(f"{'fused step':24s} {t_full*1e3:8.3f} ms (incl ~RTT; "
          f"sustained throughput: bench.py)")


if __name__ == "__main__":
    main()
