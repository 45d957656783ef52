"""TPU micro-bench: fused Pallas century demod vs the XLA scan demod.

Honest methodology (CLAUDE.md): on-device inputs keyed per rep, K unrolled
steps per dispatch returning one scalar checksum, N async calls all fetched
to host, samples / wall-time. Prints one JSON line per variant.
"""
import json
import os
import time


def main():
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from digiham_tpu.dsp.demod import demod_init, gfsk_demod_block
    from digiham_tpu.ops.demod_pallas import pallas_demod_block

    channels = int(os.environ.get("BENCH_CHANNELS", "256"))
    sps = 10
    n_cent = int(os.environ.get("BENCH_CENTURIES", "8"))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    unroll = int(os.environ.get("BENCH_UNROLL", "32"))
    tile = int(os.environ.get("BENCH_TILE", "8"))
    L = n_cent * (100 * sps + 1) + 8
    seed_base = int(time.time()) % 1000000
    state0 = demod_init(channels)

    def make_step(demod):
        @jax.jit
        def step_k(seed, state0):
            # one base stream per dispatch + per-step overlapping strided
            # windows: keeps the per-step HBM input read and input
            # distinctness while keeping the threefry normal() harness
            # cost (~0.5 ms/step for [256, 16k] f32) out of the timed
            # region — see bench.py
            stride = 512
            state = state0
            acc = jnp.int32(0)
            base = jax.random.normal(jax.random.key(seed),
                                     (channels,
                                      L + stride * (unroll - 1)),
                                     jnp.float32) * 500
            base = jax.lax.optimization_barrier(base)  # one materialization
            for k in range(unroll):
                x = jax.lax.slice_in_dim(base, k * stride, k * stride + L,
                                         axis=1)
                dib, state = demod(x, state)
                acc = acc + dib.astype(jnp.int32).sum()
                state.pos = jnp.zeros_like(state.pos)
            return (acc + state.offset.sum()
                    + state.volume_ring.sum().astype(jnp.int32))
        return step_k

    variants = {
        # dispatch-floor probe: this tunnel serializes calls, so every
        # per-step number has a floor of ~RTT/unroll — subtract this row
        "floor": lambda x, st: ((x[:, :128] * 2.0).astype(jnp.uint8), st),
        "xla": lambda x, st: gfsk_demod_block(x, st, n_cent, sps),
        "pallas": lambda x, st: pallas_demod_block(x, st, n_cent, sps,
                                                   mode="gfsk", tile=tile),
        # ANY-memory double-buffered variant: tile up to 128 (bit-exact
        # twin of "pallas"; BENCH_DMA_TILE sizes it independently)
        "pallas-dma": lambda x, st: pallas_demod_block(
            x, st, n_cent, sps, mode="gfsk",
            tile=int(os.environ.get("BENCH_DMA_TILE", "64")), dma=True),
    }
    only = os.environ.get("BENCH_ONLY")
    if only:
        variants = {k: v for k, v in variants.items() if k in only.split(",")}
    if os.environ.get("BENCH_ABLATE"):
        # perf attribution: each variant removes one kernel stage
        # (results are intentionally wrong — timing only)
        for abl in ("shift", "timing", "agc"):
            variants[f"pallas-no-{abl}"] = (
                lambda x, st, abl=abl: pallas_demod_block(
                    x, st, n_cent, sps, mode="gfsk", tile=tile,
                    ablate=(abl,)))
    for name, demod in variants.items():
        step_k = make_step(demod)
        try:
            for w in range(2):
                int(step_k(seed_base + 900000 + w, state0))
        except Exception as e:  # compile/runtime failure => report it
            print(json.dumps({"variant": name, "error": repr(e)[:500]}))
            continue
        t0 = time.perf_counter()
        cks = [step_k(seed_base + r + 1, state0) for r in range(reps)]
        checks = [int(c) for c in cks]
        wall = time.perf_counter() - t0
        n_steps = reps * unroll
        dt = wall / n_steps
        msps = channels * n_cent * 100 * sps / dt / 1e6
        print(json.dumps({
            "variant": name,
            "per_step_ms": round(dt * 1e3, 4),
            "msamples_per_s": round(msps, 1),
            "distinct_checksums": len(set(checks)),
            "backend": jax.devices()[0].platform,
        }))


if __name__ == "__main__":
    main()
