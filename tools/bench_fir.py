"""TPU micro-bench: RRC FIR variants (MXU matmul / Pallas / XLA conv).

Honest methodology (CLAUDE.md): one on-device base stream per dispatch,
per-step overlapping lane-aligned windows, K unrolled steps per dispatch
returning one scalar checksum, N async calls all fetched to host.
Prints one JSON line per variant.
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
    from digiham_tpu.dsp.rrc import (WIDE_RRC, RrcState,
                                     _rrc_filter_block_matmul,
                                     rrc_filter_block)
    from digiham_tpu.ops.fir import rrc_filter_block_pallas

    channels = int(os.environ.get("BENCH_CHANNELS", "256"))
    L = int(os.environ.get("BENCH_SAMPLES", "16008"))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    unroll = int(os.environ.get("BENCH_UNROLL", "32"))
    seed_base = int(time.time()) % 1000000
    state0 = RrcState.init(channels, WIDE_RRC)
    taps = WIDE_RRC.scaled_taps

    def make_step(fir):
        @jax.jit
        def step_k(seed, state0):
            stride = 512
            state = state0
            acc = jnp.float32(0)
            base = jax.random.normal(
                jax.random.key(seed),
                (channels, L + stride * (unroll - 1)), jnp.float32) * 100
            # force ONE materialization: without the barrier XLA fuses
            # the threefry generation into every consumer step (~0.9 ms
            # of rng re-run per step, swamping the kernel under test)
            base = jax.lax.optimization_barrier(base)
            for k in range(unroll):
                x = jax.lax.slice_in_dim(base, k * stride, k * stride + L,
                                         axis=1)
                y, state = fir(x, state)
                acc = acc + y.sum()
            return acc + state.history.sum()
        return step_k

    def pallas_fir(x, st):
        y, h = rrc_filter_block_pallas(x, st.history, taps)
        return y, RrcState(h)

    variants = {
        # harness floor: window read + trivial elementwise + checksum
        "noop": lambda x, st: (x * 2.0, st),
        # fixed-cost probe: touches only 128 lanes per step
        "tiny": lambda x, st: (x[:, :128] * 2.0, st),
        "xla-matmul": lambda x, st: _rrc_filter_block_matmul(x, st,
                                                             WIDE_RRC),
        "pallas-cmajor": pallas_fir,
        "xla-conv": lambda x, st: rrc_filter_block(x, st, WIDE_RRC,
                                                   impl="xla"),
    }
    only = os.environ.get("BENCH_ONLY")
    if only:
        variants = {k: v for k, v in variants.items()
                    if k in only.split(",")}
    for name, fir in variants.items():
        step_k = make_step(fir)
        try:
            for w in range(2):
                float(step_k(seed_base + 900000 + w, state0))
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:500]}))
            continue
        t0 = time.perf_counter()
        cks = [step_k(seed_base + r + 1, state0) for r in range(reps)]
        checks = [float(c) for c in cks]
        wall = time.perf_counter() - t0
        dt = wall / (reps * unroll)
        print(json.dumps({
            "variant": name,
            "per_step_ms": round(dt * 1e3, 4),
            "msamples_per_s": round(channels * L / dt / 1e6, 1),
            "distinct_checksums": len(set(checks)),
            "backend": jax.devices()[0].platform,
        }))


if __name__ == "__main__":
    main()
