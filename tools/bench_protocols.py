"""Per-protocol fused-pipeline throughput on one chip.

Same honest methodology as bench.py (on-device random inputs per rep,
fresh seeds, checksum-reduced outputs, per-rep block_until_ready, median
of steady reps, trivial-program RTT subtracted) applied to every fused
pipeline: DMR, YSF, NXDN, D-Star (2FSK), POCSAG (2FSK inverted).

Usage: python tools/bench_protocols.py [channels] [reps]
Prints one JSON line per protocol.
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")


def bench_pipe(name, pipe, channels, reps, jax, jnp):
    state = pipe.init_state()
    sps = pipe.sps
    n_cent = pipe.n_centuries
    samples_per_step = n_cent * 100 * sps
    L = n_cent * (100 * sps + 1) + 8
    seed_base = int(time.time()) % 1000000

    @jax.jit
    def gen_block(seed):
        key = jax.random.key(seed)
        return jax.random.normal(key, (channels, L), jnp.float32) * 100.0

    @jax.jit
    def rtt_probe(x):
        return x + 1

    def measure_rtt():
        probes = []
        for i in range(7):
            x = jnp.float32(seed_base + i)
            jax.block_until_ready(rtt_probe(x))
            t0 = time.perf_counter()
            jax.block_until_ready(rtt_probe(x + 0.5))
            probes.append(time.perf_counter() - t0)
        probes.sort()
        return probes[len(probes) // 2]

    @jax.jit
    def step_reduced(block, state):
        out, s2 = pipe.step(block, state)
        checksum = sum(jnp.sum(v.astype(jnp.float32))
                       for v in jax.tree.leaves(out))
        return checksum, s2

    def rebase(st):
        st.demod.pos = jnp.zeros_like(st.demod.pos)
        return st

    for w in range(2):
        block = gen_block(seed_base + 1000 + w)
        jax.block_until_ready(block)
        ck, state = step_reduced(block, state)
        jax.block_until_ready(ck)
        state = rebase(state)

    times, checks = [], []
    for rep in range(reps):
        block = gen_block(seed_base + rep + 1)
        jax.block_until_ready(block)
        state = rebase(state)
        t0 = time.perf_counter()
        ck, state = step_reduced(block, state)
        jax.block_until_ready(ck)
        times.append(time.perf_counter() - t0)
        checks.append(float(ck))
    steady = sorted(times[1:]) if len(times) > 2 else sorted(times)
    dt_raw = steady[len(steady) // 2]
    assert len(set(checks)) > 1 or reps == 1, "stale-result cache suspected"
    rtt = measure_rtt()
    dt = max(dt_raw - rtt, dt_raw * 0.1)
    msps = channels * samples_per_step / dt / 1e6
    print(json.dumps({
        "metric": f"{name}_pipeline_throughput",
        "value": round(msps, 3),
        "unit": "Msamples/s/chip",
        "realtime_channels": round(msps / 0.048, 1),
        "channels": channels,
        "samples_per_step": samples_per_step,
        "median_step_seconds": round(dt, 5),
        "raw_median_step_seconds": round(dt_raw, 5),
        "tunnel_rtt_seconds": round(rtt, 5),
    }), flush=True)


def main(channels=256, reps=8):
    import jax
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from digiham_tpu.pipeline import (DmrPipeline, FskPipeline,
                                      NxdnPipeline, YsfPipeline)

    print(json.dumps({"backend": jax.devices()[0].platform}), flush=True)
    bench_pipe("dmr", DmrPipeline(channels=channels, sps=10,
                                  n_centuries=8), channels, reps, jax, jnp)
    bench_pipe("ysf", YsfPipeline(channels=channels, sps=10,
                                  n_centuries=10), channels, reps, jax, jnp)
    bench_pipe("nxdn", NxdnPipeline(channels=channels, sps=20,
                                    n_centuries=4), channels, reps, jax, jnp)
    bench_pipe("dstar", FskPipeline(channels=channels, protocol="dstar",
                                    n_centuries=8), channels, reps, jax, jnp)
    bench_pipe("pocsag", FskPipeline(channels=channels, protocol="pocsag",
                                     n_centuries=2), channels, reps, jax, jnp)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
