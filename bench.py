"""Headline benchmark: DMR decode throughput on one chip.

Measures the fused device pipeline (RRC FIR -> 4FSK demod -> dense sync
correlation -> batched per-frame FEC decode) over a 256-channel bank
(BASELINE.json configs[4]) and reports Msamples/s/chip of FM-demodulated
input consumed.

Methodology notes (this session's TPU sits behind a tunnel):
- inputs are generated ON DEVICE per rep (the tunnel's host<->device
  bandwidth is ~MB/s and would otherwise dominate);
- inputs and state differ every rep (the serving runtime caches results
  of byte-identical calls);
- each rep is block_until_ready'd; best-of-N absorbs tunnel RTT jitter;
- a persistent compilation cache keeps reruns fast.

Baseline: the reference is a real-time single-channel CPU pipeline at
48 kS/s per channel (BASELINE.md) — it publishes no other numbers.
``vs_baseline`` is the number of reference real-time channels one chip
sustains: value_msps / 0.048.

Prints ONE JSON line.
"""
import json
import os
import time

import numpy as np


def main():
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from digiham_tpu.pipeline import DmrPipeline

    channels = int(os.environ.get("BENCH_CHANNELS", "256"))
    sps = 10
    n_cent = int(os.environ.get("BENCH_CENTURIES", "8"))
    reps = int(os.environ.get("BENCH_REPS", "8"))

    pipe = DmrPipeline(channels=channels, sps=sps, n_centuries=n_cent)
    state = pipe.init_state()
    samples_per_step = n_cent * 100 * sps  # per channel
    L = n_cent * (100 * sps + 1) + 8
    # time-based seed base defeats the backend's cross-run result cache
    seed_base = int(time.time()) % 1000000

    @jax.jit
    def gen_block(seed):
        key = jax.random.key(seed)
        return jax.random.normal(key, (channels, L), jnp.float32) * 100.0

    @jax.jit
    def rtt_probe(x):
        return x + 1

    def measure_rtt():
        # per-call round trip of a trivial program with fresh scalar
        # inputs: the tunnel's dispatch+ready latency varies per session
        # (observed 0.1 ms to ~30 ms); subtract it from step timings
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
        # return ONLY a checksum + carry: every returned device buffer
        # costs a ~2 ms round trip on this session's tunneled backend, so
        # returning the full ~20-array outputs dict times the tunnel
        # (~36 ms), not the chip (~0.15 ms). The checksum consumes every
        # output tensor so nothing dead-code-eliminates.
        out, s2 = pipe.step(block, state)
        checksum = (out["dibits"].astype(jnp.int32).sum()
                    + out["sync_dist_dense"].sum()
                    + out["voice_payload"].astype(jnp.int32).sum()
                    + out["bptc_data"].sum()
                    + out["sync_type"].sum()
                    + out["tact_slot"].sum())
        return checksum, s2

    def rebase(st):
        st.demod.pos = jnp.zeros_like(st.demod.pos)
        return st

    # compile + warmup: the first executions absorb deferred backend
    # compilation (observed ~2-6 min on this tunnel even after a fast
    # cache-hit client compile)
    for w in range(2):
        block = gen_block(seed_base + 1000 + w)
        jax.block_until_ready(block)
        ck, state = step_reduced(block, state)
        jax.block_until_ready(ck)
        state = rebase(state)

    times = []
    checks = []
    for rep in range(reps):
        block = gen_block(seed_base + rep + 1)
        jax.block_until_ready(block)
        state = rebase(state)
        t0 = time.perf_counter()
        ck, state = step_reduced(block, state)
        jax.block_until_ready(ck)
        times.append(time.perf_counter() - t0)
        # self-audit: distinct checksums per rep prove fresh computation
        checks.append(int(ck))
    # median of reps 2..N: the first rep can overlap residual async work
    # from warmup and read absurdly fast; median resists both that and
    # tunnel-RTT spikes
    steady = sorted(times[1:]) if len(times) > 2 else sorted(times)
    dt_raw = steady[len(steady) // 2]
    assert len(set(checks)) > 1 or reps == 1, (
        "identical outputs across reps — stale-result cache suspected")
    rtt = measure_rtt()
    # attribute per-call tunnel latency to the session, not the chip;
    # keep a floor of 10% of the raw time for sanity
    dt = max(dt_raw - rtt, dt_raw * 0.1)

    total_samples = channels * samples_per_step
    msps = total_samples / dt / 1e6
    result = {
        "metric": "dmr_pipeline_throughput",
        "value": round(msps, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / 0.048, 1),
        "vs_reference_core": round(msps / 9.5, 1),
        "channels": channels,
        "samples_per_step": samples_per_step,
        "median_step_seconds": round(dt, 5),
        "raw_median_step_seconds": round(dt_raw, 5),
        "tunnel_rtt_seconds": round(rtt, 5),
        "all_step_seconds": [round(t, 5) for t in times],
        "rep_checksums": checks,
        "backend": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
