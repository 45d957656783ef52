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

    @jax.jit
    def gen_block(seed):
        key = jax.random.key(seed)
        return jax.random.normal(key, (channels, L), jnp.float32) * 100.0

    @jax.jit
    def step_reduced(block, state):
        # production shape: all outputs are consumed/reduced on device;
        # the host pulls only small fields. Blocking on the full outputs
        # dict would time the session tunnel's ~100 MB/s output transfer
        # of the dense diagnostics, not the chip.
        out, s2 = pipe.step(block, state)
        checksum = (out["dibits"].astype(jnp.int32).sum()
                    + out["sync_dist_dense"].sum()
                    + out["voice_payload"].astype(jnp.int32).sum()
                    + out["bptc_data"].sum()
                    + out["sync_type"].sum()
                    + out["tact_slot"].sum())
        return checksum, out["voice_payload"], s2

    def rebase(st):
        st.demod.pos = jnp.zeros_like(st.demod.pos)
        return st

    # compile + warmup: the first executions absorb deferred backend
    # compilation (observed ~2-6 min on this tunnel even after a fast
    # cache-hit client compile)
    for w in range(2):
        block = gen_block(1000 + w)
        jax.block_until_ready(block)
        ck, voice, state = step_reduced(block, state)
        jax.block_until_ready(ck)
        state = rebase(state)

    times = []
    checks = []
    for rep in range(reps):
        block = gen_block(rep + 1)
        jax.block_until_ready(block)
        state = rebase(state)
        t0 = time.perf_counter()
        ck, voice, state = step_reduced(block, state)
        jax.block_until_ready(ck)
        times.append(time.perf_counter() - t0)
        # self-audit: distinct checksums per rep prove fresh computation
        checks.append(int(ck))
    # median of reps 2..N: the first rep can overlap residual async work
    # from warmup and read absurdly fast; median resists both that and
    # tunnel-RTT spikes
    steady = sorted(times[1:]) if len(times) > 2 else sorted(times)
    dt = steady[len(steady) // 2]
    assert len(set(checks)) > 1 or reps == 1, (
        "identical outputs across reps — stale-result cache suspected")

    total_samples = channels * samples_per_step
    msps = total_samples / dt / 1e6
    result = {
        "metric": "dmr_pipeline_throughput",
        "value": round(msps, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / 0.048, 1),
        "channels": channels,
        "samples_per_step": samples_per_step,
        "median_step_seconds": round(dt, 5),
        "all_step_seconds": [round(t, 5) for t in times],
        "rep_checksums": checks,
        "backend": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
