"""Headline benchmark: IQ->frames DMR decode throughput on one chip.

Measures the full fused device pipeline (RRC FIR -> 4FSK demod -> dense
sync correlation -> batched per-frame FEC decode) over a 256-channel bank
(BASELINE.json configs[4]) and reports Msamples/s/chip of FM-demodulated
input consumed.

Baseline: the reference is a real-time single-channel CPU pipeline at
48 kS/s per channel (BASELINE.md) — it publishes no other numbers.
``vs_baseline`` is therefore the number of reference real-time channels
one chip sustains: value_msps / 0.048.

Prints ONE JSON line.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from digiham_tpu.pipeline import DmrPipeline

    channels = int(os.environ.get("BENCH_CHANNELS", "256"))
    sps = 10
    n_cent = int(os.environ.get("BENCH_CENTURIES", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    pipe = DmrPipeline(channels=channels, sps=sps, n_centuries=n_cent)
    state = pipe.init_state()
    samples_per_step = n_cent * 100 * sps  # per channel
    L = n_cent * (100 * sps + 1) + 8
    rng = np.random.default_rng(0)
    block = jnp.asarray(rng.normal(0, 100, (channels, L)).astype(np.float32))

    # compile + warmup
    out, state = pipe.step(block, state)
    jax.block_until_ready(out)
    out, state = pipe.step(block, state)
    jax.block_until_ready(out)

    # steady state: rebase demod positions each iter so the dynamic
    # slices stay in range (state.pos grows by ~samples consumed).
    # block_until_ready every iteration: no async pipelining flatters the
    # number — each step's full latency is on the clock.
    t0 = time.perf_counter()
    for _ in range(iters):
        state.demod.pos = jnp.zeros_like(state.demod.pos)
        out, state = pipe.step(block, state)
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    total_samples = channels * samples_per_step * iters
    msps = total_samples / dt / 1e6
    result = {
        "metric": "dmr_pipeline_throughput",
        "value": round(msps, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / 0.048, 1),
        "channels": channels,
        "samples_per_step": samples_per_step,
        "iters": iters,
        "seconds": round(dt, 3),
        "backend": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
