"""Headline benchmark: IQ->frames DMR decode throughput on one chip.

Measures the full fused device pipeline (RRC FIR -> 4FSK demod -> dense
sync correlation -> batched per-frame FEC decode) over a 256-channel bank
(BASELINE.json configs[4]) and reports Msamples/s/chip of FM-demodulated
input consumed.

Methodology: the steady-state loop runs as a ``lax.scan`` of pipeline
steps *inside one jit program*, so a timed invocation is a single
dispatch + device execution of ``chain_len`` steps — host/tunnel round
trips cannot flatter or distort the number. Every step's outputs feed a
live reduction so nothing dead-code-eliminates.

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

    # persist compiled executables across runs: the pipeline-chain program
    # takes minutes to compile over the session's TPU tunnel
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from digiham_tpu.dsp.demod import DemodState
    from digiham_tpu.pipeline import DmrPipeline
    from digiham_tpu.pipeline.dmr import DmrPipelineState

    channels = int(os.environ.get("BENCH_CHANNELS", "256"))
    sps = 10
    n_cent = int(os.environ.get("BENCH_CENTURIES", "8"))
    chain_len = int(os.environ.get("BENCH_CHAIN", "8"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    pipe = DmrPipeline(channels=channels, sps=sps, n_centuries=n_cent)
    state = pipe.init_state()
    samples_per_step = n_cent * 100 * sps  # per channel
    L = n_cent * (100 * sps + 1) + 8

    @jax.jit
    def gen_blocks(seed):
        # generate the input stream ON DEVICE: the session's host<->device
        # link is a tunnel with ~MB/s bandwidth, so host-generated blocks
        # would measure the tunnel, not the chip
        key = jax.random.key(seed)
        return jax.random.normal(
            key, (chain_len, channels, L), jnp.float32) * 100.0

    @jax.jit
    def run_chain(blocks, state):
        # blocks: [chain_len, C, L] — every step streams a fresh block
        # from HBM, like real ingest (a loop-invariant block would get
        # hoisted into VMEM and overstate throughput ~5x)
        def body(s, blk):
            out, s2 = pipe.step(blk, s)
            # keep every output tensor live via a reduction
            stats = (out["voice_payload"].astype(jnp.int32).sum()
                     + out["bptc_data"].sum()
                     + out["sync_dist_dense"].sum()
                     + out["sync_type"].sum()
                     + out["dibits"].astype(jnp.int32).sum())
            # rebase the demod read cursor so slices stay in range
            s2 = DmrPipelineState(
                s2.rrc,
                DemodState(jnp.zeros_like(s2.demod.pos), s2.demod.offset,
                           s2.demod.volume_ring))
            return s2, stats
        final_state, stats = jax.lax.scan(body, state, blocks)
        return final_state, stats.sum()

    # compile + warmup
    blocks = gen_blocks(0)
    jax.block_until_ready(blocks)
    st, checksum = run_chain(blocks, state)
    jax.block_until_ready(checksum)

    # NOTE: the serving runtime caches results for byte-identical
    # (executable, inputs) pairs; fresh random blocks + evolving state
    # every rep so each timed run is real device execution.
    times = []
    checks = []
    cur = st
    for rep in range(reps):
        blocks = gen_blocks(rep + 1)
        jax.block_until_ready(blocks)
        t0 = time.perf_counter()
        cur, checksum = run_chain(blocks, cur)
        jax.block_until_ready(checksum)
        times.append(time.perf_counter() - t0)
        checks.append(int(checksum))
    dt = min(times)  # best-of: least tunnel interference

    total_samples = channels * samples_per_step * chain_len
    msps = total_samples / dt / 1e6
    result = {
        "metric": "dmr_pipeline_throughput",
        "value": round(msps, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / 0.048, 1),
        "channels": channels,
        "samples_per_step": samples_per_step,
        "chain_len": chain_len,
        "best_chain_seconds": round(dt, 4),
        "all_chain_seconds": [round(t, 4) for t in times],
        "backend": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
