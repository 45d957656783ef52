"""In-session stage split of the headline DMR IQ pipeline.

Measures cumulative stage subsets of DmrPipeline.step_iq with the honest
methodology (on-device inputs per rep, K unrolled steps per dispatch, one
scalar checksum fetched per call, async reps): fm -> +rrc -> +demod ->
+sync -> full(+fec). Successive differences attribute per-stage cost
without per-call RTT corrections. Prints one JSON line per subset.

All subsets share one session, so the deltas are A/B-valid (absolute
numbers still carry the documented ~±25% session-to-session variance).
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
    from digiham_tpu.dsp.fm import fm_discriminator
    from digiham_tpu.dsp.rrc import WIDE_RRC, rrc_filter_block
    from digiham_tpu.dsp.demod import gfsk_demod_block
    from digiham_tpu.pipeline import DmrPipeline
    from digiham_tpu.pipeline.dmr import (FRAME_SIZE, dmr_decode_frames,
                                          dmr_sync_correlate)

    channels = int(os.environ.get("BENCH_CHANNELS", "256"))
    sps = 10
    n_cent = int(os.environ.get("BENCH_CENTURIES", "16"))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    unroll = int(os.environ.get("BENCH_UNROLL", "32"))
    pipe = DmrPipeline(channels=channels, sps=sps, n_centuries=n_cent)
    L = n_cent * (100 * sps + 1) + 8
    seed_base = int(time.time()) % 1000000
    state0 = pipe.init_state()

    def subset_step(stage):
        """One pipeline step cut off after `stage`; returns scalar."""

        def run(iq, last_iq, state):
            if stage == "gen":
                # input generation only: sizes the RNG cost, which is a
                # bench harness artifact, not pipeline compute
                return jnp.abs(iq).sum(), last_iq, state
            audio, iq_carry = fm_discriminator(iq, last_iq)
            audio = audio * 5000.0
            if stage == "fm":
                return audio.sum(), iq_carry, state
            filtered, rrc_state = rrc_filter_block(
                audio, state.rrc, WIDE_RRC)
            if stage == "rrc":
                return filtered.sum(), iq_carry, state
            dibits, demod_state = gfsk_demod_block(
                filtered, state.demod, n_cent, sps)
            import dataclasses
            state = dataclasses.replace(state, rrc=rrc_state,
                                        demod=demod_state)
            if stage == "demod":
                return dibits.astype(jnp.int32).sum().astype(
                    jnp.float32), iq_carry, state
            sync = dmr_sync_correlate(dibits)
            if stage == "sync":
                return (dibits.astype(jnp.int32).sum()
                        + sync.sum()).astype(jnp.float32), iq_carry, state
            n_frames = n_cent * 100 // FRAME_SIZE
            frames = dibits[:, :n_frames * FRAME_SIZE].reshape(
                channels, n_frames, FRAME_SIZE)
            fields = dmr_decode_frames(frames)
            acc = (dibits.astype(jnp.int32).sum() + sync.sum()
                   + fields["voice_payload"].astype(jnp.int32).sum()
                   + fields["bptc_data"].sum() + fields["sync_type"].sum()
                   + fields["tact_slot"].sum())
            return acc.astype(jnp.float32), iq_carry, state

        return run

    def make_step_k(stage):
        run = subset_step(stage)

        @jax.jit
        def step_k(seed, state0):
            # same input scheme as bench.py: one random base stream per
            # dispatch, per-step overlapping strided windows (input HBM
            # read and distinctness kept; harness cost out of the loop)
            stride = 512
            state = state0
            last_iq = jnp.ones((channels,), jnp.complex64)
            acc = jnp.float32(0)
            key = jax.random.key(seed)
            kr, ki = jax.random.split(key)
            LB = L + stride * (unroll - 1)
            base = (jax.random.normal(kr, (channels, LB), jnp.float32)
                    + 1j * jax.random.normal(ki, (channels, LB),
                                             jnp.float32)
                    ).astype(jnp.complex64)
            base = jax.lax.optimization_barrier(base)  # one materialization
            for k in range(unroll):
                iq = jax.lax.slice_in_dim(base, k * stride,
                                          k * stride + L, axis=1)
                s, last_iq, state = run(iq, last_iq, state)
                acc = acc + s
                state.demod.pos = jnp.zeros_like(state.demod.pos)
            return (acc + state.demod.offset.sum()
                    + state.demod.volume_ring.sum()
                    + state.rrc.history.sum())

        return step_k

    stages = os.environ.get(
        "PROFILE_STAGES", "fm,rrc,demod,sync,full").split(",")
    prev = None
    for stage in stages:
        step_k = make_step_k(stage)
        try:
            for w in range(2):
                float(step_k(seed_base + 900000 + w, state0))
        except Exception as e:
            print(json.dumps({"stage": stage, "error": repr(e)[:400]}))
            continue
        t0 = time.perf_counter()
        cks = [step_k(seed_base + r + 1, state0) for r in range(reps)]
        checks = [float(c) for c in cks]
        wall = time.perf_counter() - t0
        dt = wall / (reps * unroll)
        row = {
            "stage_cutoff": stage,
            "per_step_ms": round(dt * 1e3, 4),
            "delta_ms": None if prev is None else round((dt - prev) * 1e3,
                                                        4),
            "distinct_checksums": len(set(checks)),
            "backend": jax.devices()[0].platform,
        }
        prev = dt
        print(json.dumps(row))


if __name__ == "__main__":
    main()
