"""Floor-subtracted stage attribution of the fused raw-IQ DMR step.

Which stage owns the remaining per-step time? bench.py's headline is the
whole fused program (FM discriminator -> RRC FIR -> century demod ->
sync correlate -> frame decode); this tool times PREFIXES of that chain
under the exact bench.py methodology (one dispatch of K unrolled steps
over strided windows of one on-device base stream, scalar checksum
fetched per call, same-unroll trivial floor probe) so consecutive-row
differences attribute per-stage cost with the dispatch floor removed.

Rows:
    floor      trivial same-unroll program (the serialized-dispatch floor)
    fm         FM quadrature discriminator only
    fm_rrc     + RRC banded-matmul FIR
    fm_demod   + century demod kernel (the DMA Pallas production path)
    full       + dense sync correlate + batched frame decode (= bench.py)

Numbers include ~25% session noise (CLAUDE.md); only same-session
deltas are meaningful. Prints one JSON line per row.
"""
import json
import os
import time


def main():
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        # config update, not env: the TPU plugin overrides JAX_PLATFORMS
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from digiham_tpu.dsp.demod import demod_init, gfsk_demod_block
    from digiham_tpu.dsp.fm import fm_discriminator
    from digiham_tpu.dsp.rrc import WIDE_RRC, RrcState, rrc_filter_block
    from digiham_tpu.pipeline import DmrPipeline

    channels = int(os.environ.get("BENCH_CHANNELS", "256"))
    sps = 10
    n_cent = int(os.environ.get("BENCH_CENTURIES", "16"))
    reps = int(os.environ.get("BENCH_REPS", "6"))
    unroll = int(os.environ.get("BENCH_UNROLL", "32"))
    L = n_cent * (100 * sps + 1) + 8
    seed_base = int(time.time()) % 1000000
    pipe = DmrPipeline(channels=channels, sps=sps, n_centuries=n_cent)
    samples_per_step = n_cent * 100 * sps

    def make_step(body, init_carry):
        """body(iq, carry) -> (scalar, carry); K unrolled strided steps."""

        @jax.jit
        def step_k(seed):
            stride = 512
            acc = jnp.int32(0)
            carry = init_carry()
            kr, ki = jax.random.split(jax.random.key(seed))
            LB = L + stride * (unroll - 1)
            base = (jax.random.normal(kr, (channels, LB), jnp.float32)
                    + 1j * jax.random.normal(ki, (channels, LB),
                                             jnp.float32)
                    ).astype(jnp.complex64)
            base = jax.lax.optimization_barrier(base)
            for k in range(unroll):
                iq = jax.lax.slice_in_dim(base, k * stride,
                                          k * stride + L, axis=1)
                s, carry = body(iq, carry)
                acc = acc + s
            return acc

        return step_k

    def fm_body(iq, carry):
        audio, last = fm_discriminator(iq, carry)
        return audio.sum().astype(jnp.int32), last

    def fm_rrc_body(iq, carry):
        last_iq, rrc = carry
        audio, last_iq = fm_discriminator(iq, last_iq)
        filtered, rrc = rrc_filter_block(audio * 5000.0, rrc, WIDE_RRC)
        return filtered.sum().astype(jnp.int32), (last_iq, rrc)

    def fm_demod_body(iq, carry):
        last_iq, rrc, dm = carry
        audio, last_iq = fm_discriminator(iq, last_iq)
        filtered, rrc = rrc_filter_block(audio * 5000.0, rrc, WIDE_RRC)
        dib, dm = gfsk_demod_block(filtered, dm, n_cent, sps)
        dm.pos = jnp.zeros_like(dm.pos)
        return dib.astype(jnp.int32).sum(), (last_iq, rrc, dm)

    def full_body(iq, carry):
        last_iq, state = carry
        out, last_iq, state = pipe.step_iq(iq, last_iq, state)
        state.demod.pos = jnp.zeros_like(state.demod.pos)
        s = (out["dibits"].astype(jnp.int32).sum()
             + out["sync_dist_dense"].sum()
             + out["voice_payload"].astype(jnp.int32).sum())
        return s, (last_iq, state)

    ones = lambda: jnp.ones((channels,), jnp.complex64)
    variants = {
        "fm": make_step(fm_body, ones),
        "fm_rrc": make_step(
            fm_rrc_body, lambda: (ones(), RrcState.init(channels))),
        "fm_demod": make_step(
            fm_demod_body,
            lambda: (ones(), RrcState.init(channels),
                     demod_init(channels))),
        "full": make_step(
            full_body, lambda: (ones(), pipe.init_state())),
    }

    @jax.jit
    def floor_k(seed):
        acc = jnp.float32(0)
        base = jax.random.normal(jax.random.key(seed), (8, 256),
                                 jnp.float32)
        for k in range(unroll):
            acc = acc + (base * (k + 1)).sum()
        return acc

    only = os.environ.get("BENCH_ONLY")
    if only:
        variants = {k: v for k, v in variants.items()
                    if k in only.split(",")}

    # floor first: trivial compile, establishes the session's dispatch
    # floor before the heavyweight programs run
    for w in range(2):
        float(floor_k(seed_base + 700000 + w))
    t0 = time.perf_counter()
    for r in range(3):
        float(floor_k(seed_base + 710000 + r))
    floor_step = (time.perf_counter() - t0) / (3 * unroll)
    print(json.dumps({"variant": "floor",
                      "per_step_ms": round(floor_step * 1e3, 4),
                      "unroll": unroll}), flush=True)

    rows = {}
    for name, step_k in variants.items():
        try:
            for w in range(2):
                int(step_k(seed_base + 900000 + w))
        except Exception as e:
            print(json.dumps({"variant": name,
                              "error": repr(e)[:400]}), flush=True)
            continue
        t0 = time.perf_counter()
        cks = [step_k(seed_base + r + 1) for r in range(reps)]
        checks = [int(c) for c in cks]
        wall = time.perf_counter() - t0
        dt = wall / (reps * unroll)
        rows[name] = dt
        print(json.dumps({
            "variant": name,
            "per_step_ms": round(dt * 1e3, 4),
            "minus_floor_ms": round((dt - floor_step) * 1e3, 4),
            "msps": round(channels * samples_per_step / dt / 1e6, 1),
            "distinct_checksums": len(set(checks)),
            "backend": jax.devices()[0].platform,
        }), flush=True)

    # consecutive-prefix deltas = per-stage attribution
    order = ["fm", "fm_rrc", "fm_demod", "full"]
    have = [n for n in order if n in rows]
    deltas = {}
    prev = floor_step
    prev_name = "floor"
    for n in have:
        deltas[f"{prev_name}->{n}"] = round((rows[n] - prev) * 1e3, 4)
        prev, prev_name = rows[n], n
    print(json.dumps({"stage_deltas_ms": deltas}), flush=True)


if __name__ == "__main__":
    main()
