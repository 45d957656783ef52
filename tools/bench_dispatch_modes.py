"""Dispatch-mode A/B: manual unroll vs lax.fori_loop step chaining.

Round-1 measured lax.scan-of-pipeline-steps at ~30 ms/step (stacked
per-step outputs force conservative buffering). A fori_loop with only a
scalar+carry and inputs taken as dynamic windows of one base stream has
none of that — if it runs at unrolled speed, benches can chain hundreds
of steps in a tiny program (no ~RTT/unroll floor, no giant-program
remote-compile failures).

Variants (per mode, K steps of the 256ch DMR demod or full pipeline):
  unroll: python-unrolled steps (the current bench structure)
  fori:   lax.fori_loop body, input via lax.dynamic_slice_in_dim

Prints one JSON line per (stage, mode).
"""
import json
import os
import time


def main():
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from digiham_tpu.dsp.demod import DemodState, demod_init, \
        gfsk_demod_block
    from digiham_tpu.pipeline import DmrPipeline

    channels = int(os.environ.get("BENCH_CHANNELS", "256"))
    sps = 10
    n_cent = int(os.environ.get("BENCH_CENTURIES", "16"))
    reps = int(os.environ.get("BENCH_REPS", "6"))
    unroll = int(os.environ.get("BENCH_UNROLL", "64"))
    stages = os.environ.get("BENCH_STAGES", "demod,pipeline").split(",")
    L = n_cent * (100 * sps + 1) + 8
    stride = 512
    LB = L + stride * (unroll - 1)
    seed_base = int(time.time()) % 1000000

    pipe = DmrPipeline(channels=channels, sps=sps, n_centuries=n_cent)

    def demod_step(x, state):
        dib, st = gfsk_demod_block(x, state, n_cent, sps)
        return dib.astype(jnp.int32).sum(), DemodState(
            jnp.zeros_like(st.pos), st.offset, st.volume_ring)

    def pipe_step(x, state):
        out, st = pipe.step(x, state)
        st.demod.pos = jnp.zeros_like(st.demod.pos)
        # consume EVERY output tensor so no field decode is dead code
        acc = sum(jnp.sum(v).astype(jnp.int32)
                  for v in jax.tree.leaves(out))
        return acc, st

    def consume(state):
        leaves = jax.tree.leaves(state)
        return sum(x.sum().astype(jnp.float32) for x in leaves)

    def make(mode, step, state0):
        @jax.jit
        def run(seed, state0):
            base = jax.random.normal(jax.random.key(seed),
                                     (channels, LB), jnp.float32) * 300
            base = jax.lax.optimization_barrier(base)  # one materialization

            if mode == "unroll":
                acc = jnp.float32(0)
                state = state0
                for k in range(unroll):
                    x = jax.lax.slice_in_dim(base, k * stride,
                                             k * stride + L, axis=1)
                    a, state = step(x, state)
                    acc = acc + a.astype(jnp.float32)
                return acc + consume(state)

            def body(k, carry):
                acc, state = carry
                x = jax.lax.dynamic_slice_in_dim(base, k * stride, L, 1)
                a, state = step(x, state)
                return acc + a.astype(jnp.float32), state

            acc, state = jax.lax.fori_loop(
                0, unroll, body, (jnp.float32(0), state0))
            return acc + consume(state)
        return run

    for stage in stages:
        step, state0 = ((demod_step, demod_init(channels))
                        if stage == "demod"
                        else (pipe_step, pipe.init_state()))
        for mode in ("fori", "unroll"):
            run = make(mode, step, state0)
            try:
                for w in range(2):
                    float(run(seed_base + 900000 + w, state0))
            except Exception as e:
                print(json.dumps({"stage": stage, "mode": mode,
                                  "error": repr(e)[:400]}), flush=True)
                continue
            t0 = time.perf_counter()
            cks = [run(seed_base + r + 1, state0) for r in range(reps)]
            checks = [float(c) for c in cks]
            wall = time.perf_counter() - t0
            dt = wall / (reps * unroll)
            print(json.dumps({
                "stage": stage, "mode": mode,
                "per_step_ms": round(dt * 1e3, 4),
                "msamples_per_s": round(
                    channels * n_cent * 1000 / dt / 1e6, 1),
                "distinct_checksums": len(set(checks)),
                "backend": jax.devices()[0].platform,
            }), flush=True)


if __name__ == "__main__":
    main()
