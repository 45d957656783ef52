"""Do concurrent PROCESSES overlap on the tunneled TPU?

Round-2 finding: within one process, "async" dispatches serialize
(service time ~= RTT + compute, no pipelining), so sustained numbers
carry an ~RTT/unroll floor. This tool checks the next lever: N
independent processes, each dispatching the same unrolled program.
If the terminal serializes the CHIP, aggregate throughput stays flat
as N grows; if sessions pipeline (e.g. RTT of one overlaps compute of
another), aggregate rises toward N x single-process — the
multi-stream serving model.

Usage: python tools/bench_multistream.py [n_procs]
Prints one JSON line: single-process and aggregate samples/s.
"""
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, ".")


def _worker(rank, reps, unroll, centuries, q):
    os.environ.setdefault("JAX_CACHE_DIR", "/tmp/jax_cache")
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        # config update, not env: the TPU plugin overrides JAX_PLATFORMS
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_CACHE_DIR"])
    except Exception:
        pass
    import jax.numpy as jnp
    from digiham_tpu.pipeline import DmrPipeline

    channels = int(os.environ.get("BENCH_CHANNELS", "256"))
    sps = 10
    pipe = DmrPipeline(channels=channels, sps=sps, n_centuries=centuries)
    L = centuries * (100 * sps + 1) + 8
    seed_base = (int(time.time()) + rank * 997) % 1000000
    state0 = pipe.init_state()

    @jax.jit
    def step_k(seed, state0):
        stride = 512
        state = state0
        acc = jnp.int32(0)
        base = jax.random.normal(
            jax.random.key(seed),
            (channels, L + stride * (unroll - 1)), jnp.float32) * 100
        base = jax.lax.optimization_barrier(base)  # one materialization
        for k in range(unroll):
            x = jax.lax.slice_in_dim(base, k * stride, k * stride + L,
                                     axis=1)
            out, state = pipe.step(x, state)
            acc = acc + out["dibits"].astype(jnp.int32).sum()
            state.demod.pos = jnp.zeros_like(state.demod.pos)
        return acc + state.demod.offset.sum()

    for w in range(2):
        int(step_k(seed_base + 900000 + w, state0))
    q.put(("ready", rank))
    # barrier-ish: wait for the go file
    while not os.path.exists("/tmp/multistream_go"):
        time.sleep(0.05)
    t0 = time.perf_counter()
    for r in range(reps):
        int(step_k(seed_base + r + 1, state0))
    q.put(("done", rank, time.perf_counter() - t0,
           reps * unroll * channels * centuries * 1000))


def main(n_procs=2):
    reps = int(os.environ.get("BENCH_REPS", "6"))
    unroll = int(os.environ.get("BENCH_UNROLL", "32"))
    centuries = int(os.environ.get("BENCH_CENTURIES", "16"))
    try:
        os.remove("/tmp/multistream_go")
    except FileNotFoundError:
        pass
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_worker,
                         args=(r, reps, unroll, centuries, q))
             for r in range(n_procs)]
    for p in procs:
        p.start()
    for _ in range(n_procs):
        msg = q.get(timeout=3600)
        assert msg[0] == "ready", msg
    open("/tmp/multistream_go", "w").write("go")
    results = [q.get(timeout=3600) for _ in range(n_procs)]
    for p in procs:
        p.join()
    walls = [r[2] for r in results]
    samples = sum(r[3] for r in results)
    agg = samples / max(walls)
    print(json.dumps({
        "metric": "dmr_pipeline_multistream",
        "n_procs": n_procs,
        "aggregate_msps": round(agg / 1e6, 1),
        "per_proc_wall_s": [round(w, 3) for w in walls],
        "unroll": unroll,
        "reps": reps,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
