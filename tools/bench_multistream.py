"""Do concurrent PROCESSES overlap on the tunneled TPU?

Round-2 finding: within one process, "async" dispatches serialize
(service time ~= RTT + compute, no pipelining), so sustained numbers
carry an ~RTT/unroll floor. This tool checks the next lever: N
independent processes, each dispatching the same unrolled program.
If the terminal serializes the CHIP, aggregate throughput stays flat
as N grows; if sessions pipeline (e.g. RTT of one overlaps compute of
another), aggregate rises toward N x single-process — the
multi-stream serving model.

Round-4 finding: the sweet spot (8 procs x unroll 64) COLLAPSED in the
driver's unattended run (739 MS/s vs 36,305 certified — uneven walls,
the 8x128 collapse mode at 8x64). This tool therefore reports per-proc
walls + per-rep times so a collapse is diagnosable from the artifact,
and bench.py's wrapper detects collapse and retries at smaller configs.

Usage: python tools/bench_multistream.py [n_procs]
Env: BENCH_PROTOCOL=dmr|ysf|nxdn|dstar|pocsag (default dmr),
     BENCH_UNROLL / BENCH_CENTURIES / BENCH_REPS / BENCH_CHANNELS.
     BENCH_STAGE=step (default) runs the production fused step;
     fm / rrc / demod / fm_rrc / step_iq run stage prefixes of the
     raw-IQ chain instead — under process overlap the aggregate
     reflects CHIP time, so stage deltas at saturation attribute the
     fused step's per-stage cost (single-stream deltas sit under the
     serialized-dispatch floor and resolve nothing — round-5 finding).
Prints one JSON line: aggregate samples/s + per-proc diagnostics.
"""
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

# the GO barrier is a per-run file: a FIXED path let any stale file
# (crashed sibling run, killed ladder stage) release workers before the
# parent finished collecting readies — observed round 5 as an
# AssertionError('done' during the ready phase) that killed a whole
# attribution stage. The parent passes its unique path to every worker.
GO_PREFIX = "/tmp/multistream_go"


def _make_pipe(protocol, channels, centuries):
    """Per-protocol fused pipeline at its production sps (same configs
    as tools/bench_protocols.py; centuries scales the block)."""
    from digiham_tpu.pipeline import (DmrPipeline, FskPipeline,
                                      NxdnPipeline, YsfPipeline)
    if protocol == "dmr":
        return DmrPipeline(channels=channels, sps=10, n_centuries=centuries)
    if protocol == "ysf":
        return YsfPipeline(channels=channels, sps=10, n_centuries=centuries)
    if protocol == "nxdn":
        return NxdnPipeline(channels=channels, sps=20,
                            n_centuries=centuries)
    if protocol == "dstar":
        return FskPipeline(channels=channels, protocol="dstar",
                           n_centuries=centuries)
    if protocol == "pocsag":
        return FskPipeline(channels=channels, protocol="pocsag",
                           n_centuries=centuries)
    raise ValueError(f"unknown protocol {protocol!r}")


def _make_stage_step(stage, pipe, channels, centuries, sps, L, unroll):
    """Stage-prefix programs of the raw-IQ fused chain, bench.py
    methodology (one on-device base stream, strided per-step windows,
    scalar checksum). Used for saturated stage ATTRIBUTION only — the
    production serving number stays BENCH_STAGE=step."""
    import jax
    import jax.numpy as jnp
    from digiham_tpu.dsp.demod import demod_init, gfsk_demod_block
    from digiham_tpu.dsp.fm import fm_discriminator
    from digiham_tpu.dsp.rrc import WIDE_RRC, RrcState, rrc_filter_block

    stride = 512
    LB = L + stride * (unroll - 1)

    def f32_base(seed):
        base = jax.random.normal(jax.random.key(seed), (channels, LB),
                                 jnp.float32) * 100
        return jax.lax.optimization_barrier(base)

    def iq_base(seed):
        kr, ki = jax.random.split(jax.random.key(seed))
        base = (jax.random.normal(kr, (channels, LB), jnp.float32)
                + 1j * jax.random.normal(ki, (channels, LB), jnp.float32)
                ).astype(jnp.complex64)
        return jax.lax.optimization_barrier(base)

    def win(base, k):
        return jax.lax.slice_in_dim(base, k * stride, k * stride + L,
                                    axis=1)

    if stage == "fm":
        @jax.jit
        def step_k(seed, state0):
            base = iq_base(seed)
            acc = jnp.float32(0)
            last = jnp.ones((channels,), jnp.complex64)
            for k in range(unroll):
                audio, last = fm_discriminator(win(base, k), last)
                acc = acc + audio.sum()
            return acc
    elif stage == "rrc":
        @jax.jit
        def step_k(seed, state0):
            base = f32_base(seed)
            acc = jnp.float32(0)
            rrc = RrcState.init(channels, WIDE_RRC)
            for k in range(unroll):
                y, rrc = rrc_filter_block(win(base, k), rrc, WIDE_RRC)
                acc = acc + y.sum()
            return acc
    elif stage == "fm_rrc":
        @jax.jit
        def step_k(seed, state0):
            base = iq_base(seed)
            acc = jnp.float32(0)
            last = jnp.ones((channels,), jnp.complex64)
            rrc = RrcState.init(channels, WIDE_RRC)
            for k in range(unroll):
                audio, last = fm_discriminator(win(base, k), last)
                y, rrc = rrc_filter_block(audio * 5000.0, rrc, WIDE_RRC)
                acc = acc + y.sum()
            return acc
    elif stage == "demod":
        @jax.jit
        def step_k(seed, state0):
            base = f32_base(seed)
            acc = jnp.float32(0)
            dm = demod_init(channels)
            for k in range(unroll):
                dib, dm = gfsk_demod_block(win(base, k), dm, centuries,
                                           sps)
                acc = acc + dib.astype(jnp.float32).sum()
                dm.pos = jnp.zeros_like(dm.pos)
            return acc + dm.offset.sum()
    elif stage == "step_iq":
        @jax.jit
        def step_k(seed, state0):
            base = iq_base(seed)
            acc = jnp.float32(0)
            last = jnp.ones((channels,), jnp.complex64)
            state = state0
            for k in range(unroll):
                out, last, state = pipe.step_iq(win(base, k), last, state)
                acc = acc + sum(jnp.sum(v.astype(jnp.float32))
                                for v in jax.tree.leaves(out))
                state.demod.pos = jnp.zeros_like(state.demod.pos)
            return acc + state.demod.offset.sum()
    elif stage == "step_iq_planes":
        # planar raw-IQ ingest (the production layout on this tunnel —
        # complex64 host transfer is unimplemented); with
        # DIGIHAM_FUSED_FRONT=1 this is the fully-fused one-kernel chain
        @jax.jit
        def step_k(seed, state0):
            kr, ki = jax.random.split(jax.random.key(seed))
            bre = jax.lax.optimization_barrier(
                jax.random.normal(kr, (channels, LB), jnp.float32))
            bim = jax.lax.optimization_barrier(
                jax.random.normal(ki, (channels, LB), jnp.float32))
            acc = jnp.float32(0)
            lre = jnp.ones((channels,), jnp.float32)
            lim = jnp.zeros((channels,), jnp.float32)
            state = state0
            for k in range(unroll):
                out, (lre, lim), state = pipe.step_iq_planes(
                    win(bre, k), win(bim, k), lre, lim, state)
                acc = acc + sum(jnp.sum(v.astype(jnp.float32))
                                for v in jax.tree.leaves(out))
                state.demod.pos = jnp.zeros_like(state.demod.pos)
            return acc + state.demod.offset.sum()
    else:
        raise ValueError(f"unknown BENCH_STAGE {stage!r}")
    return step_k


def _worker(rank, reps, unroll, centuries, protocol, q, go_file):
    """Crash containment: ANY worker exception is reported to the parent
    as an ("error", rank, traceback) message — a silently-dead worker
    left the parent blocked in q.get for the full timeout (observed
    round 5), which is exactly the unattended-run failure mode this
    tool must never have."""
    try:
        _worker_body(rank, reps, unroll, centuries, protocol, q, go_file)
    except BaseException:
        import traceback
        q.put(("error", rank, traceback.format_exc()[-1500:]))
        raise


def _worker_body(rank, reps, unroll, centuries, protocol, q, go_file):
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

    channels = int(os.environ.get("BENCH_CHANNELS", "256"))
    stage = os.environ.get("BENCH_STAGE", "step")
    pipe = _make_pipe(protocol, channels, centuries)
    sps = pipe.sps
    # pad-free window length (see ops.demod_pallas.preferred_block_len)
    from digiham_tpu.ops.demod_pallas import preferred_block_len
    ntaps = pipe.rrc_design.ntaps if pipe.rrc_design else 0
    L = max(centuries * (100 * sps + 1) + 8,
            preferred_block_len(centuries, sps, ntaps))
    seed_base = (int(time.time()) + rank * 997) % 1000000
    state0 = pipe.init_state()

    if stage == "step":
        @jax.jit
        def step_k(seed, state0):
            stride = 512
            state = state0
            acc = jnp.float32(0)
            base = jax.random.normal(
                jax.random.key(seed),
                (channels, L + stride * (unroll - 1)), jnp.float32) * 100
            base = jax.lax.optimization_barrier(base)  # one materialization
            for k in range(unroll):
                x = jax.lax.slice_in_dim(base, k * stride, k * stride + L,
                                         axis=1)
                out, state = pipe.step(x, state)
                acc = acc + sum(jnp.sum(v.astype(jnp.float32))
                                for v in jax.tree.leaves(out))
                state.demod.pos = jnp.zeros_like(state.demod.pos)
            return acc + state.demod.offset.sum()
    else:
        step_k = _make_stage_step(stage, pipe, channels, centuries, sps,
                                  L, unroll)

    # Warmup with retry: even after worker 0 populates the client-side
    # persistent cache, each session still installs the executable via
    # its own remote_compile helper, and concurrent installs can fail
    # transiently ("response body closed" — observed NXDN/POCSAG round 5).
    # Rank-staggered backoff de-synchronizes the retries.
    for attempt in range(4):
        try:
            for w in range(2):
                float(step_k(seed_base + 900000 + w, state0))
            break
        except Exception:
            if attempt == 3:
                raise
            time.sleep(2.0 + 1.5 * rank + 5.0 * attempt)
    q.put(("ready", rank))
    # Barrier-ish: wait for the go file — WITH a keepalive. Under the
    # staggered launch, worker 0 warms first and then idles for the
    # minutes the other ranks take to warm; its server-side session goes
    # cold and the re-install stall lands in the first TIMED rep
    # (observed in BENCH_r05 validation: an 11.3 s rank-0 wall vs 0.38 s
    # siblings, misclassified as uneven-walls collapse). Re-executing
    # the same program every ~10 s keeps every session hot until GO.
    last, ka = time.perf_counter(), 0
    while not os.path.exists(go_file):
        time.sleep(0.05)
        if os.getppid() == 1:
            return  # parent died: don't orphan-hammer the chip forever
        if time.perf_counter() - last > 10.0:
            ka += 1
            float(step_k(seed_base + 800000 + ka, state0))
            last = time.perf_counter()
    rep_times = []
    t0 = time.perf_counter()
    for r in range(reps):
        t1 = time.perf_counter()
        float(step_k(seed_base + r + 1, state0))
        rep_times.append(time.perf_counter() - t1)
    q.put(("done", rank, time.perf_counter() - t0,
           reps * unroll * channels * centuries * 100 * sps, rep_times))


def main(n_procs=2):
    reps = int(os.environ.get("BENCH_REPS", "6"))
    unroll = int(os.environ.get("BENCH_UNROLL", "32"))
    centuries = int(os.environ.get("BENCH_CENTURIES", "16"))
    protocol = os.environ.get("BENCH_PROTOCOL", "dmr")
    go_file = f"{GO_PREFIX}.{os.getpid()}"
    try:
        os.remove(go_file)
    except FileNotFoundError:
        pass
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_worker,
                         args=(r, reps, unroll, centuries, protocol, q,
                               go_file))
             for r in range(n_procs)]
    # Cold-cache stagger: 8 workers starting at once each see a compile
    # cache miss and fire CONCURRENT remote compiles — the observed
    # round-5 failure mode (all 8 workers died; the round-4 driver's
    # 739 MS/s collapse is consistent with the same storm degrading the
    # serving runtime). Start worker 0 alone so its warmup populates the
    # persistent cache; the rest then start and hit it. BENCH_STAGGER=0
    # restores the all-at-once launch for A/B.
    stagger = os.environ.get("BENCH_STAGGER", "1") != "0" and n_procs > 1

    pending = []  # out-of-phase messages, kept for their own collect

    def collect(expect, n):
        """n messages of kind `expect`; an ("error", ...) message aborts
        with a parseable JSON line (unattended-driver contract). A
        message of another kind is stashed, not fatal — an unattended
        run must survive phase skew, not die on an assert."""
        got = [m for m in pending if m[0] == expect][:n]
        for m in got:
            pending.remove(m)
        while len(got) < n:
            msg = q.get(timeout=3600)
            if msg[0] == "error":
                print(json.dumps({
                    "metric": f"{protocol}_pipeline_multistream",
                    "aggregate_msps": None,
                    "error": f"worker {msg[1]}: {msg[2][-600:]}"}))
                for p in procs:
                    if p.pid is not None and p.is_alive():
                        p.terminate()
                sys.exit(1)
            if msg[0] == expect:
                got.append(msg)
            else:
                pending.append(msg)
        return got

    if stagger:
        procs[0].start()
        collect("ready", 1)
        for p in procs[1:]:
            p.start()
        collect("ready", n_procs - 1)
    else:
        for p in procs:
            p.start()
        collect("ready", n_procs)
    open(go_file, "w").write("go")
    try:
        results = collect("done", n_procs)
    finally:
        try:
            os.remove(go_file)
        except FileNotFoundError:
            pass
    for p in procs:
        p.join()
    results.sort(key=lambda r: r[1])  # by rank
    walls = [r[2] for r in results]
    samples = sum(r[3] for r in results)
    agg = samples / max(walls)
    rep_max = [max(r[4]) for r in results]
    stage = os.environ.get("BENCH_STAGE", "step")
    print(json.dumps({
        "metric": f"{protocol}_pipeline_multistream",
        "protocol": protocol,
        "stage": stage,
        "n_procs": n_procs,
        "aggregate_msps": round(agg / 1e6, 1),
        "per_proc_wall_s": [round(w, 3) for w in walls],
        "wall_ratio": round(max(walls) / min(walls), 2),
        "per_proc_max_rep_s": [round(t, 3) for t in rep_max],
        "unroll": unroll,
        "centuries": centuries,
        "reps": reps,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
