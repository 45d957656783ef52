"""Headline benchmark: raw-IQ DMR decode throughput on one chip.

Measures the fused device pipeline (FM quadrature discriminator -> RRC
FIR -> 4FSK demod -> dense sync correlation -> batched per-frame FEC
decode) over a 256-channel bank (BASELINE.json configs[4]) and reports
Msamples/s/chip of raw IQ consumed — the BASELINE.json metric.

RTT-proof methodology (this session's TPU sits behind a tunnel with
~30-80 ms per-dispatch latency and a byte-identical-call result cache):
- ONE jit program executes K dependent pipeline steps, manually unrolled
  (state threaded step->step; lax.scan measured ~30 ms/step overhead on
  this backend, so unroll instead);
- IQ inputs are generated ON DEVICE inside the program, keyed by the
  rep seed, so inputs differ every rep and nothing crosses the tunnel;
- the program returns a SINGLE scalar checksum that consumes every
  output tensor and the final carry state;
- the HEADLINE is sustained wall-clock throughput: N calls dispatched
  async, every checksum fetched to host (``int(ck)`` — on this backend
  block_until_ready alone does NOT wait), total samples / total wall
  seconds. No RTT probe is subtracted.
- round-2 finding: this tunnel SERIALIZES dispatches (a trivial
  program's sustained time equals ~RTT regardless of async depth), so
  every per-step number carries a floor of ~RTT/unroll. unroll=128
  amortizes it to ~0.2 ms/step; the floor is also measured directly
  (same-unroll trivial program) and reported as
  ``dispatch_floor_per_step`` so the reader can see how much of the
  headline is tunnel, not compute. The headline itself stays
  unsubtracted.

Baseline: the reference is a real-time single-channel CPU pipeline at
48 kS/s per channel (BASELINE.md). ``vs_baseline`` is the number of
reference real-time channels one chip sustains: value_msps / 0.048.

Prints ONE JSON line.
"""
import json
import os
import sys
import time

import numpy as np


# (unroll, centuries, subprocess timeout s, extra env): the ladder
# exists because the remote compiler has failed on very large unrolled
# programs (observed: 128 x 16-century pipeline steps > 60 min; one
# tile=64 kernel config crashed the compile helper outright). Each
# attempt runs in a subprocess with a hard timeout; the first success
# wins. Smaller unrolls carry a larger serialized-dispatch floor
# (~RTT/unroll), so the ladder is ordered most-honest-first. A completed
# server-side compile is cached, so a retry after a timeout often starts
# warm. Rung 1 is the round-5 production program (planar ingest +
# fused-front kernel, both hardware-certified); rung 3 falls back to
# the two-stage chain (DIGIHAM_FUSED_FRONT=0) and rung 4 to the exact
# round-4-certified complex-ingest program, in case a new-program class
# ever trips the remote compile helper.
ATTEMPTS = [(128, 16, 2400, {}), (64, 32, 1500, {}),
            (128, 16, 1500, {"DIGIHAM_FUSED_FRONT": "0"}),
            (128, 16, 1500, {"DIGIHAM_FUSED_FRONT": "0",
                             "BENCH_INGEST": "complex"}),
            (32, 16, 1200, {})]


def _fail_json(kind: str, detail: str) -> None:
    """One parseable JSON line on stdout so an unattended driver run
    never expires with nothing (round 2 lost its whole capture window
    to a tunnel outage that hung backend init for hours)."""
    print(json.dumps({
        "metric": "dmr_iq_pipeline_throughput",
        "value": None,
        "unit": "Msamples/s/chip",
        "backend": kind,
        "error": detail[-400:],
    }))


def probe() -> None:
    """Subprocess body: prove the backend can init + execute + fetch."""
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp
    v = int(jnp.arange(8).sum())  # fetch to host: RTT + exec proven
    print(f"probe ok backend={jax.devices()[0].platform} v={v}")


def _run_multistream_once(n, unroll, env_base, limit):
    """One tools/bench_multistream.py run; returns its parsed JSON or a
    dict with an "error" key (the stage must stay diagnosable, not die)."""
    import subprocess
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "bench_multistream.py")
    env = dict(env_base, BENCH_UNROLL=str(unroll))
    try:
        r = subprocess.run([sys.executable, tool, str(n)], env=env,
                           timeout=limit, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return {"n_procs": n, "unroll": unroll,
                "error": f"timeout>{limit:.0f}s"}
    ms_line = next((ln for ln in r.stdout.splitlines()
                    if ln.startswith("{")), None)
    if r.returncode != 0 or not ms_line:
        return {"n_procs": n, "unroll": unroll,
                "error": f"rc={r.returncode}: {r.stderr.strip()[-200:]}"}
    return json.loads(ms_line)


def _ms_verdict(ms, single_msps):
    """Classify one multistream run: 'stable', or why it is not.

    Collapse signatures (docs/HW_CERT_ROUND4.md + the round-4 driver
    artifact, BENCH_r04.json 739 MS/s at the certified 36,305 point):
    - uneven per-proc walls (one straggler / runtime collapse:
      observed 2.7-27 s walls at 8x128) -> wall_ratio > 3;
    - aggregate below what the processes would deliver with NO overlap
      benefit at all: N procs must beat ~0.25 x N x single-stream
      (certified scaling is 0.45-0.75x N; 739 MS/s was 0.014x N).
    """
    if "error" in ms:
        return ms["error"]
    walls = ms.get("per_proc_wall_s") or []
    ratio = (max(walls) / min(walls)) if walls else 1.0
    if ratio > 3.0:
        return f"uneven walls (max/min {ratio:.1f})"
    if single_msps and ms["aggregate_msps"] < 0.25 * ms["n_procs"] * \
            single_msps:
        return (f"aggregate {ms['aggregate_msps']} < 0.25 x "
                f"{ms['n_procs']} x single {single_msps:.0f}")
    return "stable"


def _with_multistream(line: str) -> str:
    """Append the multi-process aggregate to a successful headline line.

    Round-4 hardware finding: within one process the tunnel serializes
    dispatches, but separate processes overlap — the chip saturates near
    8 concurrent streams (1/2/4/8/16 procs -> 3.2/6.4/11.0/24.0/27.0
    GS/s, docs/HW_CERT_ROUND4.md), so the aggregate is the chip's real
    serving capability and belongs next to the single-stream headline.

    Collapse guard (round-4 driver artifact recorded 739 MS/s at the
    certified 8x64 point — 49x below cert): every run is classified by
    _ms_verdict; on collapse the stage backs off (fewer procs, then
    lower unroll) and reports the best STABLE config, carrying the full
    per-proc diagnostics and every attempt's verdict so the artifact is
    self-diagnosing. BENCH_MULTISTREAM=0 disables; on CPU backends it
    only runs when BENCH_MULTISTREAM=force (keeps unit tests fast).
    """
    mode = os.environ.get("BENCH_MULTISTREAM", "1")
    if mode == "0":
        return line
    try:
        head = json.loads(line)
        if head.get("backend") != "tpu" and mode != "force":
            return line
        n = int(os.environ.get("BENCH_MULTISTREAM_PROCS", "8"))
        u = int(os.environ.get("BENCH_MS_UNROLL", "64"))
        env_base = dict(os.environ,
                        BENCH_CENTURIES=os.environ.get(
                            "BENCH_MS_CENTURIES", "16"),
                        BENCH_REPS="6")
        limit = float(os.environ.get("BENCH_MULTISTREAM_TIMEOUT", "1500"))
        single = head.get("value") or 0.0
        # backoff ladder: certified sweet spot first, then fewer procs,
        # then lower unroll (smaller programs stress the runtime less).
        # BENCH_MS_BACKOFF=0 pins the stage to the single requested
        # config (still classified + diagnosed, never silently retried).
        lo_u = max(u // 2, 1)
        # The certified point is retried ONCE before backing off: a
        # one-time per-session stall (idle-session executable eviction,
        # seen as a single 11 s rank-0 wall in the r5 validation run)
        # pollutes exactly one attempt and vanishes on retry — backing
        # off immediately would under-report the chip by ~2x.
        ladder = [(n, u), (n, u), (max(n // 2, 1), u), (n, lo_u),
                  (max(n // 2, 1), lo_u)]
        if os.environ.get("BENCH_MS_BACKOFF", "1") == "0":
            ladder = ladder[:1]
        seen, attempts = set(), []
        best, best_verdict = None, None
        for idx, (np_, u_) in enumerate(ladder):
            if (np_, u_) in seen:
                continue
            if idx != 0:  # rung 0 stays unseen so its retry (rung 1) runs
                seen.add((np_, u_))
            ms = _run_multistream_once(np_, u_, env_base, limit)
            verdict = _ms_verdict(ms, single)
            attempts.append({"n_procs": np_, "unroll": u_,
                             "aggregate_msps": ms.get("aggregate_msps"),
                             "per_proc_wall_s": ms.get("per_proc_wall_s"),
                             "verdict": verdict})
            if verdict == "stable":
                best, best_verdict = ms, verdict
                break
            if "error" not in ms and (
                    best is None or ms["aggregate_msps"] >
                    best["aggregate_msps"]):
                best, best_verdict = ms, verdict  # best unstable fallback
        if best is not None:
            head["multistream"] = {
                "n_procs": best["n_procs"],
                "aggregate_msps": best["aggregate_msps"],
                "aggregate_vs_baseline": round(
                    best["aggregate_msps"] / 0.048, 1),
                "unroll": best["unroll"],
                "per_proc_wall_s": best.get("per_proc_wall_s"),
                "stable": best_verdict == "stable",
            }
            if not head["multistream"]["stable"]:
                head["multistream"]["collapse_diagnosis"] = best_verdict
            if len(attempts) > 1:
                head["multistream"]["attempts"] = attempts
            return json.dumps(head)
        print(f"# multistream stage: no attempt produced a number: "
              f"{attempts}", file=sys.stderr)
    except Exception as e:  # never lose the headline to the extra stage
        print(f"# multistream stage error: {e!r}", file=sys.stderr)
    return line


def orchestrate() -> int:
    import subprocess
    # backend-availability precheck: a hung tunnel must cost ~90 s and
    # produce structured output, not eat the driver's whole window
    if not os.environ.get("BENCH_SKIP_PROBE"):
        limit = float(os.environ.get("BENCH_PROBE_TIMEOUT", "90"))
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=dict(os.environ, BENCH_PROBE="1"),
                timeout=limit, capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            _fail_json("unavailable",
                       f"backend init/execute hung > {limit:.0f}s")
            return 2
        if r.returncode != 0:
            _fail_json("unavailable", r.stderr.strip() or "probe failed")
            return 2
        print(f"# {r.stdout.strip()}", file=sys.stderr)
    # an explicitly pinned workload (either knob) gets exactly one
    # attempt — never silently change what the user asked to measure
    pinned = bool(os.environ.get("BENCH_UNROLL")
                  or os.environ.get("BENCH_CENTURIES"))
    attempts = ATTEMPTS[:1] if pinned else ATTEMPTS
    if os.environ.get("BENCH_LADDER"):  # testing: "u,c,t[,K=V];..."
        def _parse(a):
            parts = a.split(",")
            extra = dict(kv.split("=", 1) for kv in parts[3:])
            return (int(parts[0]), int(parts[1]), int(parts[2]), extra)
        attempts = [_parse(a)
                    for a in os.environ["BENCH_LADDER"].split(";")]
    for unroll, cent, limit, extra in attempts:
        env = dict(os.environ,
                   BENCH_ATTEMPT="1",
                   BENCH_UNROLL=os.environ.get("BENCH_UNROLL",
                                               str(unroll)),
                   BENCH_CENTURIES=os.environ.get("BENCH_CENTURIES",
                                                  str(cent)),
                   **extra)
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=limit, capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print(f"# bench attempt unroll={env['BENCH_UNROLL']} "
                  f"centuries={env['BENCH_CENTURIES']} timed out after "
                  f"{limit}s; falling back", file=sys.stderr)
            continue
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")), None)
        if r.returncode == 0 and line:
            print(_with_multistream(line))
            return 0
        print(f"# bench attempt unroll={env['BENCH_UNROLL']} failed "
              f"(rc={r.returncode}): {r.stderr.strip()[-400:]}",
              file=sys.stderr)
    _fail_json("attempts_exhausted", "every ladder attempt failed/timed out")
    return 1


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
    from digiham_tpu.pipeline import DmrPipeline

    channels = int(os.environ.get("BENCH_CHANNELS", "256"))
    sps = 10
    # 16 centuries (333 ms of air time per step) measured ~8% higher
    # throughput than 8 and equal to 32 — the throughput-optimal block
    # size; latency-sensitive streaming deployments would pick 8
    n_cent = int(os.environ.get("BENCH_CENTURIES", "16"))
    reps = int(os.environ.get("BENCH_REPS", "8"))  # async in-flight calls
    unroll = int(os.environ.get("BENCH_UNROLL", "128"))

    pipe = DmrPipeline(channels=channels, sps=sps, n_centuries=n_cent)
    samples_per_step = n_cent * 100 * sps  # per channel, consumed
    # size the window so the demod kernel never right-pads (jnp.pad
    # materializes a full-block copy per step — 16.8 MB at 256x16c)
    from digiham_tpu.ops.demod_pallas import preferred_block_len
    L = max(n_cent * (100 * sps + 1) + 8,
            preferred_block_len(n_cent, sps, pipe.rrc_design.ntaps
                                if pipe.rrc_design else 0))
    # time-based seed base defeats the backend's cross-run result cache
    seed_base = int(time.time()) % 1000000

    def rebase(st):
        # bench blocks are self-contained: restart the demod read index
        # each step (streaming drivers instead trim + carry the remainder)
        st.demod.pos = jnp.zeros_like(st.demod.pos)
        return st

    def checksum(out):
        return (out["dibits"].astype(jnp.int32).sum()
                + out["sync_dist_dense"].sum()
                + out["voice_payload"].astype(jnp.int32).sum()
                + out["bptc_data"].sum()
                + out["sync_type"].sum()
                + out["tact_slot"].sum())

    # Ingest layout: "planar" (default, round 5) feeds I/Q component
    # planes through step_iq_planes — the honest production layout on
    # this hardware (the tunnel cannot transfer complex64 at all, so
    # real ingest IS planar; measured +19% over the complex program at
    # 8 procs x unroll 32, the complex split/combine was pure cost).
    # BENCH_INGEST=complex reproduces the round-4 complex64 program.
    ingest = os.environ.get("BENCH_INGEST", "planar")

    @jax.jit
    def step_k(seed, state0):
        """K dependent raw-IQ pipeline steps, one dispatch, scalar out.

        Input generation: ONE random base stream per dispatch; each step
        reads a distinct overlapping [C, L] window of it (stride 512 —
        lane-aligned so the window is a zero-copy view, and the
        production streaming access pattern). Profiling showed the
        original per-step threefry normal() alone cost 0.97 ms — 57% of
        the measured step — pure harness artifact (production reads IQ
        from HBM, it does not synthesize it), and a per-step jnp.roll
        derivation still cost ~0.2 ms of copy traffic. Strided window
        reads keep the per-step HBM input read (fused into the FM
        discriminator) and keep inputs distinct per step (no XLA CSE),
        so the timed region is the pipeline plus an honest fresh-input
        read, nothing less.
        """
        stride = 512
        state = state0
        acc = jnp.int32(0)
        key = jax.random.key(seed)
        kr, ki = jax.random.split(key)
        LB = L + stride * (unroll - 1)
        # force ONE materialization: without the barrier XLA may fuse the
        # threefry generation into every consumer step (see bench_fir.py)
        if ingest == "planar":
            base_re = jax.lax.optimization_barrier(
                jax.random.normal(kr, (channels, LB), jnp.float32))
            base_im = jax.lax.optimization_barrier(
                jax.random.normal(ki, (channels, LB), jnp.float32))
            last_re = jnp.ones((channels,), jnp.float32)
            last_im = jnp.zeros((channels,), jnp.float32)
            for k in range(unroll):
                re = jax.lax.slice_in_dim(base_re, k * stride,
                                          k * stride + L, axis=1)
                im = jax.lax.slice_in_dim(base_im, k * stride,
                                          k * stride + L, axis=1)
                out, (last_re, last_im), state = pipe.step_iq_planes(
                    re, im, last_re, last_im, state)
                acc = acc + checksum(out)
                state = rebase(state)
        else:
            last_iq = jnp.ones((channels,), jnp.complex64)
            base = (jax.random.normal(kr, (channels, LB), jnp.float32)
                    + 1j * jax.random.normal(ki, (channels, LB),
                                             jnp.float32)
                    ).astype(jnp.complex64)
            base = jax.lax.optimization_barrier(base)
            for k in range(unroll):
                iq = jax.lax.slice_in_dim(base, k * stride,
                                          k * stride + L, axis=1)
                out, last_iq, state = pipe.step_iq(iq, last_iq, state)
                acc = acc + checksum(out)
                state = rebase(state)
        # consume the final carry so no step's state update is dead code
        acc = (acc
               + state.demod.volume_ring.sum().astype(jnp.int32)
               + state.demod.offset.sum()
               + state.rrc.history.sum().astype(jnp.int32))
        return acc

    @jax.jit
    def floor_k(seed):
        """Same-unroll trivial program: measures the serialized-dispatch
        floor (~RTT/unroll per step) that every step number carries."""
        acc = jnp.float32(0)
        base = jax.random.normal(jax.random.key(seed), (8, 256),
                                 jnp.float32)
        for k in range(unroll):
            acc = acc + (base * (k + 1)).sum()
        return acc

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

    state0 = pipe.init_state()
    # compile + warmup twice: first executions absorb deferred backend
    # compilation (observed 2-6 min on this tunnel even after a cache-hit
    # client compile). int() forces the value to host — on this backend
    # block_until_ready alone returns before execution finishes.
    for w in range(2):
        int(step_k(seed_base + 900000 + w, state0))

    # serial per-call latency (transparency: includes one full RTT each)
    serial = []
    for r in range(3):
        t0 = time.perf_counter()
        int(step_k(seed_base + 800000 + r, state0))
        serial.append(time.perf_counter() - t0)

    # headline: sustained async throughput, single wall-clock window.
    # Transient-stall guard: the serving runtime occasionally stalls a
    # whole async window (observed round 4: 46 s/call while serial calls
    # measured 0.10 s seconds earlier — host contention / server hiccup).
    # If the sustained window is wildly slower than the serial calls it
    # cannot be compute (async ≤ serial by construction), so re-measure
    # up to twice and keep the fastest window; retries are reported.
    serial_med = sorted(serial)[len(serial) // 2]
    wall = None
    retries = 0
    for attempt in range(3):
        t0 = time.perf_counter()
        cks = [step_k(seed_base + 1000 * attempt + rep + 1, state0)
               for rep in range(reps)]
        checks = [int(c) for c in cks]  # fetch every result to host
        w = time.perf_counter() - t0
        assert len(set(checks)) > 1 or reps == 1, (
            "identical outputs across reps — stale-result cache suspected")
        wall = w if wall is None else min(wall, w)
        if w <= 2.0 * serial_med * reps:
            break
        retries += 1
    rtt = measure_rtt()
    # serialized-dispatch floor at this unroll (trivial program)
    for w in range(2):
        float(floor_k(seed_base + 700000 + w))
    t0 = time.perf_counter()
    for r in range(3):
        float(floor_k(seed_base + 710000 + r))
    floor_step = (time.perf_counter() - t0) / (3 * unroll)
    n_steps = reps * unroll
    dt_step = wall / n_steps

    total_samples = channels * samples_per_step
    msps = total_samples / dt_step / 1e6
    # BASELINE.json north star also names "frames decoded/s": every
    # 144-dibit frame window in the block is field-decoded on device
    frames_per_step = channels * (n_cent * 100 // 144)
    result = {
        "metric": "dmr_iq_pipeline_throughput",
        "value": round(msps, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / 0.048, 1),
        "frames_decoded_per_s": round(frames_per_step / dt_step, 0),
        "channels": channels,
        "samples_per_step": samples_per_step,
        "unroll": unroll,
        "async_calls": reps,
        "sustained_wall_seconds": round(wall, 4),
        "per_step_seconds": round(dt_step, 6),
        "serial_call_seconds": [round(t, 5) for t in serial],
        "tunnel_rtt_seconds": round(rtt, 5),
        "dispatch_floor_per_step": round(floor_step, 6),
        "rep_checksums": checks,
        "backend": jax.devices()[0].platform,
    }
    if retries:
        result["sustained_window_retries"] = retries
    # provenance: which demod kernel produced this headline. DMA staging
    # is the default (round-4 A/B); rung 3 sets DIGIHAM_DEMOD_DMA=0 to
    # force the resident twin — parse the value, "0" is falsy here.
    v = os.environ.get("DIGIHAM_DEMOD_DMA")
    result["demod_dma"] = True if v is None else v not in ("0", "false", "")
    result["ingest"] = ingest
    fv = os.environ.get("DIGIHAM_FUSED_FRONT")
    result["fused_front"] = bool(fv) and fv not in ("0", "false", "")
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("BENCH_PROBE"):
        probe()
    elif os.environ.get("BENCH_ATTEMPT"):
        main()
    else:
        sys.exit(orchestrate())
