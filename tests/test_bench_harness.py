"""bench.py orchestration harness: backend precheck + attempt ladder.

Round-2 postmortem (VERDICT.md): the driver's unattended bench run
expired with rc=124 and *no parseable output* because backend init hung
during a tunnel outage. The contract under test: whatever happens,
``python bench.py`` prints exactly one parseable JSON line and fails
fast when the backend is down.
"""
import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def _run(env_extra, timeout=600):
    env = dict(os.environ, **env_extra)
    # subprocesses must not inherit the axon platform: BENCH_PLATFORM is
    # applied via jax.config (the env var alone is overridden by the plugin)
    env.setdefault("BENCH_PLATFORM", "cpu")
    return subprocess.run([sys.executable, BENCH], env=env,
                          timeout=timeout, capture_output=True, text=True)


def _json_lines(stdout):
    return [json.loads(ln) for ln in stdout.splitlines()
            if ln.startswith("{")]


def test_backend_unavailable_fails_fast_with_json():
    r = _run({"BENCH_PLATFORM": "no_such_backend",
              "BENCH_PROBE_TIMEOUT": "60"})
    assert r.returncode == 2, r.stderr[-800:]
    lines = _json_lines(r.stdout)
    assert len(lines) == 1
    assert lines[0]["backend"] == "unavailable"
    assert lines[0]["value"] is None
    assert lines[0]["metric"] == "dmr_iq_pipeline_throughput"
    assert lines[0]["error"]


def test_ladder_exhaustion_emits_structured_failure():
    # 1-second per-attempt timeouts: both rungs must time out, and the
    # orchestrator must still print one parseable JSON line (rc=1)
    r = _run({"BENCH_LADDER": "128,16,1;64,32,1"})
    assert r.returncode == 1, r.stderr[-800:]
    lines = _json_lines(r.stdout)
    assert len(lines) == 1
    assert lines[0]["backend"] == "attempts_exhausted"
    assert lines[0]["value"] is None


def test_ladder_success_after_fallback():
    # first rung times out instantly; second rung is a tiny real run on
    # CPU — the orchestrator must fall back and print the success line
    r = _run({"BENCH_LADDER": "128,16,1;4,1,540",
              "BENCH_CHANNELS": "8", "BENCH_REPS": "2",
              "BENCH_SKIP_PROBE": "1"})
    assert r.returncode == 0, (r.stderr[-1500:], r.stdout[-500:])
    lines = _json_lines(r.stdout)
    assert len(lines) == 1
    out = lines[0]
    assert out["backend"] == "cpu"
    assert out["value"] > 0
    assert out["unroll"] == 4
    assert out["channels"] == 8
    # CPU backend: the multistream stage must stay out of the way
    # (it only runs on tpu or under BENCH_MULTISTREAM=force)
    assert "multistream" not in out


def test_multistream_stage_merges_into_headline():
    # force the multi-process aggregate stage on CPU at a tiny config:
    # the orchestrator must print ONE line with the merged field
    r = _run({"BENCH_LADDER": "4,1,540",
              "BENCH_CHANNELS": "8", "BENCH_REPS": "2",
              "BENCH_SKIP_PROBE": "1",
              "BENCH_MULTISTREAM": "force",
              "BENCH_MULTISTREAM_PROCS": "2",
              "BENCH_MS_BACKOFF": "0",  # deterministic: one attempt
              "BENCH_MS_UNROLL": "4", "BENCH_MS_CENTURIES": "1"},
             timeout=900)
    assert r.returncode == 0, (r.stderr[-1500:], r.stdout[-500:])
    lines = _json_lines(r.stdout)
    assert len(lines) == 1
    ms = lines[0].get("multistream")
    assert ms, (r.stderr[-800:], lines[0])
    assert ms["n_procs"] == 2
    assert ms["aggregate_msps"] > 0
    assert ms["aggregate_vs_baseline"] > 0
    # round-5 collapse-guard contract: diagnostics always present
    assert "stable" in ms
    assert len(ms["per_proc_wall_s"]) == 2


def test_ms_verdict_classification():
    """The collapse classifier: certified-shaped runs are stable; the
    round-4 driver artifact (739 MS/s at 8x64 with single-stream 6585)
    and uneven-wall collapses are flagged with a reason."""
    sys.path.insert(0, os.path.dirname(BENCH))
    import bench

    good = {"n_procs": 8, "aggregate_msps": 36305.0,
            "per_proc_wall_s": [8.1, 8.3, 8.2, 8.0, 8.4, 8.1, 8.2, 8.3]}
    assert bench._ms_verdict(good, 6774.0) == "stable"
    # the BENCH_r04.json failure mode: healthy-looking walls, collapsed
    # aggregate far below the no-overlap bound
    slow = {"n_procs": 8, "aggregate_msps": 739.1,
            "per_proc_wall_s": [60.0] * 8}
    assert "aggregate" in bench._ms_verdict(slow, 6585.0)
    # the documented 8x128 collapse mode: uneven 2.7-27 s walls
    uneven = {"n_procs": 8, "aggregate_msps": 20000.0,
              "per_proc_wall_s": [2.7, 3.0, 3.1, 2.9, 26.9, 3.2, 3.0, 2.8]}
    assert "uneven" in bench._ms_verdict(uneven, 6774.0)
    err = {"n_procs": 8, "unroll": 64, "error": "timeout>1500s"}
    assert bench._ms_verdict(err, 6774.0) == "timeout>1500s"
