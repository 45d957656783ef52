#!/bin/bash
# First-session-back hardware recertification (VERDICT round-2 item 1).
#
# Runs the ordered checklist from docs/ROADMAP.md item 2 under the
# DEFAULT axon env, one log per step under /tmp/hw_recert/, skipping
# steps that already completed (marker files) so a flapping tunnel can
# resume where it left off. Run it the moment /tmp/tunnel_status.log
# shows an OK probe:
#
#   bash tools/hw_recert.sh            # full checklist
#   bash tools/hw_recert.sh bench      # just one step by name
#
# Steps (order matters — bench.py first so the driver-visible headline
# exists even if the tunnel dies mid-checklist):
#   bench        bench.py attempt ladder (headline + floor probe)
#   smoke        tools/tpu_smoke.py — all 5 protocols + viterbi parity
#   ser          tools/tpu_ser_equiv.py — precision envelope of the kernels
#   protocols    tools/bench_protocols.py — per-protocol fused throughput
#   trellis      tools/bench_trellis.py — floor-subtracted Viterbi A/B
#   demod        tools/bench_demod_pallas.py — resident vs DMA kernel A/B
#   multistream  tools/bench_multistream.py — dispatch overlap probe
#   msscale      bench_multistream.py 8 — serving-aggregate scaling knee
#   profile      profile_pipeline.py gen/fm/full — stage attribution
#   meshsoak     SOAK_MESH=1 tools/tpu_soak.py — mesh-bank datapoint
set -u
cd "$(dirname "$0")/.."
# Env hooks (used by tests/test_hw_recert_dryrun.py to fault-inject the
# ladder without a backend; production runs leave them unset):
#   HW_RECERT_LOGDIR          where logs + .done markers live
#   HW_RECERT_LAUNCHED_MARKER the watcher's launch latch to clear on abort
#   HW_RECERT_STUB_DIR        if set, run "bash $DIR/<step>.sh" instead of
#                             the real tool, and "bash $DIR/probe.sh" (if
#                             present) instead of the real backend probe
#   HW_RECERT_STUB_TMO        per-step timeout override when stubbed
LOGDIR="${HW_RECERT_LOGDIR:-/tmp/hw_recert}"
LAUNCHED_MARKER="${HW_RECERT_LAUNCHED_MARKER:-/tmp/hw_recert_launched}"
STUB_DIR="${HW_RECERT_STUB_DIR:-}"
mkdir -p "$LOGDIR"
# APPEND to any preset PYTHONPATH — the axon TPU plugin registers via
# /root/.axon_site/sitecustomize.py which the shell exposes through
# PYTHONPATH; clobbering it silently drops the backend (observed round 4).
export PYTHONPATH="$PWD:$PWD/tests${PYTHONPATH:+:$PYTHONPATH}"

probe_ok() {
  # cheap backend liveness check between steps: if the tunnel flapped,
  # abort the run early (every remaining tool would hang to its full
  # timeout) and let the watcher relaunch on the next OK probe
  if [ -n "$STUB_DIR" ] && [ -f "$STUB_DIR/probe.sh" ]; then
    bash "$STUB_DIR/probe.sh" >/dev/null 2>&1
    return $?
  fi
  timeout 150 python - <<'PY' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((8, 128)); assert float((x @ x.T).sum()) > 0
PY
}

run_step() {
  local name="$1" tmo="$2"; shift 2
  local marker="$LOGDIR/$name.done" log="$LOGDIR/$name.log"
  if [ -f "$marker" ]; then echo "== $name: already done (rm $marker to redo)"; return 0; fi
  if ! probe_ok; then
    echo "== $name: SKIPPED — backend probe failed (tunnel down?); aborting run"
    rm -f "$LAUNCHED_MARKER"   # let the watcher relaunch + resume
    exit 3
  fi
  if [ -n "$STUB_DIR" ]; then
    tmo="${HW_RECERT_STUB_TMO:-20}"
    set -- bash "$STUB_DIR/$name.sh"
  fi
  echo "== $name: running (timeout ${tmo}s) -> $log"
  if timeout "$tmo" "$@" > "$log" 2>&1; then
    touch "$marker"; echo "== $name: OK"; tail -n 3 "$log" | sed 's/^/   /'
  else
    echo "== $name: FAILED rc=$? (tunnel flap? re-run to resume)"; tail -n 5 "$log" | sed 's/^/   /'
  fi
}

want="${1:-all}"
step() { [ "$want" = all ] || [ "$want" = "$1" ]; }

# bench.py manages its own per-attempt subprocess timeouts (ladder worst
# case ~6600 s); the outer timeout only guards against harness hangs
step bench       && run_step bench       7200 python bench.py
step smoke       && run_step smoke       2400 python tools/tpu_smoke.py
step ser         && run_step ser         1800 python tools/tpu_ser_equiv.py
step protocols   && run_step protocols   3000 python tools/bench_protocols.py
step trellis     && run_step trellis     1800 python tools/bench_trellis.py
step demod       && run_step demod       2400 env BENCH_ONLY=floor,xla,pallas,pallas-dma BENCH_TILE=32 BENCH_DMA_TILE=64 python tools/bench_demod_pallas.py
step multistream && run_step multistream 1200 python tools/bench_multistream.py
# round-4 additions: the serving-aggregate scaling knee (the chip's real
# capability, docs/HW_CERT_ROUND4.md) and the stage-attribution profile
step msscale     && run_step msscale     2400 python tools/bench_multistream.py 8
step profile     && run_step profile     3000 env PROFILE_STAGES=gen,fm,full python tools/profile_pipeline.py
step meshsoak    && run_step meshsoak    1800 env SOAK_MESH=1 SOAK_FRAMES=200 python tools/tpu_soak.py

echo "== summary =="
for f in "$LOGDIR"/*.log; do
  n=$(basename "$f" .log)
  [ -f "$LOGDIR/$n.done" ] && s=OK || s=PENDING/FAIL
  echo "$n: $s"
done
