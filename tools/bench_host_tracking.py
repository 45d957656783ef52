"""Host control-plane cost in steady state: us per (channel, frame).

Measures the two per-frame host costs of the tracked-bank decode round
on synthesized frame-locked DMR voice traffic:
  field_row       — device-field unpacking into FrameFields
  process_fields  — the FieldsFramePhase hysteresis/dispatch machine
and reports the implied real-time channel capacity per host core
(DMR: 33.3 frames/s/channel). Acquisition (sync hunting on noise) is
excluded by design — production banks gate hunting on the device's
dense sync correlation (tracked_bank._fast_skip), so steady-state
tracking is the per-channel recurring cost.

Usage: JAX_PLATFORMS=cpu python tools/bench_host_tracking.py
Prints one JSON line.
"""
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dmr_synth import data_frame, group_lc, voice_frame  # tests/
    from digiham_tpu.protocols.dmr.components import DATA_TYPE_VOICE_LC
    from digiham_tpu.protocols.dmr.phases import SyncPhase
    from digiham_tpu.runtime.tracked_bank import DmrAdapter

    # synthesize a frame-locked voice transmission (same generator the
    # oracle fuzz uses)
    lc = group_lc(2300042, 2623317)
    payload = np.tile([1, 3, 0, 2], 27)
    frames = []
    for s in range(60):
        if s < 4:
            frames.append(data_frame(s % 2, DATA_TYPE_VOICE_LC, lc))
        else:
            frames.append(voice_frame(s % 2, payload, sync=True))
    stream = np.concatenate(frames).astype(np.uint8)

    hunt = SyncPhase()
    off = 0
    nxt = None
    while nxt is None:
        nxt, c = hunt.process(stream[off:], None)
        off += c
    FS = 144
    n = (len(stream) - off) // FS
    aligned = stream[off:off + n * FS].reshape(n, FS)
    aligned = np.tile(aligned, (20, 1))
    n = aligned.shape[0]

    ad = DmrAdapter()
    host = ad.decode_fields(aligned, jnp)
    rows = [ad.field_row(host, r) for r in range(n)]

    t0 = time.perf_counter()
    for r in range(n):
        ad.field_row(host, r)
    dt_fr = (time.perf_counter() - t0) / n

    tr = ad.make_tracker(ad.make_meta(), 3, nxt)
    t0 = time.perf_counter()
    for f in rows:
        tr.process_fields(f)
    dt_pf = (time.perf_counter() - t0) / n

    per_frame_us = (dt_fr + dt_pf) * 1e6
    fps = 48000 / (FS * 10)  # 33.3 DMR frames/s/channel
    print(json.dumps({
        "metric": "dmr_host_tracking_cost",
        "field_row_us_per_frame": round(dt_fr * 1e6, 2),
        "process_fields_us_per_frame": round(dt_pf * 1e6, 2),
        "total_us_per_frame": round(per_frame_us, 2),
        "realtime_channels_per_core": round(1e6 / (per_frame_us * fps)),
        "frames_measured": n,
    }))


if __name__ == "__main__":
    main()
