"""Sustained production soak on the real TPU: a 64-channel DMR tracked
bank decoding a long noisy voice stream, verifying output correctness
and steady-state stability across many pushes.

The TX stream alternates voice between both TDMA slots; the bank's slot
arbitration (reference dmr_phase.cpp:207-227) passes only the active
slot, so the expected bit-exact count is ONE frame per frame-pair.
Measured round 2: 12,799/12,800 active-slot frames bit-exact over 71
pushes / 36.9M samples (the one loss is initial sync acquisition).
NB the host push loop over this session's TPU tunnel is RTT-bound
(~3.8 s/block: every per-block host fetch pays ~30 ms); fused-pipeline
throughput is measured by bench.py instead."""
import os, sys, time
import numpy as np
import jax
_here = os.path.dirname(__file__)
sys.path.insert(0, os.path.join(_here, ".."))
sys.path.insert(0, os.path.join(_here, "..", "tests"))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from digiham_tpu.pipeline import DmrPipeline
from digiham_tpu.runtime.tracked_bank import TrackedChannelBank
from digiham_tpu.protocols.dmr.phases import pack_dibits
from dmr_synth import voice_frame

C = int(os.environ.get("SOAK_CHANNELS", "64"))
rng = np.random.default_rng(7)
payload = np.tile([1, 3, 0, 2], 27)
want = pack_dibits(payload)
# long stream: 400 voice frames (~12 s of air time per channel)
N_FRAMES = int(os.environ.get("SOAK_FRAMES", "400"))
frames = [voice_frame(s % 2, payload, sync=True) for s in range(N_FRAMES)]
dibits = np.concatenate([np.zeros(30, np.uint8)] + frames)
base = np.repeat(dibits_levels := (np.array([1.,3.,-1.,-3.])/3)[dibits], 10) * 1000
pipe = DmrPipeline(channels=C, sps=10, n_centuries=8)
outputs = {c: b"" for c in range(C)}
# SOAK_MESH=1: run the bank's device calls through the GSPMD mesh path
# (impl="gspmd" step + sharded frame-field decode) over all visible
# devices — the VERDICT round-2 item-7 hardware datapoint (a 1-device
# mesh still exercises the GSPMD program + sharded state placement)
mesh = None
if os.environ.get("SOAK_MESH"):
    from digiham_tpu.parallel import make_mesh
    mesh = make_mesh(n_channel_shards=len(jax.devices()), n_time_shards=1)
    print(f"mesh bank: {len(jax.devices())} device(s), impl=gspmd")
bank = TrackedChannelBank(pipe, on_output=lambda c, d: outputs.__setitem__(c, outputs[c] + d), mesh=mesh)
blocks = 0
t0 = time.perf_counter()
L = base.shape[0]
for lo in range(0, L, 8192):
    seg = base[lo:lo + 8192]
    block = np.stack([seg + rng.normal(0, 60, seg.shape) for _ in range(C)]).astype(np.float32)
    bank.push(block)
    blocks += 1
wall = time.perf_counter() - t0
good = sum(outputs[c].count(want) for c in range(C))
# slot arbitration passes one of the two alternating TDMA slots
expect_per_ch = N_FRAMES // 2
total_frames = expect_per_ch * C
print(f"blocks={blocks} wall={wall:.1f}s "
      f"samples={C*L/1e6:.1f}M ({C*L/wall/1e6:.1f} MS/s through host loop)")
print(f"voice frames bit-exact: {good}/{total_frames} "
      f"({100*good/total_frames:.2f}%)")
ok = good >= total_frames * 0.99
print("TPU SOAK:", "PASS" if ok else "FAIL")
