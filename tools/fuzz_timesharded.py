"""Fuzz the time-sharded tracker bank against the unsharded bank.

Random DMR streams (voice bursts, noise gaps, corruption, optional
clock skew, random chunking, optional mid-stream snapshot/restore)
through TimeShardedTrackedBank on the virtual (channel, time) mesh vs
the unsharded TrackedChannelBank: bytes and metadata events must be
identical. The unsharded bank is itself continuously fuzzed against
the compiled reference binaries (tools/fuzz_tracked.py), so equality
here chains the time-sharded production path to the reference.

Usage: python tools/fuzz_timesharded.py [n_cases] [seed0]
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from digiham_tpu.parallel import make_mesh  # noqa: E402
from digiham_tpu.parallel.streaming import TimeShardedPipeline  # noqa: E402
from digiham_tpu.pipeline import DmrPipeline  # noqa: E402
from digiham_tpu.runtime.meta import PipelineMetaWriter  # noqa: E402
from digiham_tpu.runtime.tracked_bank import (  # noqa: E402
    TimeShardedTrackedBank, TrackedChannelBank)
from dmr_synth import voice_frame  # noqa: E402

LEV = np.array([1.0, 3.0, -1.0, -3.0]) / 3
C = 2


def make_samples(rng):
    parts = [rng.integers(0, 4, int(rng.integers(20, 400)))]
    payload = rng.integers(0, 4, 108)
    for burst in range(int(rng.integers(1, 4))):
        n_frames = int(rng.integers(30, 120))
        parts += [voice_frame(s % 2, payload, sync=True)
                  for s in range(n_frames)]
        parts.append(rng.integers(0, 4, int(rng.integers(50, 600))))
    dibits = np.concatenate([np.asarray(p, np.uint8) for p in parts])
    if rng.random() < 0.4:  # sparse symbol corruption
        idx = rng.random(dibits.size) < 0.005
        dibits = dibits.copy()
        dibits[idx] = rng.integers(0, 4, int(idx.sum()))
    base = np.repeat(LEV[dibits], 10) * 1000
    noise = rng.uniform(20, 70)
    samples = np.stack([base + rng.normal(0, noise, base.shape)
                        for _ in range(C)]).astype(np.float32)
    if rng.random() < 0.5:  # clock skew up to 120 ppm
        skew = rng.uniform(-1.2e-4, 1.2e-4)
        n = samples.shape[1]
        t = np.arange(int(n / (1 + abs(skew)))) * (1 + skew)
        t = np.clip(t, 0, n - 1)
        samples = np.stack([np.interp(t, np.arange(n), samples[c])
                            for c in range(C)]).astype(np.float32)
    return samples


def make_banks(mesh):
    sp = TimeShardedPipeline(mesh, channels=C, protocol="dmr",
                             centuries_per_shard=36)
    out_s = {c: b"" for c in range(C)}
    bank_s = TimeShardedTrackedBank(
        sp, on_output=lambda c, d: out_s.__setitem__(c, out_s[c] + d))
    out_p = {c: b"" for c in range(C)}
    bank_p = TrackedChannelBank(
        DmrPipeline(channels=C, sps=10, n_centuries=4),
        on_output=lambda c, d: out_p.__setitem__(c, out_p[c] + d))
    metas = {"s": [], "p": []}
    for tag, bank in (("s", bank_s), ("p", bank_p)):
        for c in range(C):
            ev = []
            bank.set_meta_writer(c, PipelineMetaWriter(
                lambda b, e=ev: e.append(b.decode())))
            metas[tag].append(ev)
    return bank_s, bank_p, out_s, out_p, metas


def main(n_cases=100, seed0=0):
    mesh = make_mesh(n_channel_shards=2, n_time_shards=2)
    bad = 0
    for i in range(n_cases):
        rng = np.random.default_rng(seed0 + i)
        samples = make_samples(rng)
        bank_s, bank_p, out_s, out_p, metas = make_banks(mesh)
        chunk = int(rng.integers(2048, 16384))
        snap_at = (int(rng.integers(1, samples.shape[1]))
                   if rng.random() < 0.25 else None)
        fed = 0
        for lo in range(0, samples.shape[1], chunk):
            blk = samples[:, lo:lo + chunk]
            bank_s.push(blk)
            bank_p.push(blk)
            fed += blk.shape[1]
            if snap_at is not None and fed >= snap_at:
                bank_s.restore(bank_s.snapshot())  # must be a no-op
                snap_at = None
        bank_s.flush()
        bank_p.flush()
        ok = all(out_s[c] == out_p[c] for c in range(C)) and all(
            "".join(metas["s"][c]) == "".join(metas["p"][c])
            for c in range(C))
        if not ok:
            bad += 1
            np.save(f"/tmp/fuzz_tsh_div_{seed0 + i}.npy", samples)
            print(f"DIVERGENCE seed={seed0 + i} chunk={chunk}")
        if (i + 1) % 10 == 0:
            jax.clear_caches()
            print(f"{i + 1}/{n_cases} cases, {bad} divergences",
                  flush=True)
    print(f"DONE {n_cases} cases, {bad} divergences")
    return bad


if __name__ == "__main__":
    sys.exit(1 if main(*(int(a) for a in sys.argv[1:3])) else 0)
