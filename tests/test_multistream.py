"""MultiStreamBank: the N-process sharded tracked bank must be
byte-identical to one TrackedChannelBank over the same channels, and its
composite snapshot/restore must preserve the mid-stream checkpoint
contract. (The throughput property it exists for — process-level
dispatch overlap — is hardware-measured in tools/bench_multistream.py /
docs/HW_CERT_ROUND4.md; these tests pin the semantics.)"""
import numpy as np
import pytest

from digiham_tpu.pipeline import DmrPipeline
from digiham_tpu.runtime.multistream import MultiStreamBank
from digiham_tpu.runtime.tracked_bank import TrackedChannelBank

from dmr_synth import voice_frame

FOUR_LEVELS = np.array([1.0, 3.0, -1.0, -3.0], np.float32) / 3.0
SPS = 10


def _synth(channels, n_frames, seed=7):
    rng = np.random.default_rng(seed)
    rows, payloads = [], []
    for c in range(channels):
        payload = rng.integers(0, 4, 108).astype(np.uint8)
        payloads.append(payload)
        frames = [voice_frame(s % 2, payload, sync=True)
                  for s in range(n_frames)]
        dib = np.concatenate(
            [np.tile(np.array([0, 2], np.uint8), 72)]  # one frame of dots
            + frames
            + [np.tile(np.array([0, 2], np.uint8), 72 * 4)])
        rows.append(np.repeat(FOUR_LEVELS[dib], SPS) * 1000.0)
    return np.stack(rows), payloads


def _run_single(samples, channels):
    got = [[] for _ in range(channels)]
    bank = TrackedChannelBank(
        DmrPipeline(channels=channels, sps=SPS, n_centuries=2),
        on_output=lambda c, d: got[c].append(bytes(d)))
    for lo in range(0, samples.shape[1], 4096):
        bank.push(samples[:, lo:lo + 4096])
    return got


def test_multistream_matches_single_bank():
    channels, n_procs = 4, 2
    samples, _ = _synth(channels, n_frames=6)
    ref = _run_single(samples, channels)

    got = [[] for _ in range(channels)]
    with MultiStreamBank("dmr", channels=channels, n_procs=n_procs,
                         on_output=lambda c, d: got[c].append(bytes(d)),
                         pipeline_kwargs={"n_centuries": 2}) as ms:
        for lo in range(0, samples.shape[1], 4096):
            ms.push(samples[:, lo:lo + 4096])

    assert got == ref
    assert any(len(g) > 0 for g in ref)  # the stream actually decoded


def test_multistream_snapshot_restore_midstream():
    channels, n_procs = 2, 2
    samples, _ = _synth(channels, n_frames=8, seed=11)
    cut = samples.shape[1] // 2

    got_a = [[] for _ in range(channels)]
    with MultiStreamBank("dmr", channels=channels, n_procs=n_procs,
                         on_output=lambda c, d: got_a[c].append(bytes(d)),
                         pipeline_kwargs={"n_centuries": 2}) as ms:
        ms.push(samples[:, :cut])
        blob = ms.snapshot()
        ms.push(samples[:, cut:])

    # a FRESH bank restored from the snapshot must continue identically
    got_b = [[] for _ in range(channels)]
    with MultiStreamBank("dmr", channels=channels, n_procs=n_procs,
                         on_output=lambda c, d: got_b[c].append(bytes(d)),
                         pipeline_kwargs={"n_centuries": 2}) as ms2:
        ms2.restore(blob)
        ms2.push(samples[:, cut:])

    # got_a includes pre-cut emissions; recompute the post-cut tail by
    # re-running the first half on a third bank and subtracting counts
    got_pre = [[] for _ in range(channels)]
    with MultiStreamBank("dmr", channels=channels, n_procs=n_procs,
                         on_output=lambda c, d: got_pre[c].append(bytes(d)),
                         pipeline_kwargs={"n_centuries": 2}) as ms3:
        ms3.push(samples[:, :cut])
    tail_a = [a[len(p):] for a, p in zip(got_a, got_pre)]
    assert tail_a == got_b


def test_multistream_rejects_bad_shapes():
    with pytest.raises(ValueError):
        MultiStreamBank("dmr", channels=5, n_procs=2)


def _push_all(bank, samples, kill_at=None, chunk=4096):
    """Push in chunks; SIGKILL worker 1 just before chunk kill_at."""
    import os
    import signal
    for i, lo in enumerate(range(0, samples.shape[1], chunk)):
        if kill_at is not None and i == kill_at:
            victim = bank._procs[1]
            os.kill(victim.pid, signal.SIGKILL)
            victim.join(timeout=30)
        bank.push(samples[:, lo:lo + chunk])


def test_supervised_sigkill_byte_identical():
    """Elastic recovery: SIGKILL a worker mid-stream; the supervised
    bank respawns it, restores the last parent-held snapshot, replays
    the delta, and the output stream stays byte-identical to an
    unkilled run (round-4 VERDICT item 2)."""
    channels = 4
    samples, _ = _synth(channels, n_frames=8, seed=23)
    ref = _run_single(samples, channels)

    for kill_at in (3, 6):
        got = [[] for _ in range(channels)]
        with MultiStreamBank("dmr", channels=channels, n_procs=2,
                             on_output=lambda c, d: got[c].append(bytes(d)),
                             pipeline_kwargs={"n_centuries": 2},
                             supervise=True, replay_limit=2) as ms:
            pid0 = ms._procs[1].pid
            _push_all(ms, samples, kill_at=kill_at)
            assert ms._procs[1].pid != pid0, "worker was never respawned"
            assert ms._procs[1].is_alive()
        joined = [b"".join(g) for g in got]
        assert joined == [b"".join(r) for r in ref], f"kill_at={kill_at}"
    assert any(len(b) > 0 for b in joined)


def test_supervised_kill_then_flush():
    """Death detected on the flush message: recovery replays the buffer
    and re-sends the flush — tail output intact."""
    import os
    import signal
    channels = 2
    samples, _ = _synth(channels, n_frames=6, seed=31)
    cut = (samples.shape[1] // 8192) * 8192 - 4096  # abrupt mid-stream end
    samples = samples[:, :cut]

    def run(kill):
        got = [[] for _ in range(channels)]
        with MultiStreamBank("dmr", channels=channels, n_procs=2,
                             on_output=lambda c, d: got[c].append(bytes(d)),
                             pipeline_kwargs={"n_centuries": 2},
                             supervise=True, replay_limit=3) as ms:
            for lo in range(0, cut, 4096):
                ms.push(samples[:, lo:lo + 4096])
            if kill:
                victim = ms._procs[1]
                os.kill(victim.pid, signal.SIGKILL)
                victim.join(timeout=30)
            ms.flush()
        return [b"".join(g) for g in got]

    assert run(kill=True) == run(kill=False)


def test_supervised_snapshot_restore_still_composes():
    """supervise=True must not change the checkpoint contract."""
    channels = 2
    samples, _ = _synth(channels, n_frames=6, seed=37)
    cut = samples.shape[1] // 2
    got_a = [[] for _ in range(channels)]
    with MultiStreamBank("dmr", channels=channels, n_procs=2,
                         on_output=lambda c, d: got_a[c].append(bytes(d)),
                         pipeline_kwargs={"n_centuries": 2},
                         supervise=True, replay_limit=2) as ms:
        ms.push(samples[:, :cut])
        blob = ms.snapshot()
        ms.push(samples[:, cut:])
    got_b = [[] for _ in range(channels)]
    with MultiStreamBank("dmr", channels=channels, n_procs=2,
                         on_output=lambda c, d: got_b[c].append(bytes(d)),
                         pipeline_kwargs={"n_centuries": 2},
                         supervise=True, replay_limit=2) as ms2:
        ms2.restore(blob)
        ms2.push(samples[:, cut:])
    got_pre = [[] for _ in range(channels)]
    with MultiStreamBank("dmr", channels=channels, n_procs=2,
                         on_output=lambda c, d: got_pre[c].append(bytes(d)),
                         pipeline_kwargs={"n_centuries": 2}) as ms3:
        ms3.push(samples[:, :cut])
    tail_a = [a[len(p):] for a, p in zip(got_a, got_pre)]
    assert tail_a == got_b


def test_restore_rejects_protocol_mismatch():
    with MultiStreamBank("dmr", channels=2, n_procs=2,
                         pipeline_kwargs={"n_centuries": 2}) as ms:
        blob = ms.snapshot()
    with MultiStreamBank("pocsag", channels=2, n_procs=2,
                         pipeline_kwargs={"n_centuries": 2}) as ms2:
        with pytest.raises(ValueError, match="dmr"):
            ms2.restore(blob)


def test_multistream_worker_death_raises():
    """A crashed worker must surface as RuntimeError, not a hang (the
    parent's gather polls worker liveness instead of blocking)."""
    samples, _ = _synth(2, n_frames=2)
    ms = MultiStreamBank("dmr", channels=2, n_procs=2,
                         pipeline_kwargs={"n_centuries": 2})
    try:
        ms._procs[0].terminate()
        ms._procs[0].join(timeout=30)
        with pytest.raises(RuntimeError, match="worker 0 .* died"):
            ms.push(samples[:, :4096])
    finally:
        ms.close()
