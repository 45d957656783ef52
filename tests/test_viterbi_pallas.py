"""Pallas trellis kernel vs the XLA scan and the numpy reference oracle.

The kernel's arithmetic is exact (integer-valued f32), so the contract
is BIT-IDENTITY — bits, metrics, and both reference tie-breaking rules
(k=0 wins equal metrics; lowest-numbered final state wins) on clean,
noisy, and adversarially tie-heavy inputs, across batch-padding edges
(B < 128, B = 128, B = 129).
"""
import numpy as np
import pytest

from digiham_tpu.fec.viterbi import (
    conv_encode,
    viterbi_decode,
    viterbi_decode_np,
)
from digiham_tpu.ops.viterbi_pallas import viterbi_decode_pallas


def _compare(obs, blocked_steps=0):
    got_b, got_m = viterbi_decode_pallas(
        obs, 16, blocked_steps, interpret=True)
    want_b, want_m = viterbi_decode(obs, 16, blocked_steps, impl="xla")
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(want_b))
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))
    ref_b, ref_m = viterbi_decode_np(obs, 16, blocked_steps)
    np.testing.assert_array_equal(np.asarray(got_b), ref_b)
    np.testing.assert_array_equal(np.asarray(got_m), ref_m)


@pytest.mark.parametrize("batch", [1, 5, 128, 129])
def test_clean_roundtrip_and_padding(batch):
    rng = np.random.default_rng(batch)
    bits = rng.integers(0, 2, (batch, 100))
    obs = conv_encode(bits, 16)
    got_b, got_m = viterbi_decode_pallas(obs, 16, 0, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_b), bits)
    assert np.all(np.asarray(got_m) == 0)


@pytest.mark.parametrize("seed", range(3))
def test_noisy_bitexact_vs_scan_and_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    bits = rng.integers(0, 2, (37, 100))
    obs = conv_encode(bits, 16)
    flips = rng.random(obs.shape) < 0.12
    obs = np.where(flips, obs ^ rng.integers(1, 4, obs.shape), obs)
    _compare(obs)


def test_pure_noise_ties():
    """Uniform-random dibits maximize metric ties — the tie-breaking
    rules must match exactly."""
    rng = np.random.default_rng(7)
    obs = rng.integers(0, 4, (64, 100))
    _compare(obs)
    # constant observations: every path equal — lowest state must win
    _compare(np.zeros((4, 48), np.int64))
    _compare(np.full((4, 48), 3, np.int64))


@pytest.mark.parametrize("seed", range(2))
def test_nxdn_blocked_start_states(seed):
    """blocked_steps=4 (NXDN SACCH/FACCH prior-knowledge window)."""
    rng = np.random.default_rng(200 + seed)
    bits = rng.integers(0, 2, (30, 30))
    bits[:, :4] = 0  # NXDN's known leading zeros
    obs = conv_encode(bits, 16)
    flips = rng.random(obs.shape) < 0.1
    obs = np.where(flips, obs ^ rng.integers(1, 4, obs.shape), obs)
    _compare(obs, blocked_steps=4)


def test_multidim_batch_shape():
    rng = np.random.default_rng(9)
    obs = rng.integers(0, 4, (3, 4, 60))
    got_b, got_m = viterbi_decode_pallas(obs, 16, 0, interpret=True)
    want_b, want_m = viterbi_decode(obs, 16, 0, impl="xla")
    assert got_b.shape == (3, 4, 60) and got_m.shape == (3, 4)
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(want_b))
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))


def test_forced_pallas_dispatch_matches(monkeypatch):
    """DIGIHAM_VITERBI_PALLAS=1 routes viterbi_decode through the kernel
    (interpret mode off-TPU) with identical results; ysf_decode_frames
    stays bit-identical end to end."""
    import jax.numpy as jnp

    from digiham_tpu.pipeline.ysf import ysf_decode_frames

    monkeypatch.setenv("DIGIHAM_VITERBI_PALLAS", "1")
    rng = np.random.default_rng(11)
    # fresh shapes: jit caches by (shape, static impl), so the env var
    # is only re-read on a fresh trace
    obs = rng.integers(0, 4, (5, 68))
    got_b, got_m = viterbi_decode(obs, 16, 0)
    want_b, want_m = viterbi_decode(obs, 16, 0, impl="xla")
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(want_b))
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))
    frames = rng.integers(0, 4, (2, 7, 480)).astype(np.uint8)
    forced = ysf_decode_frames(jnp.asarray(frames), impl="auto")
    base = ysf_decode_frames(jnp.asarray(frames), impl="xla")
    for k in base:
        np.testing.assert_array_equal(
            np.asarray(base[k]), np.asarray(forced[k]),
            err_msg=f"field {k}")


def test_shorter_than_peel_window():
    """T < blocked_steps must peel only T steps (the XLA scan's
    min(blocked_steps, T) contract) — not read/write out of bounds."""
    rng = np.random.default_rng(77)
    for T in (1, 2, 3):
        obs = rng.integers(0, 4, (5, T))
        pb, pm = viterbi_decode_pallas(obs, 16, 4, interpret=True)
        xb, xm = viterbi_decode(obs, 16, 4, impl="xla")
        np.testing.assert_array_equal(np.asarray(pb), np.asarray(xb))
        np.testing.assert_array_equal(np.asarray(pm), np.asarray(xm))
