"""Fused Pallas century-demod kernel vs the XLA scan path.

Runs in interpret mode on CPU. The two programs differ only in float
summation order (MXU selection-matmuls vs XLA reductions); symbol
decisions must agree on healthy-margin signals and the integer carry
(pos, offset) must be exact.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from digiham_tpu.ops import pallas_fir_available
from digiham_tpu.ops.demod_pallas import pallas_demod_block
from digiham_tpu.dsp.demod import (DemodState, demod_init, fsk_demod_block,
                                   gfsk_demod_block)

pytestmark = pytest.mark.skipif(not pallas_fir_available(),
                                reason="pallas unavailable")

LEVELS = np.array([1.0, 3.0, -1.0, -3.0]) / 3.0


def _gfsk_sig(rng, channels, n_sym, sps, noise):
    tx = rng.integers(0, 4, (channels, n_sym))
    sig = np.repeat(LEVELS[tx], sps, axis=-1) * 1000
    sig = sig + rng.normal(0, noise * 1000, sig.shape)
    return sig.astype(np.float32)


def _assert_state_match(sa: DemodState, sb: DemodState):
    np.testing.assert_array_equal(np.asarray(sa.pos), np.asarray(sb.pos))
    np.testing.assert_array_equal(np.asarray(sa.offset),
                                  np.asarray(sb.offset))
    np.testing.assert_allclose(np.asarray(sa.volume_ring),
                               np.asarray(sb.volume_ring), rtol=2e-6)


@pytest.mark.parametrize("channels,noise", [(8, 0.05), (16, 0.12)])
def test_gfsk_matches_xla(channels, noise):
    rng = np.random.default_rng(channels + int(noise * 100))
    n_cent, sps = 4, 10
    sig = jnp.asarray(_gfsk_sig(rng, channels, n_cent * 100 + 4, sps, noise))
    st = demod_init(channels)
    want, st_x = gfsk_demod_block(sig, st, n_cent, sps)
    got, st_p = pallas_demod_block(sig, st, n_cent, sps, mode="gfsk",
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    _assert_state_match(st_p, st_x)


def test_gfsk_matches_xla_large_block():
    """The bench ladder runs up to 32 centuries per step; cover a large
    block so the batched post-loop AGC's segmented scans and the
    contiguous dibit output stay exact at scale."""
    rng = np.random.default_rng(321)
    channels, n_cent, sps = 8, 32, 10
    sig = jnp.asarray(_gfsk_sig(rng, channels, n_cent * 100 + 4, sps, 0.1))
    st = demod_init(channels)
    want, st_x = gfsk_demod_block(sig, st, n_cent, sps)
    got, st_p = pallas_demod_block(sig, st, n_cent, sps, mode="gfsk",
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    _assert_state_match(st_p, st_x)


def test_gfsk_streaming_carry():
    """Multi-block stream: the (pos, offset, ring) carry chains exactly,
    with stream-driver-style pos rebasing between blocks."""
    rng = np.random.default_rng(7)
    channels, n_cent, sps = 8, 3, 10
    n_blocks = 3
    L_blk = n_cent * (100 * sps + 1) + 64
    full = _gfsk_sig(rng, channels,
                     (n_blocks * L_blk) // sps + 16, sps, 0.08)
    st_x = st_p = demod_init(channels)
    base = 0
    for b in range(n_blocks):
        blk = jnp.asarray(full[:, base:base + L_blk])
        want, st_x = gfsk_demod_block(blk, st_x, n_cent, sps)
        got, st_p = pallas_demod_block(blk, st_p, n_cent, sps, mode="gfsk",
                                       interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        _assert_state_match(st_p, st_x)
        # rebase like the stream driver: drop consumed samples, shift pos
        shift = int(np.asarray(st_x.pos).min())
        base += shift
        st_x = DemodState(st_x.pos - shift, st_x.offset, st_x.volume_ring)
        st_p = DemodState(st_p.pos - shift, st_p.offset, st_p.volume_ring)


def test_gfsk_sps20_matches_xla():
    """NXDN configuration (sps=20)."""
    rng = np.random.default_rng(20)
    channels, n_cent, sps = 8, 2, 20
    tx = rng.integers(0, 4, (channels, n_cent * 100 + 4))
    sig = np.repeat(LEVELS[tx], sps, axis=-1) * 800
    sig = (sig + rng.normal(0, 60, sig.shape)).astype(np.float32)
    sig = jnp.asarray(sig)
    st = demod_init(channels)
    want, st_x = gfsk_demod_block(sig, st, n_cent, sps)
    got, st_p = pallas_demod_block(sig, st, n_cent, sps, mode="gfsk",
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    _assert_state_match(st_p, st_x)


@pytest.mark.parametrize("invert", [False, True])
def test_fsk_matches_xla(invert):
    rng = np.random.default_rng(40 + invert)
    channels, n_cent, sps = 8, 2, 40
    tx = rng.integers(0, 2, (channels, n_cent * 100 + 4))
    sig = np.repeat(np.array([-1.0, 1.0])[tx], sps, axis=-1) * 800
    sig = (sig + rng.normal(0, 60, sig.shape)).astype(np.float32)
    sig = jnp.asarray(sig)
    st = demod_init(channels)
    want, st_x = fsk_demod_block(sig, st, n_cent, sps, invert)
    got, st_p = pallas_demod_block(sig, st, n_cent, sps, mode="fsk",
                                   invert=invert, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    _assert_state_match(st_p, st_x)


def test_pallas_under_shard_map():
    """The Pallas kernel composes with shard_map channel sharding (the
    production mesh-bank topology on TPU): per-shard interpret-mode
    kernel output equals the unsharded XLA path."""
    import jax
    from jax.sharding import PartitionSpec as P

    from digiham_tpu.dsp.demod import _demod_block_xla
    from digiham_tpu.ops.demod_pallas import pallas_demod_block
    from digiham_tpu.parallel import make_mesh

    rng = np.random.default_rng(21)
    channels, n_cent, sps = 16, 2, 10
    sig = jnp.asarray(_gfsk_sig(rng, channels, n_cent * 100 + 4, sps, 0.07))
    st = demod_init(channels)
    want, st_x = _demod_block_xla(sig, st, n_cent, sps, "gfsk", False)

    mesh = make_mesh(n_channel_shards=2, n_time_shards=1)

    def shard_fn(x, pos, off, ring):
        d, s = pallas_demod_block(
            x, DemodState(pos, off, ring), n_cent, sps, mode="gfsk",
            interpret=True)
        return d, s.pos, s.offset, s.volume_ring

    f = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("channel"),) * 4,
        out_specs=(P("channel"),) * 4,
        check_vma=False)  # pallas_call provides no vma info
    got, pos, off, ring = f(sig, st.pos, st.offset, st.volume_ring)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    _assert_state_match(DemodState(pos, off, ring), st_x)


def test_dma_under_shard_map():
    """dma=True composes with shard_map channel sharding exactly like
    the resident kernel (the mesh-bank topology runs Pallas per-shard)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from digiham_tpu.parallel import make_mesh

    rng = np.random.default_rng(33)
    channels, n_cent, sps = 16, 2, 10
    sig = jnp.asarray(_gfsk_sig(rng, channels, n_cent * 100 + 4, sps, 0.07))
    st = demod_init(channels)
    want, st_x = gfsk_demod_block(sig, st, n_cent, sps)
    mesh = make_mesh(n_channel_shards=2, n_time_shards=1)

    def shard_fn(x, pos, off, ring):
        d, s = pallas_demod_block(
            x, DemodState(pos, off, ring), n_cent, sps, mode="gfsk",
            interpret=True, dma=True)
        return d, s.pos, s.offset, s.volume_ring

    f = jax.shard_map(shard_fn, mesh=mesh,
                      in_specs=(P("channel"),) * 4,
                      out_specs=(P("channel"),) * 4,
                      check_vma=False)
    got, pos, off, ring = f(sig, st.pos, st.offset, st.volume_ring)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    _assert_state_match(DemodState(pos, off, ring), st_x)


def test_auto_dispatch_guard():
    """_demod_block_auto: Pallas branch for in-range pos, XLA fallback
    branch past the shift bound — both match the plain XLA path."""
    from digiham_tpu.dsp.demod import _demod_block_auto, _demod_block_xla
    from digiham_tpu.ops.demod_pallas import POS_GUARD

    rng = np.random.default_rng(3)
    channels, n_cent, sps = 8, 2, 10
    far = POS_GUARD  # beyond the guard => must take the rebase branch
    sig = _gfsk_sig(rng, channels, n_cent * 100 + 8, sps, 0.05)
    sig = np.concatenate(
        [np.zeros((channels, far), np.float32), sig], axis=-1)
    sig = jnp.asarray(sig)
    for pos0 in (4, far + 4):
        st = DemodState(
            pos=jnp.full((channels,), pos0, jnp.int32),
            offset=jnp.zeros((channels,), jnp.int32),
            volume_ring=jnp.zeros((channels, 100), jnp.float32))
        want, st_x = _demod_block_xla(sig, st, n_cent, sps, "gfsk", False)
        got, st_a = _demod_block_auto(sig, st, n_cent, sps, "gfsk", False,
                                      interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        _assert_state_match(st_a, st_x)


@pytest.mark.parametrize("tile", [8, 16])
def test_dma_variant_matches_resident(tile):
    """The ANY-memory double-buffered kernel (dma=True) computes the
    same math on the same windows as the VMEM-resident kernel — its
    outputs must be BITWISE identical to the resident kernel's (not
    just inside the f32 envelope), and its dibits exact vs the XLA
    scan."""
    rng = np.random.default_rng(60 + tile)
    channels, n_cent, sps = 16, 4, 10
    sig = jnp.asarray(_gfsk_sig(rng, channels, n_cent * 100 + 4, sps, 0.1))
    st = demod_init(channels)
    want, _ = gfsk_demod_block(sig, st, n_cent, sps)
    got_r, st_r = pallas_demod_block(sig, st, n_cent, sps, mode="gfsk",
                                     tile=tile, interpret=True)
    got_d, st_d = pallas_demod_block(sig, st, n_cent, sps, mode="gfsk",
                                     tile=tile, interpret=True, dma=True)
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(got_r))
    np.testing.assert_array_equal(np.asarray(st_d.pos), np.asarray(st_r.pos))
    np.testing.assert_array_equal(np.asarray(st_d.offset),
                                  np.asarray(st_r.offset))
    # bitwise: identical summation order, only the staging differs
    np.testing.assert_array_equal(np.asarray(st_d.volume_ring),
                                  np.asarray(st_r.volume_ring))


def test_dma_variant_fsk_nonzero_state():
    """dma=True under the FSK slicer with a warm carried-in state."""
    rng = np.random.default_rng(71)
    channels, n_cent, sps = 8, 2, 40
    tx = rng.integers(0, 2, (channels, n_cent * 100 + 12))
    sig = np.repeat(np.array([-1.0, 1.0])[tx], sps, axis=-1) * 800
    sig = jnp.asarray((sig + rng.normal(0, 60, sig.shape)).astype(np.float32))
    st = DemodState(
        pos=jnp.asarray(rng.integers(0, 9, channels).astype(np.int32)),
        offset=jnp.asarray(rng.integers(-1, 2, channels).astype(np.int32)),
        volume_ring=jnp.asarray(
            rng.normal(0, 400, (channels, 100)).astype(np.float32)))
    want, st_x = fsk_demod_block(sig, st, n_cent, sps)
    got, st_d = pallas_demod_block(sig, st, n_cent, sps, mode="fsk",
                                   interpret=True, dma=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    _assert_state_match(st_d, st_x)


def test_shift_bound_eight_stages():
    """The per-century start floors + sps-aware pos guard keep the
    alignment-shift bound under 256 at every production configuration
    (sps 10/20/40, up to the 32-century bench ladder) — 8 log-shifter
    stages, down from 9 with the old fixed 128-backoff bound."""
    from digiham_tpu.ops.demod_pallas import (_century_start, _shift_bound,
                                              pos_guard)

    # the guard floor of 56 keeps the time-sharded entry (pos <
    # 2*drift_budget = 48) on the hot path for every protocol
    assert pos_guard(10) == 64 and pos_guard(20) == 64 and pos_guard(40) == 96
    from digiham_tpu.parallel import streaming as _streaming
    import inspect
    default_budget = inspect.signature(
        _streaming.TimeShardedPipeline.__init__
    ).parameters["drift_budget"].default
    for sps in (10, 20, 40):
        assert pos_guard(sps) > 2 * default_budget
    # 8 stages at the production block shapes: DMR/YSF/D-Star sps=10 up
    # to the 32-century bench ladder, NXDN sps=20, POCSAG sps=40 (short
    # blocks — 1200 bit/s needs few centuries per step)
    for sps, nc_max in ((10, 32), (20, 32), (40, 16)):
        assert _shift_bound(nc_max, sps).bit_length() <= 8, (sps, nc_max)
    # the floor is a lower bound on every reachable pos and the worst
    # forward case stays within the bound, for ALL shapes
    for sps in (10, 20, 40):
        n = 100 * sps
        for nc in (2, 8, 16, 32):
            bound = _shift_bound(nc, sps)
            for c in range(nc):
                assert _century_start(c, n) <= max(0, c * n - c)
                assert _century_start(c, n) % 128 == 0
                worst = (pos_guard(sps) - 1 + c * n + c) - _century_start(c, n)
                assert worst <= bound, (sps, nc, c)


def test_pick_tile_dma_lifts_cap():
    """The DMA restructure makes the input-window VMEM footprint
    independent of the block length, so the auto tile rises above the
    resident kernel's 32 cap. (The batched-AGC scan temporaries still
    scale with tile x n_centuries — the round-4 hardware OOM fix — so
    at 16 centuries the pick is 64, and 128 is reached at 8.)"""
    from digiham_tpu.ops.demod_pallas import pick_tile

    L = 16 * (100 * 10 + 1) + 8
    assert pick_tile(256, L, 16, 10) == 32
    assert pick_tile(256, L, 16, 10, dma=True) == 64
    assert pick_tile(256, 8 * (100 * 10 + 1) + 8, 8, 10, dma=True) == 128
    # still divides small banks
    assert pick_tile(8, L, 16, 10, dma=True) == 8


def test_auto_dispatch_dma_env(monkeypatch):
    """DIGIHAM_DEMOD_DMA=1 routes the auto dispatch through the DMA
    kernel — both the hot branch and the out-of-guard rebase cold
    branch still match the XLA path."""
    from digiham_tpu.dsp.demod import _demod_block_auto, _demod_block_xla
    from digiham_tpu.ops.demod_pallas import pos_guard

    monkeypatch.setenv("DIGIHAM_DEMOD_DMA", "1")
    rng = np.random.default_rng(8)
    channels, n_cent, sps = 8, 2, 10
    far = pos_guard(sps)
    sig = _gfsk_sig(rng, channels, n_cent * 100 + 8, sps, 0.05)
    sig = np.concatenate(
        [np.zeros((channels, far), np.float32), sig], axis=-1)
    sig = jnp.asarray(sig)
    for pos0 in (4, far + 4):
        st = DemodState(
            pos=jnp.full((channels,), pos0, jnp.int32),
            offset=jnp.zeros((channels,), jnp.int32),
            volume_ring=jnp.zeros((channels, 100), jnp.float32))
        want, st_x = _demod_block_xla(sig, st, n_cent, sps, "gfsk", False)
        got, st_a = _demod_block_auto(sig, st, n_cent, sps, "gfsk", False,
                                      interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        _assert_state_match(st_a, st_x)


def test_nonzero_start_state():
    """Nonzero pos / pending slew / warm volume ring carried in."""
    rng = np.random.default_rng(11)
    channels, n_cent, sps = 8, 2, 10
    sig = jnp.asarray(_gfsk_sig(rng, channels, n_cent * 100 + 12, sps, 0.06))
    st = DemodState(
        pos=jnp.asarray(rng.integers(0, 9, channels).astype(np.int32)),
        offset=jnp.asarray(rng.integers(-1, 2, channels).astype(np.int32)),
        volume_ring=jnp.asarray(
            rng.normal(0, 400, (channels, 100)).astype(np.float32)),
    )
    want, st_x = gfsk_demod_block(sig, st, n_cent, sps)
    got, st_p = pallas_demod_block(sig, st, n_cent, sps, mode="gfsk",
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    _assert_state_match(st_p, st_x)


@pytest.mark.parametrize("tile", [8, 16])
def test_dma_bitwise(tile):
    """The DMA-staged kernel (production default) is BITWISE identical
    to the resident kernel at every tile: same math on identical
    128-aligned century windows."""
    rng = np.random.default_rng(90 + tile)
    channels, n_cent, sps = 16, 4, 10
    sig = jnp.asarray(_gfsk_sig(rng, channels, n_cent * 100 + 4, sps, 0.1))
    st = demod_init(channels)
    ref_d, ref_s = pallas_demod_block(sig, st, n_cent, sps, mode="gfsk",
                                      tile=16, interpret=True)
    got_d, got_s = pallas_demod_block(sig, st, n_cent, sps, mode="gfsk",
                                      tile=tile, interpret=True, dma=True)
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))
    np.testing.assert_array_equal(np.asarray(got_s.pos),
                                  np.asarray(ref_s.pos))
    np.testing.assert_array_equal(np.asarray(got_s.offset),
                                  np.asarray(ref_s.offset))
    np.testing.assert_array_equal(np.asarray(got_s.volume_ring),
                                  np.asarray(ref_s.volume_ring))
