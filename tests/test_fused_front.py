"""Fused-front kernel (in-kernel RRC / FM+RRC, ops/demod_pallas.py
front=...) vs the unfused production chain.

Interpret mode executes the same XLA ops as the two-stage path, so the
"rrc" front must be BITWISE identical to matmul-RRC + Pallas demod
(same per-column contraction); the "fm_rrc" front recomputes the FM
discriminator from decomposed real ops, which lands in the documented
f32 envelope (decisions identical on knife-edge-free streams, f32 ring
within ~1e-4).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from digiham_tpu.dsp.demod import (DemodState, _rrc_demod_fused,
                                   demod_init, gfsk_demod_block,
                                   rrc_demod_block)
from digiham_tpu.dsp.fm import fm_discriminator
from digiham_tpu.dsp.rrc import (NARROW_RRC, WIDE_RRC, RrcState,
                                 _rrc_filter_block_matmul)
from digiham_tpu.ops.demod_pallas import (pallas_demod_block,
                                          pallas_demod_fm_front_block,
                                          pallas_demod_front_block)


def _fsk4_stream(rng, C, L, sps, amp=800.0, noise=40.0):
    lv = np.array([1, 3, -1, -3]) / 3.0
    sym = rng.integers(0, 4, (C, L // sps + 2))
    x = (np.repeat(lv[sym], sps, axis=1)[:, :L] * amp
         + rng.normal(0, noise, (C, L)))
    return jnp.asarray(x.astype(np.float32))


def _unfused(x, rrc_state, dm_state, nc, sps, design, mode="gfsk",
             invert=False):
    filt, rrc1 = _rrc_filter_block_matmul(x, rrc_state, design)
    dib, dm1 = pallas_demod_block(filt, dm_state, nc, sps, mode=mode,
                                  invert=invert, tile=8, interpret=True,
                                  dma=True)
    return dib, rrc1, dm1


@pytest.mark.parametrize("design,sps,nc", [
    (WIDE_RRC, 10, 3),      # DMR/YSF shape (P=128)
    (NARROW_RRC, 20, 2),    # NXDN shape (161 taps -> P=256)
])
def test_rrc_front_bitwise(design, sps, nc):
    rng = np.random.default_rng(3)
    C = 8
    L = nc * (100 * sps + 1) + 8
    x = _fsk4_stream(rng, C, L, sps)
    st = demod_init(C)
    rrc0 = RrcState.init(C, design)
    dib_ref, _, st_ref = _unfused(x, rrc0, st, nc, sps, design)
    dib_f, st_f = pallas_demod_front_block(
        x, rrc0.history, st, taps=design.scaled_taps.tobytes(),
        n_centuries=nc, sps=sps, tile=8, interpret=True)
    assert np.array_equal(np.asarray(dib_ref), np.asarray(dib_f))
    assert np.array_equal(np.asarray(st_ref.pos), np.asarray(st_f.pos))
    assert np.array_equal(np.asarray(st_ref.offset),
                          np.asarray(st_f.offset))
    assert np.array_equal(np.asarray(st_ref.volume_ring),
                          np.asarray(st_f.volume_ring))


def test_rrc_front_fsk_mode():
    rng = np.random.default_rng(5)
    C, sps, nc = 8, 10, 3
    L = nc * (100 * sps + 1) + 8
    lv = np.array([-1.0, 1.0])
    bits = rng.integers(0, 2, (C, L // sps + 2))
    x = jnp.asarray((np.repeat(lv[bits], sps, axis=1)[:, :L] * 800
                     + rng.normal(0, 60, (C, L))).astype(np.float32))
    st = demod_init(C)
    rrc0 = RrcState.init(C, WIDE_RRC)
    dib_ref, _, st_ref = _unfused(x, rrc0, st, nc, sps, WIDE_RRC,
                                  mode="fsk", invert=True)
    dib_f, st_f = pallas_demod_front_block(
        x, rrc0.history, st, taps=WIDE_RRC.scaled_taps.tobytes(),
        n_centuries=nc, sps=sps, mode="fsk", invert=True, tile=8,
        interpret=True)
    assert np.array_equal(np.asarray(dib_ref), np.asarray(dib_f))
    assert np.array_equal(np.asarray(st_ref.pos), np.asarray(st_f.pos))


def test_rrc_front_streaming_carry():
    """Two chained blocks: the fused path's externally-carried RRC
    history must reproduce the unfused chain bit-for-bit (the century-0
    halo runs through the history strip)."""
    rng = np.random.default_rng(9)
    C, sps, nc = 8, 10, 2
    L = nc * (100 * sps + 1) + 8
    st_u = st_f = demod_init(C)
    rrc_u = rrc_f = RrcState.init(C, WIDE_RRC)
    taps = WIDE_RRC.scaled_taps.tobytes()
    halo = WIDE_RRC.ntaps - 1
    for blk in range(3):
        x = _fsk4_stream(rng, C, L, sps)
        dib_u, rrc_u, st_u = _unfused(x, rrc_u, st_u, nc, sps, WIDE_RRC)
        dib_f, st_f = pallas_demod_front_block(
            x, rrc_f.history, st_f, taps=taps, n_centuries=nc, sps=sps,
            tile=8, interpret=True)
        rrc_f = RrcState(jnp.concatenate(
            [rrc_f.history, x], axis=-1)[:, -halo:])
        assert np.array_equal(np.asarray(dib_u), np.asarray(dib_f)), blk
        assert np.array_equal(np.asarray(rrc_u.history),
                              np.asarray(rrc_f.history)), blk
        # blocks are self-contained in this test: restart the read index
        st_u = DemodState(jnp.zeros_like(st_u.pos), st_u.offset,
                          st_u.volume_ring)
        st_f = DemodState(jnp.zeros_like(st_f.pos), st_f.offset,
                          st_f.volume_ring)


def test_fm_front_envelope():
    """fm_rrc front: decisions identical on a clean stream; the f32 ring
    lands within the documented envelope (the kernel's decomposed
    complex product rounds differently from XLA's complex multiply)."""
    rng = np.random.default_rng(11)
    C, sps, nc = 8, 10, 3
    L = nc * (100 * sps + 1) + 8
    lv = np.array([1, 3, -1, -3]) / 3.0
    sym = rng.integers(0, 4, (C, L // sps + 2))
    freq = np.repeat(lv[sym], sps, axis=1)[:, :L] * 1944.0
    phase = 2 * np.pi * np.cumsum(freq, axis=1) / 48000.0
    iq = np.exp(1j * phase).astype(np.complex64)
    iq += (rng.normal(0, .02, (C, L))
           + 1j * rng.normal(0, .02, (C, L))).astype(np.complex64)
    iq = jnp.asarray(iq)
    last = jnp.ones((C,), jnp.complex64)
    st = demod_init(C)
    rrc0 = RrcState.init(C, WIDE_RRC)
    audio, _ = fm_discriminator(iq, last)
    dib_ref, _, st_ref = _unfused(audio * 5000.0, rrc0, st, nc, sps,
                                  WIDE_RRC)
    dib_f, st_f = pallas_demod_fm_front_block(
        iq.real, iq.imag, last.real, last.imag, rrc0.history, st,
        taps=WIDE_RRC.scaled_taps.tobytes(), n_centuries=nc, sps=sps,
        tile=8, interpret=True)
    assert np.array_equal(np.asarray(dib_ref), np.asarray(dib_f))
    assert np.array_equal(np.asarray(st_ref.pos), np.asarray(st_f.pos))
    ring_d = np.abs(np.asarray(st_ref.volume_ring)
                    - np.asarray(st_f.volume_ring))
    assert float(ring_d.max()) < 1e-3


def test_kernel_atan2_ulp():
    """The derived-at-import polynomial atan2 (Mosaic has no atan2
    lowering) stays within a few f32 ulps of libm over all octants and
    magnitudes, and is NaN-free at (0, 0)."""
    from digiham_tpu.ops.demod_pallas import _kernel_atan2

    rng = np.random.default_rng(21)
    mag = np.exp(rng.uniform(-8, 8, 20000)).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, 20000).astype(np.float32)
    x = jnp.asarray(mag * np.cos(ang))
    y = jnp.asarray(mag * np.sin(ang))
    ours = np.asarray(jax.jit(_kernel_atan2)(y, x))
    ref = np.arctan2(np.asarray(y), np.asarray(x)).astype(np.float32)
    ulp = np.abs(ours.view(np.int32).astype(np.int64)
                 - ref.view(np.int32).astype(np.int64))
    assert int(ulp.max()) <= 8, int(ulp.max())
    z = jnp.zeros((8,), jnp.float32)
    assert np.all(np.asarray(jax.jit(_kernel_atan2)(z, z)) == 0.0)
    # axis conventions: +x -> 0, +y -> pi/2, -x -> pi, -y -> -pi/2
    one = jnp.ones((1,), jnp.float32)
    zero = jnp.zeros((1,), jnp.float32)
    assert float(_kernel_atan2(zero, one)[0]) == 0.0
    assert abs(float(_kernel_atan2(one, zero)[0]) - np.pi / 2) < 1e-6
    assert abs(float(_kernel_atan2(zero, -one)[0]) - np.pi) < 1e-6
    assert abs(float(_kernel_atan2(-one, zero)[0]) + np.pi / 2) < 1e-6


def test_dispatch_guard_cold_branch():
    """pos outside the kernel bound takes the unfused cold branch and
    still returns correct carries."""
    rng = np.random.default_rng(13)
    C, sps, nc = 8, 10, 2
    from digiham_tpu.ops.demod_pallas import pos_guard
    g = pos_guard(sps)
    L = g + 16 + nc * (100 * sps + 1) + 8
    x = _fsk4_stream(rng, C, L, sps)
    rrc0 = RrcState.init(C, WIDE_RRC)
    pos = jnp.full((C,), g + 16, jnp.int32)  # out of the hot bound
    st = DemodState(pos, jnp.zeros((C,), jnp.int32),
                    jnp.zeros((C, 100), jnp.float32))
    dib, rrc1, st1 = _rrc_demod_fused(x, rrc0, st, nc, sps, WIDE_RRC,
                                      "gfsk", False, interpret=True)
    # reference: plain two-stage chain on the same state
    filt, _ = _rrc_filter_block_matmul(x, rrc0, WIDE_RRC)
    dib_ref, st_ref = gfsk_demod_block(filt, st, nc, sps)
    assert np.array_equal(np.asarray(dib), np.asarray(dib_ref))
    assert np.array_equal(np.asarray(st1.pos), np.asarray(st_ref.pos))
    halo = WIDE_RRC.ntaps - 1
    assert np.array_equal(np.asarray(rrc1.history),
                          np.asarray(x[:, -halo:]))


def test_rrc_demod_block_default_unchanged(monkeypatch):
    """Without the opt-in flag the shared segment is the plain two-stage
    chain — byte-identical to calling the stages directly."""
    monkeypatch.delenv("DIGIHAM_FUSED_FRONT", raising=False)
    rng = np.random.default_rng(17)
    C, sps, nc = 8, 10, 2
    L = nc * (100 * sps + 1) + 8
    x = _fsk4_stream(rng, C, L, sps)
    st = demod_init(C)
    rrc0 = RrcState.init(C, WIDE_RRC)
    dib, rrc1, st1 = rrc_demod_block(x, rrc0, st, nc, sps, WIDE_RRC)
    from digiham_tpu.dsp.rrc import rrc_filter_block
    filt, rrc_ref = rrc_filter_block(x, rrc0, WIDE_RRC)
    dib_ref, st_ref = gfsk_demod_block(filt, st, nc, sps)
    assert np.array_equal(np.asarray(dib), np.asarray(dib_ref))
    assert np.array_equal(np.asarray(rrc1.history),
                          np.asarray(rrc_ref.history))
    assert np.array_equal(np.asarray(st1.pos), np.asarray(st_ref.pos))
