"""On-hardware smoke test: the production tracked-bank path for ALL
FIVE protocols on a REAL TPU backend (Pallas kernels active where
eligible).

Per protocol: synthesize a transmission with the TX-side frame
synthesizers, modulate to baseband samples, push through
TrackedChannelBank (device pipeline + host trackers) and assert the
expected payload/metadata decodes. Run under the default axon env (do
NOT force cpu). Exit code 0 = all PASS.

Round-2 catch: this script found the Pallas RRC lane-alignment failure
for channel counts not a multiple of 128 (dsp/rrc.py gate).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

LEVELS4 = np.array([1.0, 3.0, -1.0, -3.0]) / 3.0


def _bank(pipe, adapter=None, channels=2, with_meta=False):
    from digiham_tpu.runtime.meta import PipelineMetaWriter
    from digiham_tpu.runtime.tracked_bank import TrackedChannelBank

    outputs = {c: b"" for c in range(channels)}
    kw = {"adapter": adapter} if adapter is not None else {}
    bank = TrackedChannelBank(
        pipe, on_output=lambda c, d: outputs.__setitem__(
            c, outputs[c] + d), **kw)
    metas = {c: [] for c in range(channels)}
    if with_meta:
        for c in range(channels):
            bank.set_meta_writer(c, PipelineMetaWriter(
                lambda b, ev=metas[c]: ev.append(b.decode())))
    return bank, outputs, metas


def _push(bank, samples, chunk=8192):
    for lo in range(0, samples.shape[1], chunk):
        bank.push(samples[:, lo:lo + chunk])


def smoke_dmr(channels=8, noise=60.0):
    from digiham_tpu.pipeline import DmrPipeline
    from digiham_tpu.protocols.dmr.phases import pack_dibits
    from dmr_synth import voice_frame

    rng = np.random.default_rng(42)
    payload = np.tile([1, 3, 0, 2], 27)
    frames = [voice_frame(s % 2, payload, sync=True) for s in range(12)]
    dibits = np.concatenate([np.zeros(30, np.uint8)] + frames)
    base = np.repeat(LEVELS4[dibits], 10) * 1000
    samples = np.stack(
        [base + rng.normal(0, noise, base.shape) for _ in range(channels)]
    ).astype(np.float32)
    pipe = DmrPipeline(channels=channels, sps=10, n_centuries=2)
    bank, outputs, _ = _bank(pipe, channels=channels)
    # snapshot/restore mid-stream into a FRESH bank on hardware: the
    # continuation must decode as if uninterrupted (checkpoint contract)
    half = (samples.shape[1] // 2 // 8192) * 8192
    _push(bank, samples[:, :half])
    blob = bank.snapshot()
    pipe2 = DmrPipeline(channels=channels, sps=10, n_centuries=2)
    bank2, outputs2, _ = _bank(pipe2, channels=channels)
    for c in range(channels):
        outputs2[c] = outputs[c]
    bank2.restore(blob)
    _push(bank2, samples[:, half:])
    want = pack_dibits(payload)
    ok = sum(want in outputs2[c] for c in range(channels))
    return ok == channels, (f"{ok}/{channels} channels decoded TX payload "
                            f"(mid-stream snapshot/restore at {half})")


def smoke_ysf():
    from digiham_tpu.pipeline import YsfPipeline
    from digiham_tpu.runtime.tracked_bank import YsfAdapter
    from ysf_synth import header_frame, terminator_frame, vd2_frame

    parts = [np.zeros(60, np.uint8),
             header_frame(b"DEST", b"SRC", b"DOWN", b"UP")]
    for fn in range(6):
        parts.append(vd2_frame(fn % 8, b"TPUSMOKE  "))
    parts.append(terminator_frame())
    parts.append(np.zeros(200, np.uint8))
    dibits = np.concatenate([np.asarray(p, np.uint8) for p in parts])
    samples = np.stack([np.repeat(LEVELS4[dibits], 10) * 1000] * 2
                       ).astype(np.float32)
    pipe = YsfPipeline(channels=2, sps=10, n_centuries=5)
    bank, outputs, metas = _bank(pipe, YsfAdapter(), with_meta=True)
    _push(bank, samples)
    ok = all(len(outputs[c]) > 0 for c in range(2)) and all(
        "DEST" in "".join(metas[c]) for c in range(2))
    return ok, (f"voice bytes {[len(outputs[c]) for c in range(2)]}, "
                f"meta has DEST: "
                f"{['DEST' in ''.join(metas[c]) for c in range(2)]}")


def smoke_nxdn():
    from digiham_tpu.pipeline import NxdnPipeline
    from digiham_tpu.runtime.tracked_bank import NxdnAdapter
    from nxdn_synth import (encode_sacch_unit, nxdn_frame,
                            vcall_superframe_bytes, voice_slot_dibits)

    # (100, 200) chosen to survive the reference-faithful
    # zero-insertion depuncture + Viterbi roundtrip (content-dependent)
    units = vcall_superframe_bytes(0, 100, 200)
    payload = np.tile([0, 1, 2, 3], 18).astype(np.uint8)
    parts = [np.zeros(60, np.uint8)]
    for i in range(8):
        slots = [voice_slot_dibits(payload, 38),
                 voice_slot_dibits(payload, 38 + 72)]
        parts.append(nxdn_frame((0b01, 0b10, 3),
                                encode_sacch_unit(i % 4, units[i % 4]),
                                slots))
    parts.append(np.zeros(300, np.uint8))
    dibits = np.concatenate([np.asarray(p, np.uint8) for p in parts])
    samples = np.stack([np.repeat(LEVELS4[dibits], 20) * 1000] * 2
                       ).astype(np.float32)
    pipe = NxdnPipeline(channels=2, sps=20, n_centuries=3)
    bank, outputs, metas = _bank(pipe, NxdnAdapter(), with_meta=True)
    _push(bank, samples)
    meta_ok = ["source:100" in "".join(metas[c]) for c in range(2)]
    ok = all(len(outputs[c]) > 0 for c in range(2)) and all(meta_ok)
    return ok, (f"voice bytes {[len(outputs[c]) for c in range(2)]}, "
                f"meta source:100: {meta_ok}")


def smoke_dstar():
    from digiham_tpu.pipeline import FskPipeline
    from digiham_tpu.runtime.tracked_bank import DstarAdapter
    from test_dstar import full_voice_stream

    parts = full_voice_stream(30) + [np.zeros(300, np.uint8)]
    bits = np.concatenate(parts)
    levels = np.array([-1.0, 1.0], np.float32)
    samples = np.stack(
        [np.repeat(levels[bits], 10) * 1000] * 2).astype(np.float32)
    pipe = FskPipeline(channels=2, protocol="dstar", n_centuries=2)
    bank, outputs, _ = _bank(pipe, DstarAdapter())
    _push(bank, samples, chunk=4096)
    ok = all(len(outputs[c]) >= 9 * 20 and outputs[c][:9] == b"\xAA" * 9
             for c in range(2))
    return ok, f"voice bytes {[len(outputs[c]) for c in range(2)]}"


def smoke_pocsag():
    from digiham_tpu.pipeline import FskPipeline
    from digiham_tpu.runtime.tracked_bank import PocsagAdapter
    from test_pocsag import address_codeword, alpha_payloads, \
        build_stream, data_codeword

    cws = [address_codeword(4242, 3)]
    cws += [data_codeword(p) for p in alpha_payloads("TPU SMOKE")]
    bits = np.concatenate([build_stream(cws), np.zeros(200, np.uint8)])
    levels = np.array([1.0, -1.0], np.float32)  # inverted mapping
    samples = np.stack(
        [np.repeat(levels[bits], 40) * 1000] * 2).astype(np.float32)
    pipe = FskPipeline(channels=2, protocol="pocsag", n_centuries=2)
    bank, outputs, _ = _bank(pipe, PocsagAdapter())
    _push(bank, samples)
    ok = all(b"message:TPU SMOKE" in outputs[c] for c in range(2))
    return ok, f"outputs {[outputs[c][:60] for c in range(2)]}"


def smoke_viterbi():
    """On-hardware Mosaic-vs-XLA trellis parity: the Pallas Viterbi
    kernel must be BIT-identical to the scan (exact integer arithmetic —
    no f32-envelope allowance here), on noisy and tie-heavy inputs,
    for both YSF (T=100) and NXDN blocked-start (T=30) shapes."""
    from digiham_tpu.fec.viterbi import conv_encode, viterbi_decode

    rng = np.random.default_rng(42)
    checks = []
    for T, blocked, B in ((100, 0, 300), (30, 4, 300)):
        bits = rng.integers(0, 2, (B, T))
        if blocked:
            bits[:, :blocked] = 0
        obs = conv_encode(bits, 16)
        flips = rng.random(obs.shape) < 0.12
        obs = np.where(flips, obs ^ rng.integers(1, 4, obs.shape), obs)
        obs = np.concatenate([obs, rng.integers(0, 4, (B, T))])  # ties
        pb, pm = viterbi_decode(obs, 16, blocked, impl="pallas")
        xb, xm = viterbi_decode(obs, 16, blocked, impl="xla")
        checks.append(bool(np.array_equal(np.asarray(pb), np.asarray(xb))
                           and np.array_equal(np.asarray(pm),
                                              np.asarray(xm))))
    return all(checks), f"bit-identical (T=100, T=30 blocked): {checks}"


def smoke_demod_dma():
    """On-hardware resident-vs-DMA demod kernel parity: the ANY-memory
    double-buffered staging (dma=True — bench ladder rung 3, tile up to
    128) must be BIT-identical to the resident kernel on real Mosaic
    DMAs, not just in interpret mode, across tiles and a warm state."""
    import jax.numpy as jnp

    from digiham_tpu.dsp.demod import DemodState, demod_init
    from digiham_tpu.ops.demod_pallas import pallas_demod_block

    rng = np.random.default_rng(9)
    C, n_cent, sps = 64, 8, 10
    levels = np.array([1.0, 3.0, -1.0, -3.0]) / 3.0
    tx = rng.integers(0, 4, (C, n_cent * 100 + 8))
    sig = np.repeat(levels[tx], sps, axis=-1) * 1000
    sig = (sig + rng.normal(0, 80, sig.shape)).astype(np.float32)
    sig = jnp.asarray(sig)
    st = DemodState(
        pos=jnp.asarray(rng.integers(0, 9, C).astype(np.int32)),
        offset=jnp.asarray(rng.integers(-1, 2, C).astype(np.int32)),
        volume_ring=demod_init(C).volume_ring)
    d_r, s_r = pallas_demod_block(sig, st, n_cent, sps, mode="gfsk",
                                  tile=32)
    checks = []
    variants = [dict(tile=32, dma=True), dict(tile=64, dma=True),
                dict(tile=8, dma=True), dict(tile=16)]
    for kw in variants:
        d_d, s_d = pallas_demod_block(sig, st, n_cent, sps, mode="gfsk",
                                      **kw)
        checks.append(bool(
            np.array_equal(np.asarray(d_d), np.asarray(d_r))
            and np.array_equal(np.asarray(s_d.pos), np.asarray(s_r.pos))
            and np.array_equal(np.asarray(s_d.offset),
                               np.asarray(s_r.offset))
            and np.array_equal(np.asarray(s_d.volume_ring),
                               np.asarray(s_r.volume_ring))))
    return all(checks), ("bit-identical (dma t32, dma t64, dma t8, "
                         f"resident t16): {checks}")


def smoke_fused_front():
    """On-hardware fused-front parity (front="rrc" and "fm_rrc" vs the
    two-stage chain). Unlike demod_dma (identical DMA'd values -> exact),
    the fused front recomputes the RRC on the MXU inside Mosaic, whose
    accumulation order may differ from XLA's matmul — decisions must
    match modulo the documented knife-edge envelope (<1% dibits) and
    SER vs the TX ground truth must be statistically identical."""
    import jax
    import jax.numpy as jnp

    from digiham_tpu.dsp.demod import DemodState, demod_init
    from digiham_tpu.dsp.fm import fm_discriminator
    from digiham_tpu.dsp.rrc import (WIDE_RRC, RrcState,
                                     _rrc_filter_block_matmul)
    from digiham_tpu.ops.demod_pallas import (pallas_demod_block,
                                              pallas_demod_fm_front_block,
                                              pallas_demod_front_block)

    rng = np.random.default_rng(31)
    C, n_cent, sps = 64, 8, 10
    L = n_cent * (100 * sps + 1) + 8
    tx = rng.integers(0, 4, (C, L // sps + 2))
    taps = WIDE_RRC.scaled_taps.tobytes()
    st0 = demod_init(C)
    rrc0 = RrcState.init(C, WIDE_RRC)

    results = []
    # --- sample-domain front ("rrc") -------------------------------
    sig = np.repeat(LEVELS4[tx], sps, axis=-1)[:, :L] * 1000
    sig = jnp.asarray((sig + rng.normal(0, 80, (C, L))).astype(np.float32))
    filt, _ = jax.jit(_rrc_filter_block_matmul,
                      static_argnums=2)(sig, rrc0, WIDE_RRC)
    d_u, s_u = pallas_demod_block(filt, st0, n_cent, sps, mode="gfsk",
                                  tile=32, dma=True)
    d_f, s_f = pallas_demod_front_block(
        sig, rrc0.history, st0, taps=taps, n_centuries=n_cent, sps=sps,
        tile=32)
    def best_ser(dec):
        """SER vs TX at the best global symbol alignment: the RRC group
        delay (ntaps-1)/2 samples = 4 symbols shifts decisions vs tx,
        and timing acquisition settles over century 0 — scan shifts and
        score the second half of the block."""
        half = n_cent * 100 // 2
        best = 1.0
        for sh in range(0, 10):
            got = dec[:, half:n_cent * 100 - 10]
            want = tx[:, half - sh:n_cent * 100 - 10 - sh]
            best = min(best, float((got != want).mean()))
        return best

    du, df = np.asarray(d_u), np.asarray(d_f)
    diff_rrc = float((du != df).mean())
    results.append(("rrc", diff_rrc, best_ser(du), best_ser(df)))
    # --- raw-IQ front ("fm_rrc") ------------------------------------
    freq = np.repeat(LEVELS4[tx], sps, axis=-1)[:, :L] * 1944.0
    phase = 2 * np.pi * np.cumsum(freq, axis=1) / 48000.0
    iq_host = np.exp(1j * phase)
    iq_host += rng.normal(0, .02, (C, L)) + 1j * rng.normal(0, .02,
                                                            (C, L))
    # complex64 host->device transfer is UNIMPLEMENTED on this tunnel:
    # upload the planes and combine on device inside a jit (CLAUDE.md;
    # same pattern as tools/tpu_voice_demo.py)
    re = jnp.asarray(iq_host.real.astype(np.float32))
    im = jnp.asarray(iq_host.imag.astype(np.float32))
    last = jnp.ones((C,), jnp.float32)
    lastz = jnp.zeros((C,), jnp.float32)

    @jax.jit
    def unfused_audio(re, im, lre, lim):
        audio, _ = fm_discriminator(jax.lax.complex(re, im),
                                    jax.lax.complex(lre, lim))
        return audio

    filt, _ = jax.jit(_rrc_filter_block_matmul, static_argnums=2)(
        unfused_audio(re, im, last, lastz) * 5000.0, rrc0, WIDE_RRC)
    d_u, _ = pallas_demod_block(filt, st0, n_cent, sps, mode="gfsk",
                                tile=32, dma=True)
    d_f, _ = pallas_demod_fm_front_block(
        re, im, last, lastz, rrc0.history, st0,
        taps=taps, n_centuries=n_cent, sps=sps, tile=32)
    du, df = np.asarray(d_u), np.asarray(d_f)
    diff_fm = float((du != df).mean())
    results.append(("fm_rrc", diff_fm, best_ser(du), best_ser(df)))
    ok = all(d < 0.01 and abs(su - sf) < 0.005 and sf < 0.02
             for _, d, su, sf in results)
    detail = "; ".join(
        f"{n}: diff={d:.5f} ser_unfused={su:.5f} ser_fused={sf:.5f}"
        for n, d, su, sf in results)
    return ok, detail


def smoke_multistream(channels=4, n_procs=2):
    """The production multi-process serving driver on hardware: each
    worker owns its own device client session (the dispatch-overlap
    mechanism, docs/HW_CERT_ROUND4.md) and the sharded bank must decode
    byte-identically to the in-process bank."""
    from digiham_tpu.protocols.dmr.phases import pack_dibits
    from digiham_tpu.runtime.multistream import MultiStreamBank
    from dmr_synth import voice_frame

    rng = np.random.default_rng(43)
    payload = np.tile([2, 0, 3, 1], 27)
    frames = [voice_frame(s % 2, payload, sync=True) for s in range(12)]
    dibits = np.concatenate([np.zeros(30, np.uint8)] + frames)
    base = np.repeat(LEVELS4[dibits], 10) * 1000
    samples = np.stack(
        [base + rng.normal(0, 60.0, base.shape) for _ in range(channels)]
    ).astype(np.float32)
    outputs = {c: b"" for c in range(channels)}
    with MultiStreamBank("dmr", channels=channels, n_procs=n_procs,
                         on_output=lambda c, d: outputs.__setitem__(
                             c, outputs[c] + d),
                         pipeline_kwargs={"n_centuries": 2}) as ms:
        for lo in range(0, samples.shape[1], 8192):
            ms.push(samples[:, lo:lo + 8192])
    want = pack_dibits(payload)
    ok = sum(want in outputs[c] for c in range(channels))
    return ok == channels, (f"{ok}/{channels} channels decoded via "
                            f"{n_procs}-process MultiStreamBank")


def main(only=None):
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    except Exception:
        pass
    print("backend:", jax.devices()[0].platform, flush=True)
    cases = {"dmr": smoke_dmr, "ysf": smoke_ysf, "nxdn": smoke_nxdn,
             "dstar": smoke_dstar, "pocsag": smoke_pocsag,
             "viterbi": smoke_viterbi, "demod_dma": smoke_demod_dma,
             "fused_front": smoke_fused_front,
             "multistream": smoke_multistream}
    if only:
        cases = {k: v for k, v in cases.items() if k in only}
    failed = []
    for name, fn in cases.items():
        try:
            ok, detail = fn()
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"EXCEPTION {e!r}"
        print(f"{name}: {'PASS' if ok else 'FAIL'} ({detail})", flush=True)
        if not ok:
            failed.append(name)
    print("TPU SMOKE:", "PASS" if not failed else f"FAIL {failed}")
    return 0 if not failed else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
