"""Golden-oracle tests: byte-for-byte comparison against the REFERENCE
decoders, compiled from /root/reference via the csdr shim
(tests/ref_harness/). This is the literal "bit-exact frame decode vs the
reference" contract from BASELINE.md — same symbol streams in, identical
payload bytes and metadata events out.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

HARNESS_DIR = os.path.join(os.path.dirname(__file__), "ref_harness")
HARNESS = os.path.join(HARNESS_DIR, "ref_harness")


@pytest.fixture(scope="module", autouse=True)
def build_harness():
    r = subprocess.run(["make", "-s", "ref_harness"], cwd=HARNESS_DIR,
                       capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode()[-2000:]


def run_reference(protocol: str, symbols: np.ndarray, tmp_path):
    meta_path = str(tmp_path / f"{protocol}_meta.txt")
    p = subprocess.run([HARNESS, protocol, meta_path],
                       input=symbols.astype(np.uint8).tobytes(),
                       capture_output=True, timeout=120)
    assert p.returncode == 0, p.stderr.decode()[-500:]
    with open(meta_path) as f:
        return p.stdout, f.read()


def run_ours(make_decoder, symbols: np.ndarray):
    from digiham_tpu.runtime.meta import PipelineMetaWriter
    events = []
    dec = make_decoder()
    dec.set_meta_writer(PipelineMetaWriter(lambda b: events.append(b.decode())))
    out = dec.process(symbols.astype(np.uint8))
    return out, "".join(events)


def compare(protocol, make_decoder, symbols, tmp_path):
    ref_out, ref_meta = run_reference(protocol, symbols, tmp_path)
    our_out, our_meta = run_ours(make_decoder, symbols)
    assert our_out == ref_out, (
        f"{protocol} payload diverges: ref {len(ref_out)}B "
        f"ours {len(our_out)}B")
    assert our_meta == ref_meta, (
        f"{protocol} metadata diverges:\nREF : {ref_meta[:500]!r}\n"
        f"OURS: {our_meta[:500]!r}")
    return ref_out


class TestDmrGolden:
    def test_voice_and_data(self, tmp_path):
        from digiham_tpu.protocols.dmr import make_decoder
        from dmr_synth import data_frame, group_lc, voice_frame
        rng = np.random.default_rng(0)
        payload = np.tile([1, 3, 0, 2], 27)
        lc = group_lc(2300042, 2623317)
        frames = ([data_frame(s % 2, 1, lc) for s in range(4)]
                  + [voice_frame(s % 2, payload, sync=True)
                     for s in range(10)])
        stream = np.concatenate(
            [rng.integers(0, 4, 333).astype(np.uint8)] + frames)
        out = compare("dmr", make_decoder, stream, tmp_path)
        assert len(out) > 0

    def test_embedded_lc_superframes(self, tmp_path):
        from digiham_tpu.protocols.dmr import make_decoder
        from dmr_synth import group_lc, voice_superframe
        lc = group_lc(3100999, 3100001)
        payload = np.tile([1, 3, 0, 2], 27)
        frames = voice_superframe(0, lc, payload) * 2
        stream = np.concatenate(frames)
        compare("dmr", make_decoder, stream, tmp_path)

    def test_random_fuzz(self, tmp_path):
        """Pure noise: both implementations must behave identically on
        arbitrary input (false syncs, failed FEC, hysteresis churn)."""
        from digiham_tpu.protocols.dmr import make_decoder
        for seed in range(3):
            rng = np.random.default_rng(seed)
            stream = rng.integers(0, 4, 20000).astype(np.uint8)
            compare("dmr", make_decoder, stream, tmp_path)

    def test_corrupted_stream_fuzz(self, tmp_path):
        """Real frames with random symbol corruption: exercises every
        FEC-reject and counter path identically."""
        from digiham_tpu.protocols.dmr import make_decoder
        from dmr_synth import voice_frame
        payload = np.tile([1, 3, 0, 2], 27)
        frames = [voice_frame(s % 2, payload, sync=True) for s in range(20)]
        stream = np.concatenate(frames)
        rng = np.random.default_rng(42)
        idx = rng.choice(len(stream), size=len(stream) // 20, replace=False)
        stream[idx] = rng.integers(0, 4, len(idx))
        compare("dmr", make_decoder, stream, tmp_path)


class TestYsfGolden:
    def test_vd2_with_header(self, tmp_path):
        from digiham_tpu.protocols.ysf import make_decoder
        from ysf_synth import header_frame, terminator_frame, vd2_frame
        frames = [header_frame(b"ALL", b"W1AW", b"GW-1", b"UPLINK")]
        frames += [vd2_frame(i % 8, b"DG1ABC    ") for i in range(6)]
        frames.append(terminator_frame())
        frames.append(terminator_frame())
        rng = np.random.default_rng(1)
        stream = np.concatenate(
            [rng.integers(0, 4, 200).astype(np.uint8)] + frames)
        out = compare("ysf", make_decoder, stream, tmp_path)
        assert len(out) > 0

    def test_random_fuzz(self, tmp_path):
        from digiham_tpu.protocols.ysf import make_decoder
        for seed in range(3):
            rng = np.random.default_rng(100 + seed)
            stream = rng.integers(0, 4, 20000).astype(np.uint8)
            compare("ysf", make_decoder, stream, tmp_path)


class TestNxdnGolden:
    def test_vcall_stream(self, tmp_path):
        from digiham_tpu.protocols.nxdn import make_decoder
        from nxdn_synth import (encode_sacch_unit, nxdn_frame,
                                vcall_superframe_bytes, voice_slot_dibits)
        units = vcall_superframe_bytes(0b001, 1234, 567)
        payload = (np.arange(72) % 4).astype(np.uint8)
        frames = [nxdn_frame((0b01, 0b10, 0b11),
                             encode_sacch_unit(i, units[i]),
                             [voice_slot_dibits(payload, 38),
                              voice_slot_dibits(payload, 110)])
                  for i in range(4)]
        stream = np.concatenate(
            [np.zeros(77, np.uint8)] + frames + [np.zeros(300, np.uint8)])
        out = compare("nxdn", make_decoder, stream, tmp_path)
        assert len(out) > 0

    def test_random_fuzz(self, tmp_path):
        from digiham_tpu.protocols.nxdn import make_decoder
        for seed in range(3):
            rng = np.random.default_rng(200 + seed)
            stream = rng.integers(0, 4, 20000).astype(np.uint8)
            compare("nxdn", make_decoder, stream, tmp_path)


class TestDstarGolden:
    def test_header_voice_slowdata(self, tmp_path):
        from digiham_tpu.protocols.dstar import make_decoder
        from test_dstar import full_voice_stream
        text = b"HELLO FROM DSTAR  !!"
        msg_frames = {}
        for block in range(4):
            chunk = text[block * 5:block * 5 + 5]
            msg_frames[block * 2] = bytes([0x40 | block]) + chunk[:2]
            msg_frames[block * 2 + 1] = chunk[2:5]
        stream = np.concatenate(
            full_voice_stream(24, message_frames=msg_frames)
            + [np.zeros(250, np.uint8)])
        out = compare("dstar", make_decoder, stream, tmp_path)
        assert len(out) > 0

    def test_random_fuzz(self, tmp_path):
        from digiham_tpu.protocols.dstar import make_decoder
        for seed in range(3):
            rng = np.random.default_rng(300 + seed)
            stream = rng.integers(0, 2, 30000).astype(np.uint8)
            compare("dstar", make_decoder, stream, tmp_path)


class TestPocsagGolden:
    def test_alpha_message(self, tmp_path):
        from digiham_tpu.protocols.pocsag import make_decoder
        from test_pocsag import (IDLE_CODEWORD, address_codeword,
                                 alpha_payloads, build_stream, data_codeword)
        text = "GOLDEN TEST 123"
        cws = [address_codeword(0x1234, 3)]
        cws.extend(data_codeword(p) for p in alpha_payloads(text))
        cws.append(IDLE_CODEWORD)
        stream = build_stream(cws)
        out = compare("pocsag", make_decoder, stream, tmp_path)
        assert f"message:{text}".encode() in out

    def test_random_fuzz(self, tmp_path):
        from digiham_tpu.protocols.pocsag import make_decoder
        for seed in range(3):
            rng = np.random.default_rng(400 + seed)
            stream = rng.integers(0, 2, 30000).astype(np.uint8)
            compare("pocsag", make_decoder, stream, tmp_path)
