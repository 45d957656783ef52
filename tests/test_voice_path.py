"""Full voice path integration: protocol decoder output -> MbeSynthesizer
(dynamic mode, mock codecserver) -> PCM -> digitalvoice filter."""
import time

import numpy as np
import pytest

import jax.numpy as jnp

from digiham_tpu.codec import DynamicMode, MbeSynthesizer, TableMode
from digiham_tpu.codec.modes import ysf_mode_for
from digiham_tpu.dsp.audio import DigitalVoiceState, digitalvoice_filter
from test_codec import MockCodecServer

from ysf_synth import terminator_frame, vd2_frame
from dmr_synth import voice_frame


def wait_pcm(synth, nbytes, timeout=5.0):
    deadline = time.time() + timeout
    pcm = b""
    while len(pcm) < nbytes and time.time() < deadline:
        pcm += synth.read_pcm()
        time.sleep(0.005)
    return pcm


class TestYsfVoicePath:
    def test_dn_stream_to_pcm(self):
        """YSF DN frames -> mode-byte-prefixed AMBE -> renegotiation to
        table 34 -> PCM out."""
        from digiham_tpu.protocols.ysf import make_decoder
        frames = [vd2_frame(i, b"VOICEPATH ") for i in range(3)]
        frames.append(terminator_frame())
        stream = np.concatenate(frames)
        voice_bytes = make_decoder().process(stream)
        assert len(voice_bytes) == 3 * 5 * 8  # mode byte + 7 AMBE x5 x3

        server = MockCodecServer()
        server.start()
        synth = MbeSynthesizer(server.client_sock)
        synth.set_mode(DynamicMode(ysf_mode_for))
        shipped = synth.process(voice_bytes)
        assert shipped == 15
        # DN mode negotiated from the in-stream mode bytes
        assert synth.channel_bytes() == 7
        assert server.renegotiations == [{"index": "34"}]
        pcm = wait_pcm(synth, 15 * 14)
        assert len(pcm) == 15 * 14  # mock echoes 2x the 7 channel bytes
        synth.close()

    def test_pcm_through_audio_filter(self):
        """PCM tail of the chain: digitalvoice bandpass on synthesized
        speech-band audio."""
        t = np.arange(1600) / 8000.0
        pcm = (np.sin(2 * np.pi * 800 * t) * 8000).astype(np.int16)
        out, _ = digitalvoice_filter(jnp.asarray(pcm)[None, :],
                                     DigitalVoiceState.init(1))
        out = np.asarray(out)[0]
        assert np.abs(out[800:]).max() > 2000  # passband signal survives


class TestDmrVoicePath:
    def test_dmr_frames_to_pcm(self):
        """DMR voice payload (27B/frame = 3 AMBE frames of 9B) -> table 33
        codec -> PCM."""
        from digiham_tpu.protocols.dmr import make_decoder
        payload = np.tile([1, 3, 0, 2], 27)
        frames = [voice_frame(s % 2, payload, sync=True) for s in range(6)]
        voice_bytes = make_decoder().process(np.concatenate(frames))
        assert len(voice_bytes) % 27 == 0 and voice_bytes

        server = MockCodecServer()
        server.start()
        synth = MbeSynthesizer(server.client_sock)
        synth.set_mode(TableMode(33))
        assert synth.channel_bytes() == 9
        shipped = synth.process(voice_bytes)
        assert shipped == len(voice_bytes) // 9
        pcm = wait_pcm(synth, shipped * 18)
        assert len(pcm) == shipped * 18
        synth.close()
