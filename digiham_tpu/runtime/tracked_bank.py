"""TrackedChannelBank: acquisition/tracking split at scale (DMR).

The plain ChannelBank runs full symbol-domain phase machines per channel.
This bank moves the steady state onto the device: host SyncPhase hunts for
frame lock per channel (vectorized numpy scan); once locked, the bank
extracts frame-aligned dibit windows for ALL locked channels, decodes
every frame's fields in ONE batched device call
(pipeline.dmr.dmr_decode_frames), and feeds the lightweight
FieldsFramePhase per channel — no host FEC at all.

Output contract: byte- and event-identical to running
protocols.dmr.Decoder per channel (asserted by tests/test_tracked_bank.py
on structured, corrupted, and noise streams).
"""
from __future__ import annotations

import numpy as np

from ..protocols.dmr.fields_phase import FieldsFramePhase, FrameFields
from ..protocols.dmr.meta import MetaCollector
from ..protocols.dmr.phases import FRAME_SIZE, SyncPhase
from ..runtime.decoder import Output
from .stream import SampleBuffer


class _Channel:
    __slots__ = ("buffer", "hunt", "frame_phase", "meta", "out")

    def __init__(self):
        self.buffer = np.zeros(0, np.uint8)
        self.hunt = SyncPhase()
        self.frame_phase: FieldsFramePhase | None = None
        self.meta = MetaCollector()
        self.out = Output()


class TrackedChannelBank:
    """DMR bank: device pipeline -> batched field decode -> host trackers.

    pipeline: DmrPipeline-compatible (its step outputs ``dibits``).
    """

    def __init__(self, pipeline, on_output=None, slot_filter: int = 3):
        import jax.numpy as jnp

        self.pipeline = pipeline
        self.channels = pipeline.channels
        self.state = pipeline.init_state()
        self.samples = SampleBuffer(self.channels)
        self.on_output = on_output
        self.slot_filter = slot_filter
        self.chans = [_Channel() for _ in range(self.channels)]
        sps = pipeline.sps
        self._need = pipeline.n_centuries * (100 * sps + 1) + 2
        # fixed device batch size: every channel's worst-case frame count
        self._max_frames = pipeline.symbols_per_block // FRAME_SIZE + 2
        self._batch = self.channels * self._max_frames
        self._jnp = jnp

    def set_meta_writer(self, channel: int, writer) -> None:
        self.chans[channel].meta.set_writer(writer)

    # ------------------------------------------------------------------
    def push(self, samples: np.ndarray) -> None:
        import jax.numpy as jnp

        self.samples.push(samples)
        while True:
            pos = np.asarray(self.state.demod.pos)
            need = int(pos.max()) + self._need
            if self.samples.fill < need:
                return
            block = self.samples.view(need)
            out, self.state = self.pipeline.step(jnp.asarray(block),
                                                 self.state)
            self._consume_dibits(np.asarray(out["dibits"]))
            new_pos = np.asarray(self.state.demod.pos)
            base = int(new_pos.min())
            if base > 0:
                self.samples.consume(base)
                self.state.demod.pos = self.state.demod.pos - jnp.int32(base)

    def push_dibits(self, dibits: np.ndarray) -> None:
        """Symbol-domain entry (bypasses the sample pipeline): feeds the
        tracking machinery directly; used by tests and by external
        demodulators."""
        self._consume_dibits(np.asarray(dibits, np.uint8))

    # ------------------------------------------------------------------
    def _consume_dibits(self, dibits: np.ndarray) -> None:
        for c, ch in enumerate(self.chans):
            ch.buffer = np.concatenate([ch.buffer, dibits[c]])
        # alternate hunting and batched frame decoding until quiescent
        # (a channel may lock, decode, lose lock, and re-lock within one
        # block — the per-channel Decoder would too)
        while True:
            for ch in self.chans:
                self._hunt(ch)
            if self._decode_round() == 0:
                break

    def _decode_round(self) -> int:
        from ..pipeline.dmr import dmr_decode_frames

        # gather frame-aligned windows from all locked channels
        frames = np.zeros((self._batch, FRAME_SIZE), np.uint8)
        owners: list[tuple[int, int]] = []  # (channel, frame_index_in_buf)
        idx = 0
        for c, ch in enumerate(self.chans):
            if ch.frame_phase is None:
                continue
            n = 0
            while len(ch.buffer) - n * FRAME_SIZE > FRAME_SIZE \
                    and idx + 1 <= self._batch:
                frames[idx] = ch.buffer[n * FRAME_SIZE:(n + 1) * FRAME_SIZE]
                owners.append((c, n))
                idx += 1
                n += 1
        if not idx:
            return 0

        fields = dmr_decode_frames(self._jnp.asarray(frames))
        host = {k: np.asarray(v) for k, v in fields.items()}

        # feed per channel, in order; stop a channel at lock loss
        fed = 0
        per_chan: dict[int, list[int]] = {}
        for row, (c, n) in enumerate(owners):
            per_chan.setdefault(c, []).append(row)
        for c, rows in per_chan.items():
            ch = self.chans[c]
            consumed_frames = 0
            for row in rows:
                f = FrameFields(
                    tact_ok=bool(host["tact_ok"][row]),
                    tact_slot=int(host["tact_slot"][row]),
                    sync_type=int(host["sync_type"][row]),
                    emb_ok=bool(host["emb_ok"][row]),
                    emb_lcss=int(host["emb_lcss"][row]),
                    emb_fragment=host["emb_fragment"][row].tobytes(),
                    voice_payload=host["voice_payload"][row].tobytes(),
                    slot_type_ok=bool(host["slot_type_ok"][row]),
                    data_type=int(host["data_type"][row]),
                    bptc_ok=bool(host["bptc_ok"][row]),
                    lc_bytes=np.packbits(
                        host["bptc_data"][row].astype(np.uint8)).tobytes(),
                )
                voice, lost = ch.frame_phase.process_fields(f)
                if voice and self.on_output is not None:
                    self.on_output(c, voice)
                fed += 1
                if lost:
                    # drop back to hunting from this frame's start
                    ch.frame_phase = None
                    ch.hunt = SyncPhase()
                    break
                consumed_frames += 1
            ch.buffer = ch.buffer[consumed_frames * FRAME_SIZE:]
        return fed

    def _hunt(self, ch: _Channel) -> None:
        """Run the host SyncPhase over the channel's buffer until lock or
        exhaustion (same semantics as the per-channel Decoder driver)."""
        while ch.frame_phase is None \
                and len(ch.buffer) > ch.hunt.required_data():
            nxt, consumed = ch.hunt.process(ch.buffer, ch.out)
            ch.buffer = ch.buffer[consumed:]
            if nxt is not None:
                # locked: frame starts at current buffer front
                ch.frame_phase = FieldsFramePhase(ch.meta)
                ch.frame_phase.set_slot_filter(self.slot_filter)
                return
            if consumed == 0:
                return
