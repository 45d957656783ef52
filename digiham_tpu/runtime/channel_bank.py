"""ChannelBank: the production many-channel orchestration.

Glues the three layers end to end:

  SampleBuffer (host, numpy/C++)  ->  device pipeline (one fused XLA
  program over [channels, block])  ->  per-channel host phase machines
  (protocol decoders with metadata writers)

The device does all O(samples) math; the host consumes the demodulated
symbol block per channel — O(symbols) work — through the same Decoder
objects the single-channel CLI uses, so outputs and metadata are
bit-identical to the reference path.
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from .stream import SampleBuffer


class ChannelBank:
    """Drives a device pipeline and a bank of host decoders.

    pipeline: object with ``init_state()`` and jittable
        ``step(samples [C, L], state) -> (outputs, state)`` where
        ``outputs["dibits"]`` is [C, S] and ``state.demod.pos`` holds the
        per-channel consumed positions (DmrPipeline-compatible).
    decoders: one protocol Decoder per channel (may be None to skip).
    """

    def __init__(self, pipeline, decoders: Sequence,
                 on_output: Callable[[int, bytes], None] | None = None):
        self.pipeline = pipeline
        self.decoders = list(decoders)
        self.channels = pipeline.channels
        assert len(self.decoders) == self.channels
        self.state = pipeline.init_state()
        self.buffer = SampleBuffer(self.channels)
        self.on_output = on_output
        sps = pipeline.sps
        self._need = pipeline.n_centuries * (100 * sps + 1) + 2

    def push(self, samples: np.ndarray) -> list:
        """Feed [C, n] samples; returns list of per-block outputs dicts.

        Decoder payload bytes are routed to ``on_output(channel, data)``.
        """
        import jax.numpy as jnp

        if self.buffer is None:
            raise RuntimeError("bank was flushed; create a new bank")
        self.buffer.push(samples)
        results = []
        while True:
            pos = np.asarray(self.state.demod.pos)
            need = int(pos.max()) + self._need
            if self.buffer.fill < need:
                break
            block = self.buffer.view(need)
            out, self.state = self.pipeline.step(
                jnp.asarray(block), self.state)
            dibits = np.asarray(out["dibits"])
            for c, dec in enumerate(self.decoders):
                if dec is None:
                    continue
                payload = dec.process(dibits[c])
                if payload and self.on_output is not None:
                    self.on_output(c, payload)
            results.append(out)
            new_pos = np.asarray(self.state.demod.pos)
            base = int(new_pos.min())
            if base > 0:
                self._rebase(base, block)
                self.buffer.consume(base)
        return results

    def _rebase(self, base: int, block) -> None:
        import jax.numpy as jnp

        from .stream import rrc_rebase_history

        demod = self.state.demod
        demod.pos = demod.pos - jnp.int32(base)
        rrc = rrc_rebase_history(self.pipeline, self.state,
                                 np.asarray(block), base,
                                 stream_start=self.buffer.consumed == 0)
        if rrc is not None:
            self.state.rrc = rrc

    def flush(self) -> None:
        """End-of-stream: decode the buffered sample tail exactly as the
        reference would at EOF (see TrackedChannelBank.flush). Terminal."""
        from .tracked_bank import _flush_demod

        symbols = _flush_demod(self.pipeline, self.state, self.buffer)
        for c, dec in enumerate(self.decoders):
            if dec is None or not len(symbols[c]):
                continue
            payload = dec.process(symbols[c])
            if payload and self.on_output is not None:
                self.on_output(c, payload)
        self.buffer = None  # further push() fails loudly

    # ------------------------------------------------------------------
    def snapshot(self) -> bytes:
        """Serialize device pytrees + sample backlog + every decoder's
        phase-machine state for bit-exact resume via ``restore``. Meta
        writers (user callbacks) are NOT serialized (same contract as
        TrackedChannelBank.snapshot)."""
        import pickle

        from .checkpoint import save_state
        writers = []
        for dec in self.decoders:
            mc = getattr(dec, "meta_collector", None)
            writers.append(mc.writer if mc is not None else None)
            if mc is not None:
                mc.writer = None
        try:
            dec_blob = pickle.dumps(self.decoders)
        finally:
            for dec, w in zip(self.decoders, writers):
                mc = getattr(dec, "meta_collector", None)
                if mc is not None:
                    mc.writer = w
        return pickle.dumps({
            "pipeline_state": save_state(self.state),
            "decoders": dec_blob,
            "samples": self.buffer.data[:, :self.buffer.fill].copy(),
        })

    def restore(self, blob: bytes) -> None:
        """Inverse of ``snapshot`` on a bank with the same pipeline
        configuration; writers attached to this bank's decoders carry
        over."""
        import pickle

        from .checkpoint import load_state
        payload = pickle.loads(blob)
        if payload["samples"].shape[0] != self.channels:
            raise ValueError(
                f"checkpoint has {payload['samples'].shape[0]} channels, "
                f"bank has {self.channels}")
        self.state = load_state(payload["pipeline_state"])
        prev = self.decoders
        self.decoders = pickle.loads(payload["decoders"])
        for new, old in zip(self.decoders, prev):
            new_mc = getattr(new, "meta_collector", None)
            old_mc = getattr(old, "meta_collector", None)
            if new_mc is not None and old_mc is not None:
                new_mc.writer = old_mc.writer
        self.buffer = SampleBuffer(self.channels)
        if payload["samples"].shape[1]:
            self.buffer.push(payload["samples"])
