"""D-Star decoder assembly (src/dstar_decoder/dstar_decoder.cpp:7-9)."""
from __future__ import annotations

from ...runtime.decoder import Decoder
from .meta import MetaCollector
from .phases import SyncPhase


def make_decoder() -> Decoder:
    return Decoder(SyncPhase(), MetaCollector())
