from .decoder import Decoder, make_decoder
from .meta import MetaCollector, Slot
from .phases import SyncPhase, FramePhase, SYNCTYPE_DATA, SYNCTYPE_VOICE
