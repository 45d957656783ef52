from .decoder import make_decoder
from .meta import MetaCollector
from .phases import SyncPhase, HeaderPhase, VoicePhase
from .header import Header
