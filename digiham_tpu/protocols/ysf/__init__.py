from .decoder import make_decoder
from .meta import MetaCollector
from .phases import SyncPhase, FramePhase
from .fich import Fich
