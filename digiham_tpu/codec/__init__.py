from .modes import Mode, TableMode, ControlWordMode, DynamicMode
from .mbe import MbeSynthesizer, ConnectionError_, ProtocolError, VersionError
