from .meta import (
    StringSerializer,
    MetaWriter,
    FileMetaWriter,
    PipelineMetaWriter,
    MetaCollector,
)
from .stream import SampleBuffer, StreamDriver
