from .dmr import (
    DmrPipeline,
    dmr_sync_correlate,
    dmr_decode_frames,
)
from .ysf import YsfPipeline, ysf_sync_correlate, ysf_decode_frames
from .nxdn import NxdnPipeline, nxdn_sync_correlate
from .fsk import FskPipeline
