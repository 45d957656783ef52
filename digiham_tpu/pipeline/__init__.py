from .dmr import (
    DmrPipeline,
    dmr_sync_correlate,
    dmr_decode_frames,
)
