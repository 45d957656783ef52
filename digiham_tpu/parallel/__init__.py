from .sharded import (
    make_mesh,
    sharded_rrc_filter,
    sharded_pipeline_step,
    sharded_gfsk_step,
    sharded_fsk_step,
)
from .streaming import (
    TimeShardedPipeline,
    TimeShardedStream,
    TimeShardedDmrPipeline,
    TimeShardedDmrStream,
)
