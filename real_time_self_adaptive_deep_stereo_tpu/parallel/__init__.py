from real_time_self_adaptive_deep_stereo_tpu.parallel.sharding import (  # noqa: F401
    batch_sharded,
    make_mesh,
    replicated,
    shard_batch,
    width_sharded,
)
from real_time_self_adaptive_deep_stereo_tpu.parallel.train import (  # noqa: F401
    make_dp_train_step,
    make_spatial_adapt_step,
)
