from real_time_self_adaptive_deep_stereo_tpu.adapt.blocks import (  # noqa: F401
    Block,
    load_block_config,
    make_blocks,
)
from real_time_self_adaptive_deep_stereo_tpu.adapt.engine import (  # noqa: F401
    AdaptationEngine,
    d1_metric,
    disparity_metrics,
)
from real_time_self_adaptive_deep_stereo_tpu.adapt.runner import (  # noqa: F401
    OnlineAdaptationSession,
    SessionStats,
)
from real_time_self_adaptive_deep_stereo_tpu.adapt.samplers import (  # noqa: F401
    AVAILABLE_SAMPLER,
    get_sampler,
    softmax,
)
