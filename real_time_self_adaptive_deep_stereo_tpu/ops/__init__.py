from real_time_self_adaptive_deep_stereo_tpu.ops.conv import (  # noqa: F401
    channel_shuffle_inside_group,
    conv2d,
    conv2d_transpose,
    depthwise_conv,
    dilated_conv2d,
    grouped_conv2d,
    init_conv,
    leaky_relu,
    separable_conv2d,
)
from real_time_self_adaptive_deep_stereo_tpu.ops.correlation import (  # noqa: F401
    correlation,
    correlation_jnp,
    correlation_pallas,
)
from real_time_self_adaptive_deep_stereo_tpu.ops.resize import (  # noqa: F401
    crop_or_pad,
    pad_image,
    padded_shape,
    resize_bilinear,
    resize_to,
)
from real_time_self_adaptive_deep_stereo_tpu.ops.warp import (  # noqa: F401
    bilinear_sampler,
    resolve_warp_mode,
    warp_features_horizontal,
    warp_features_horizontal_shift,
    warp_image,
    warp_image_shift,
)
