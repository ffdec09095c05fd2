from maskcyclegan_vc_tpu.ops.layers import (
    Conv1dT,
    Conv2dT,
    GatedConv2d,
    InstanceNorm,
    pixel_shuffle_nhwc,
    swish,
)

__all__ = [
    "Conv1dT",
    "Conv2dT",
    "GatedConv2d",
    "InstanceNorm",
    "pixel_shuffle_nhwc",
    "swish",
]
