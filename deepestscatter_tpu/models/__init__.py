from .blocks import DisneyBlock, LogTransform  # noqa: F401
from .rpnn import DisneyModel  # noqa: F401
from .probes import (  # noqa: F401
    BakedModel,
    LightProbeModel,
    MimicModel,
    ProbeRendererModel,
)
