from tmar.nn.ngswin import NGswin
from tmar.nn.patchgan import (
    SingleScaleDiscriminator,
    MultiScaleDiscriminator,
    ConditionalDiscriminator,
)
from tmar.nn.baselines import (
    RedCNN,
    DenoisingTransformer,
    BAFResNet,
    DCGANDiscriminator,
    DCGANGenerator,
)

__all__ = [
    "NGswin",
    "SingleScaleDiscriminator",
    "MultiScaleDiscriminator",
    "ConditionalDiscriminator",
    "RedCNN",
    "DenoisingTransformer",
    "BAFResNet",
    "DCGANDiscriminator",
    "DCGANGenerator",
]
