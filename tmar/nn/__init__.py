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
from tmar.nn.dudo import DuDoMARNet

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
    "DuDoMARNet",
]
