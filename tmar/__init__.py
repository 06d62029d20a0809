"""tmar — TPU-native CT Metal Artifact Reduction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mpat247/TransMAR-GAN (see SURVEY.md): an NGswin generator, a multi-scale
spectral-norm PatchGAN discriminator, metal-aware GAN losses with a
differentiable sinogram physics-consistency term (native XLA Radon transform),
SynDeepLesion/SpineWeb data pipelines, a jit-compiled data-parallel GAN
trainer, and a full evaluation / ablation / benchmark harness.

Layering (bottom-up):
    tmar.core       device mesh / sharding / precision policy
    tmar.ops        pure-array ops (window, attention, n-gram, radon, morphology)
    tmar.nn         flax modules (NGswin, MS-PatchGAN, baselines)
    tmar.losses     pure loss functions
    tmar.data       host-side input pipelines
    tmar.train      jit'd GAN train steps, trainer, variant/ablation matrix
    tmar.eval       metrics, full-slice/tiled inference, timing harness
    tmar.checkpoint orbax checkpointing + PyTorch .pth import
"""

__version__ = "0.1.0"
