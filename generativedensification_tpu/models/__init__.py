"""Flax model zoo: DINO ViT image encoder, LaRa-style volume transformer,
coarse/fine Gaussian decoder, and the full Generative Densification network."""

from .vit import VisionTransformer, DinoEncoder, DINO_MEAN, DINO_STD
from .backbone import (
    ModLN,
    GroupAttBlock,
    VolTransformer,
    GaussianDecoder,
    build_dense_grid,
    project_points,
    bilinear_sample,
)
from .network import Network, NetworkConfig

__all__ = [
    "VisionTransformer",
    "DinoEncoder",
    "DINO_MEAN",
    "DINO_STD",
    "ModLN",
    "GroupAttBlock",
    "VolTransformer",
    "GaussianDecoder",
    "build_dense_grid",
    "project_points",
    "bilinear_sample",
    "Network",
    "NetworkConfig",
]
