from .mmdit import MMDiT, MMDiTConfig  # noqa: F401
from .heads import MultiModalNoiseHead, NoisePredictionHead  # noqa: F401
from .adapters import (  # noqa: F401
    LinearAdapter,
    ModalityEmbedding,
    PositionalEmbedding1D,
    PositionalEmbedding3D,
    TimestepEmbedder,
)
