from .norms import rms_norm, layer_norm
from .rope import rope_3d_freqs, rope_apply, RopeTables
from .attention import attention

__all__ = [
    "rms_norm",
    "layer_norm",
    "rope_3d_freqs",
    "rope_apply",
    "RopeTables",
    "attention",
]
