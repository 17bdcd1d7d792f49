"""Neural networks for the example applications (flax.linen)."""

from .tcn import Encoder, ParameterNetwork, ParameterProjector, TCNBlock
from .style import StyleTransferNet, apply_style_chain, make_style_processors

__all__ = [
    "TCNBlock",
    "ParameterNetwork",
    "Encoder",
    "ParameterProjector",
    "StyleTransferNet",
    "apply_style_chain",
    "make_style_processors",
]
