"""Model zoo: EMG encoder (transduction + recognition heads), HiFi-GAN."""

from .transformer import RelativePositionalAttention, TransformerEncoderLayer
from .encoder import ResBlock, EMGEncoder

__all__ = [
    "RelativePositionalAttention", "TransformerEncoderLayer",
    "ResBlock", "EMGEncoder",
]
