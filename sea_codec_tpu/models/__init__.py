from .common import EncodedSamples
from .cbr import CbrEncoderModel
from .vbr import VbrEncoderModel
from .decoder import DecoderModel

__all__ = ["EncodedSamples", "CbrEncoderModel", "VbrEncoderModel", "DecoderModel"]
