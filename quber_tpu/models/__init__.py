from quber_tpu.models.mask_refiner import MaskRefiner, MaskRefinerConfig
from quber_tpu.models.cgnet import CGNet
from quber_tpu.models.lmffnet import LMFFNet

__all__ = ["MaskRefiner", "MaskRefinerConfig", "CGNet", "LMFFNet"]
