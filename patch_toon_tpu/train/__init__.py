from patch_toon_tpu.train.model import StyleTransferModel
from patch_toon_tpu.train.state import GANTrainState
from patch_toon_tpu.train.step import make_train_step

__all__ = ["StyleTransferModel", "GANTrainState", "make_train_step"]
