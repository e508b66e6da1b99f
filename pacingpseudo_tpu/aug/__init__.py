from .params import BaseAugParams, StrongAugParams
from .engine import (
    base_augment_sample,
    augment_batch,
    eval_preprocess_batch,
    make_train_augment_fn,
)
from . import presets
