from basd_tpu.ops.augment import (  # noqa: F401
    hflip,
    normalize,
    random_resized_crop,
    trivial_augment_wide,
)
from basd_tpu.ops.preprocess import center_crop_resize, dual_view  # noqa: F401
from basd_tpu.ops.mixup import mixup_cutmix  # noqa: F401
