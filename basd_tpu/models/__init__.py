from basd_tpu.models.specs import ModelSpec, resolve_preset  # noqa: F401
from basd_tpu.models.vit import VisionTransformer, ViTConfig  # noqa: F401
from basd_tpu.models.cnn import ConvNeXt, ConvNeXtConfig, ResNet, ResNetConfig  # noqa: F401
from basd_tpu.models.factory import create_student, derive_student_arch  # noqa: F401
from basd_tpu.models.teacher import (  # noqa: F401
    Teacher,
    estimate_intrinsic_dim,
    extract_intermediates,
    load_teacher,
)
