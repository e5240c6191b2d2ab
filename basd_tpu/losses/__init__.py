from basd_tpu.losses.interpolate import align_token_count, linear_interp_matrix  # noqa: F401
from basd_tpu.losses.selector import (  # noqa: F401
    SelectorState,
    calibrate_subspace_k,
    init_selector,
    select_and_mix,
)
from basd_tpu.losses.procrustes import procrustes_loss  # noqa: F401
from basd_tpu.losses.combined import (  # noqa: F401
    basd_loss,
    cross_entropy,
    extraction_points,
    uw_so_weights,
)
