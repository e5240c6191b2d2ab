from basd_tpu.utils.profiling import StepTimer, profile_trace, step_cost_analysis  # noqa: F401
from basd_tpu.utils.debug import configure_debug  # noqa: F401
