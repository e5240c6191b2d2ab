from basd_tpu.training.schedule_free import (  # noqa: F401
    ScheduleFreeState,
    schedule_free_adamw,
)
