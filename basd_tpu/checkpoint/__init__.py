from basd_tpu.checkpoint.manager import CheckpointManager  # noqa: F401
