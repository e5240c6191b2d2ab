from basd_tpu.evaluation.metrics import (  # noqa: F401
    evaluate_model,
    measure_efficiency,
    run_eval_suite,
    save_metrics,
)
