from .pipeline import (
    evaluate,
    grid_scenarios,
    predict_single,
    train_et_model,
)

__all__ = ["train_et_model", "evaluate", "grid_scenarios", "predict_single"]
