from .regression import (
    TrainResult,
    load_model,
    predict,
    predict_single,
    save_model,
    train_regressor,
)

__all__ = ["TrainResult", "load_model", "predict", "predict_single", "save_model", "train_regressor"]
