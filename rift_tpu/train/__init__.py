"""Trainer layer (SURVEY.md §2.1 + §5): config, jitted steps, loops,
meters, checkpointing, metric logging."""
from .config import (  # noqa: F401
    EvalConfig,
    ExperimentConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    apply_overrides,
    get_config,
    presets,
)
from .loop import build_model, evaluate_registration, train  # noqa: F401
from .meters import (  # noqa: F401
    MeterClassification,
    MeterReflection,
    MeterRegistration,
    MeterRPMNet,
    MeterShapeNetIoU,
)
from .steps import TrainState, create_state, make_eval_step, make_train_step  # noqa: F401
