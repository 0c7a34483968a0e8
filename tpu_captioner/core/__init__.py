from tpu_captioner.core.config import (
    DataConfig,
    ModelConfig,
    TrainConfig,
    ExperimentConfig,
    EMBEDDING_PRESETS,
)
