from .state import (
    TrainState, latest_checkpoint, save_checkpoint, load_checkpoint,
    load_params_only, natural_keys,
)
from .loop import Trainer, ProfilingStats
