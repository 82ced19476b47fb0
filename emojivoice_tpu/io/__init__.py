from emojivoice_tpu.io.torch_ckpt import (
    load_hifigan_params,
    load_matcha_params,
    load_torch_state_dict,
)
from emojivoice_tpu.io.checkpoint import CheckpointManager

__all__ = [
    "load_torch_state_dict",
    "load_matcha_params",
    "load_hifigan_params",
    "CheckpointManager",
]
