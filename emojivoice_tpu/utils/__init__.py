from emojivoice_tpu.utils.masks import (
    fix_len_compatibility,
    generate_path,
    intersperse,
    sequence_mask,
)
from emojivoice_tpu.utils.norm import denormalize, normalize
from emojivoice_tpu.utils.buckets import pick_bucket, default_text_buckets, default_mel_buckets

__all__ = [
    "sequence_mask",
    "fix_len_compatibility",
    "generate_path",
    "intersperse",
    "normalize",
    "denormalize",
    "pick_bucket",
    "default_text_buckets",
    "default_mel_buckets",
]
