"""Static shape buckets.

XLA compiles one program per distinct input shape.  The reference tolerates
fully dynamic shapes (torch eager; `.item()` graph break at
matcha/models/matcha_tts.py:124-126).  Here every host→device entry point
pads to the smallest bucket ≥ the true length, bounding the number of
compiled programs to ``len(buckets)`` (text) × ``len(buckets)`` (mel).

Buckets are multiples of 4 (U-Net down/up symmetry; reference
matcha/utils/model.py:14-20) and sized so the padded mel time dim tiles
well on the VPU/MXU (multiples of 128 for the larger ones).
"""

from __future__ import annotations

from typing import Sequence


def default_text_buckets() -> tuple:
    # interspersed phoneme sequences: 2*len+1; typical utterances < 512
    return (64, 128, 192, 256, 384, 512)


def default_mel_buckets() -> tuple:
    # 22.05 kHz, hop 256 → 86 frames/s; 2048 frames ≈ 23.8 s of speech
    return (128, 256, 384, 512, 768, 1024, 1536, 2048)


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket ≥ n; raises if n exceeds the largest bucket."""
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"Length {n} exceeds largest bucket {buckets[-1]}")


def pad_to(arr, target: int, axis: int = -1, value=0):
    """Pad a numpy array along `axis` up to `target` with `value`."""
    import numpy as np

    pad = target - arr.shape[axis]
    if pad < 0:
        raise ValueError(f"Array dim {arr.shape[axis]} exceeds target {target}")
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=value)
