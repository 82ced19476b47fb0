"""emojivoice_tpu — TPU-native expressive emoji-conditioned TTS framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
rosielab/emojivoice (Matcha-TTS conditional-flow-matching acoustic model,
HiFi-GAN vocoder, multilingual phonemization, emoji→speaker-voice
conversational stack).  Design is TPU-first:

* channels-last ``(batch, time, channels)`` layouts everywhere, so the
  feature dimension maps onto TPU vector lanes and matmuls hit the MXU;
* the full synthesis path (text encoder → duration → alignment expansion →
  unrolled fixed-step Euler CFM → HiFi-GAN → denoiser) compiles into a
  single XLA program with static bucketed shapes;
* monotonic alignment search runs *on device* as an anti-diagonal
  wavefront DP (the reference's Cython/OpenMP kernel forced a GPU→CPU
  sync every training step; see ``/root/reference`` at
  Matcha-TTS/matcha/utils/monotonic_align/__init__.py:7-22), with a C++
  OpenMP host kernel as an alternative backend;
* data-parallel training via ``jax.sharding.Mesh`` + ``shard_map`` with
  XLA collectives over ICI (replacing Lightning DDP/NCCL).
"""

__version__ = "0.1.0"

from emojivoice_tpu import config as config

__all__ = ["config", "__version__"]
