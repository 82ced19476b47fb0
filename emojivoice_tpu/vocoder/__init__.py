from emojivoice_tpu.vocoder.hifigan import HiFiGANGenerator
from emojivoice_tpu.vocoder.denoiser import Denoiser

__all__ = ["HiFiGANGenerator", "Denoiser"]
