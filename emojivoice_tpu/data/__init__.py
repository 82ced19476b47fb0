from emojivoice_tpu.data.dataset import TextMelDataset, BucketBatcher, parse_filelist
from emojivoice_tpu.data.audio_np import load_wav, mel_spectrogram_np, resample_poly_np

__all__ = [
    "TextMelDataset",
    "BucketBatcher",
    "parse_filelist",
    "load_wav",
    "mel_spectrogram_np",
    "resample_poly_np",
]
