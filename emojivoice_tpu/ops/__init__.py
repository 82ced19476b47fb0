from emojivoice_tpu.ops.convs import conv1d, conv_transpose1d
from emojivoice_tpu.ops.stft import stft_magnitude_phase, istft, stft_complex
from emojivoice_tpu.ops.mel import mel_filterbank, mel_spectrogram
from emojivoice_tpu.ops.mas import maximum_path

__all__ = [
    "conv1d",
    "conv_transpose1d",
    "stft_magnitude_phase",
    "stft_complex",
    "istft",
    "mel_filterbank",
    "mel_spectrogram",
    "maximum_path",
]
