"""HiFi-GAN fine-tuning on acoustic-model-GENERATED mels, end to end.

The reference vendors this data path as ``MelDataset(fine_tuning=True,
base_mels_path=...)`` (Matcha-TTS/matcha/hifigan/meldataset.py:168-200):
conditioning mels come from .npy files the acoustic model produced, cropped
time-aligned with the ground-truth wav, while the mel-loss target is still
computed from the wav (meldataset.py:201-211).  It ships no tool to produce
those mels and no trainer that consumes them; here the full recipe runs:

  emojivoice-get-durations --gen_mels   → teacher-forced CFM mels (frames
                                          1:1 with the real waveform via the
                                          ground-truth MAS alignment)
  emojivoice-vocoder-proof --filelist --gen_mels_dir
                                        → GAN fine-tune conditioned on them
"""

import jax
import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow


def test_gen_mels_dump_and_vocoder_finetune(tmp_path):
    from emojivoice_tpu.config import HiFiGANConfig, OptimizerConfig, get_preset
    from emojivoice_tpu.data.audio_np import load_wav, mel_spectrogram_np
    from emojivoice_tpu.io.torch_ckpt import export_matcha_state_dict
    from emojivoice_tpu.training import create_train_state
    from emojivoice_tpu.training.get_durations import main as durs_main
    from emojivoice_tpu.training.proof import make_dataset
    from emojivoice_tpu.training.vocoder_proof import run_vocoder_proof

    train_fl, _ = make_dataset(tmp_path / "data", tuple(range(4)), n_utts=6,
                               seconds=2.0, seed=0)

    # tiny acoustic model exported as a torch checkpoint (the tool's input
    # format, like test_get_durations)
    root = get_preset("tiny")
    state = create_train_state(root.model, OptimizerConfig(), seed=0)
    sd = export_matcha_state_dict(jax.device_get(state.params), root.model)
    ckpt = tmp_path / "tiny.ckpt"
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v).copy())
                               for k, v in sd.items()}}, ckpt)

    out_dir = tmp_path / "durs"
    rc = durs_main(["--checkpoint_path", str(ckpt), "--filelist", str(train_fl),
                    "--preset", "tiny", "--output_dir", str(out_dir),
                    "--batch_size", "3", "--gen_mels", "--n_timesteps", "2"])
    assert rc == 0

    # per utterance: channels-last (T, 80), finite, frames == Σ durations
    # (teacher forcing — the generated mel is 1:1 with the real waveform),
    # and actually generated (differs from the ground-truth mel)
    rows = [r for r in train_fl.read_text().splitlines() if r.strip()]
    assert rows
    for row in rows:
        wav_path = row.split("|")[0]
        stem = wav_path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
        gm = np.load(out_dir / "gen_mels" / f"{stem}.npy")
        durs = np.load(out_dir / "durations" / f"{stem}.npy")
        assert gm.ndim == 2 and gm.shape[1] == 80, gm.shape
        assert np.isfinite(gm).all()
        assert gm.shape[0] == int(round(durs.sum()))
        wav, sr = load_wav(wav_path)
        gt = mel_spectrogram_np(wav, 1024, 80, sr, 256, 1024, 0.0, 8000.0)
        n = min(gm.shape[0], gt.shape[0])
        assert float(np.abs(gm[:n] - gt[:n]).mean()) > 1e-3

    # GAN fine-tune conditioned on the generated mels.  The vocoder must
    # match the acoustic front-end: 80 mels, upsample == hop 256.
    voc_cfg = HiFiGANConfig(
        upsample_rates=(8, 8, 4),
        upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        num_mels=80,
    )
    assert voc_cfg.total_upsample == 256
    s = run_vocoder_proof(str(tmp_path / "voc"), steps=8, batch_size=2,
                          segment_frames=16, window=3, cfg=voc_cfg,
                          log_every=2, filelist=str(train_fl),
                          gen_mels_dir=str(out_dir / "gen_mels"))
    # the harness itself asserts the mel-L1 drop and finite losses
    assert s["fine_tuning"] is True
    assert s["data"] == "filelist"


def test_gen_mels_layout_rejected(tmp_path):
    """A channels-first (reference-layout) mel dir fails loudly, not as a
    silently transposed conditioning tensor."""
    from emojivoice_tpu.config import HiFiGANConfig
    from emojivoice_tpu.training.proof import make_dataset
    from emojivoice_tpu.training.vocoder_proof import run_vocoder_proof

    train_fl, _ = make_dataset(tmp_path / "data", (0, 1), n_utts=2,
                               seconds=0.5, seed=0)
    mel_dir = tmp_path / "mels"
    mel_dir.mkdir()
    for row in train_fl.read_text().splitlines():
        stem = row.split("|")[0].rsplit("/", 1)[-1].rsplit(".", 1)[0]
        np.save(mel_dir / f"{stem}.npy", np.zeros((80, 40), np.float32))  # (C, T)
    with pytest.raises(ValueError, match="channels-last"):
        run_vocoder_proof(str(tmp_path / "voc"), steps=1, batch_size=1,
                          segment_frames=4, cfg=HiFiGANConfig(),
                          filelist=str(train_fl), gen_mels_dir=str(mel_dir))
