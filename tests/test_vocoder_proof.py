"""Vocoder GAN proof harness end to end at tiny dims (CPU).

The flagship-scale twin of this run (real v5e, full HiFiGANConfig) lives in
docs/artifacts/tpu_vocoder_proof/.
"""

import json

import pytest

pytestmark = pytest.mark.slow


def test_vocoder_proof_tiny(tmp_path):
    from emojivoice_tpu.training.vocoder_proof import run_vocoder_proof
    from tests.test_vocoder import tiny_hifigan

    # log_every=2 exercises the pipelined-metrics cadence (fetch every Nth
    # step; the remote-TPU steady state) — records land at 2,4,...,10
    s = run_vocoder_proof(
        str(tmp_path), steps=10, batch_size=2, segment_frames=32, utts=6,
        window=3, cfg=tiny_hifigan(), n_fft=64, win_size=64, log_every=2,
    )
    # the harness itself asserts the windowed mel-L1 drop; re-check the
    # artifact contract here
    assert (tmp_path / "before.wav").exists()
    assert (tmp_path / "after.wav").exists()
    assert s["mel_l1_last_mean"] < s["mel_l1_first_mean"]
    recs = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert [r["step"] for r in recs] == [2, 4, 6, 8, 10]
    assert {"d_loss", "g_loss", "mel_l1", "fm_loss", "adv_loss"} <= set(recs[0])
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert summary["steps"] == 10
