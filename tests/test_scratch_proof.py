"""From-scratch convergence harness at tiny dims (scratch_proof.py).

The committed flagship evidence lives in docs/artifacts/scratch_proof/; this
pins the harness itself on CPU: random init (no surrogate checkpoint), the
alignable corpus, --probe_every diagnostics, and the emergence trends the
reference never measured (its evidence is loss curves + eyeballed alignment
images, baselightningmodule.py:177-216).
"""

import json

import numpy as np
import pytest

from emojivoice_tpu.training.scratch_proof import (
    make_texts,
    render_utterance,
    run_scratch_proof,
)


def test_make_texts_wide_length_spread():
    texts = make_texts(40, seed=0)
    assert len(texts) == 40 and texts == make_texts(40, seed=0)  # deterministic
    lens = sorted(len(t) for t in texts)
    # 1-phrase shorts through 4-phrase longs: a real multi-bucket spread
    assert lens[0] < 40 and lens[-1] > 90
    assert all(t == t.lower() for t in texts)  # basic_cleaners-safe


def test_render_utterance_is_alignable():
    """Per-character tones: total length tracks the character-duration sum
    and speakers differ (timbre/tempo), same text."""
    wav = render_utterance("abc de", spk=0, seed=1)
    assert wav.dtype == np.float32 and np.isfinite(wav).all()
    # 5 chars (~0.10/0.16 s) + 1 space (0.06 s): loosely 0.4-1.0 s
    assert 0.3 * 22050 < len(wav) < 1.2 * 22050
    other = render_utterance("abc de", spk=3, seed=1)
    n = min(len(wav), len(other))
    assert np.abs(wav[:n] - other[:n]).max() > 1e-3


@pytest.mark.slow
def test_scratch_emergence_tiny(tmp_path):
    summary = run_scratch_proof(
        "tiny", str(tmp_path), steps=24, batch_size=4, num_devices=1,
        probe_every=8, utts=6, n_speakers=3, lr=2e-3, log_every=4,
        assert_emergence=True, assert_free_synth=False,
    )
    # asserts (diagonality rise, MAS drift shrink, dur MSE fall, TF mel-L1
    # fall, loss fall) ran inside run_scratch_proof; pin the artifact shape
    assert summary["from_scratch"] is True
    assert summary["probe_steps"][0] == 0  # random-init baseline probe
    assert len(summary["diagonality"]) >= 3
    # probe records landed in metrics.jsonl with the row-0 duration trace
    recs = [json.loads(l) for l in
            (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()]
    probes = [r for r in recs if r["tag"] == "probe"]
    assert all("mas_dur_row0" in p for p in probes)
    # free-synth diagnostics are reported even when not asserted
    fs = summary["free_synth"]
    assert fs["frames_gt"] > 0 and fs["mel_l1_overlap"] > 0
    # v2 evidence fields: corpus stats + compiled-shape census + step rate
    assert summary["corpus"]["n_utts"] == 6
    census = summary["shape_census"]
    assert census is not None and census["distinct_shapes"] >= 1
    assert all(s["first_step"] <= 24 for s in census["shapes"])
