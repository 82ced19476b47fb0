"""`emojivoice-get-durations` — extract per-phoneme durations with a trained model.

Equivalent of the reference's ``matcha-tts-get-durations``
(reference: Matcha-TTS/matcha/utils/get_durations_from_trained_model.py:31-79
— which is fork-broken there by a ``get_device`` arity change; the intended
behavior is implemented here): run the training forward (MAS) over a
dataset, sum the alignment over mel frames to per-token durations, save
``durations/<stem>.npy`` plus a JSON of per-phoneme frame spans with the
interleaved blanks merged into the following phoneme
(reference blank-merge: matcha/utils/utils.py:223-259).

The resulting .npy files feed ``load_durations: True`` training
(text_mel_datamodule.py:182-197 analog in our data/dataset.py).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def get_phoneme_durations(durations, phones):
    """Merge interleaved blank durations into the following phoneme and
    return cumulative (start, end) spans keyed like the reference
    (utils/utils.py:223-259 behavior: blank id 0 alternates with phones)."""
    prev = durations[0]
    merged = []
    # durations at odd indices are real phones, even are blanks
    for i in range(1, len(durations)):
        if i % 2 == 1:  # phone takes its own + preceding blank
            merged.append(int(prev) + int(durations[i]))
            prev = 0
        else:
            prev = durations[i]
    if prev:
        merged[-1] += int(prev)

    out = {}
    start = 0
    for j, (dur, ph) in enumerate(zip(merged, phones)):
        key = f"{ph}_{j}"
        out[key] = {"starttime": start, "endtime": start + dur, "duration": dur}
        start += dur
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="emojivoice-get-durations")
    p.add_argument("--checkpoint_path", required=True, help="torch .ckpt or orbax dir")
    p.add_argument("--filelist", required=True)
    p.add_argument("--preset", default="emoji_multi")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--batch_size", type=int, default=8)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from emojivoice_tpu.config import get_preset
    from emojivoice_tpu.data.dataset import BucketBatcher, TextMelDataset
    from emojivoice_tpu.io.torch_ckpt import load_matcha_params
    from emojivoice_tpu.models import MatchaTTS
    from emojivoice_tpu.text import sequence_to_text

    params, model_cfg = load_matcha_params(args.checkpoint_path)
    model = MatchaTTS(cfg=model_cfg)
    data_cfg = get_preset(args.preset).data

    ds = TextMelDataset(args.filelist, data_cfg)
    batcher = BucketBatcher(ds, args.batch_size, shuffle=False)
    out_dir = Path(args.output_dir)
    (out_dir / "durations").mkdir(parents=True, exist_ok=True)

    @jax.jit
    def attn_fn(params, x, x_lengths, y, y_lengths, spks):
        _, _, _, attn = model.apply(params, x, x_lengths, y, y_lengths, spks,
                                    rng=jax.random.PRNGKey(0), deterministic=True)
        return attn

    idx = 0
    for batch in batcher:
        attn = attn_fn(params, jnp.asarray(batch["x"]), jnp.asarray(batch["x_lengths"]),
                       jnp.asarray(batch["y"]), jnp.asarray(batch["y_lengths"]),
                       jnp.asarray(batch["spks"]))
        durs = np.asarray(attn.sum(axis=-1))  # (B, T_x)
        for i in range(batch["x"].shape[0]):
            item_path, _, _ = ds.items[idx]
            stem = Path(item_path).stem
            lx = int(batch["x_lengths"][i])
            d = durs[i, :lx].astype(np.float32)
            np.save(out_dir / "durations" / f"{stem}.npy", d)
            phones = [sequence_to_text([t]) for t in batch["x"][i, 1:lx:2]]
            spans = get_phoneme_durations(d.tolist(), phones)
            with open(out_dir / "durations" / f"{stem}.json", "w") as f:
                json.dump(spans, f, ensure_ascii=False, indent=1)
            idx += 1
        print(f"[get-durations] {idx}/{len(ds)}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
