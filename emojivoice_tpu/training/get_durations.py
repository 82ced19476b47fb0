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

``--gen_mels`` additionally saves ``gen_mels/<stem>.npy`` — the model's
TEACHER-FORCED mel for each utterance: the CFM decode conditioned on the
ground-truth MAS alignment, so the generated frames line up 1:1 with the
real waveform.  These are the conditioning inputs for HiFi-GAN fine-tuning
on model-generated mels (the reference vendors exactly this data path as
``MelDataset(fine_tuning=True, base_mels_path=...)``,
Matcha-TTS/matcha/hifigan/meldataset.py:168-200, but ships no tool to
produce the mels; ``emojivoice-vocoder-proof --gen_mels_dir`` consumes
them).  Files are channels-last (T_mel, n_feats) f32 in the vocoder's
log-mel domain (denormalized decoder output).
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
    p.add_argument("--gen_mels", action="store_true",
                   help="also save gen_mels/<stem>.npy — teacher-forced CFM "
                        "mels aligned to the ground-truth waveform, for "
                        "HiFi-GAN fine-tuning (meldataset.py fine_tuning "
                        "branch analog)")
    p.add_argument("--n_timesteps", type=int, default=10,
                   help="CFM Euler steps for --gen_mels")
    p.add_argument("--temperature", type=float, default=0.667,
                   help="CFM noise temperature for --gen_mels")
    p.add_argument("--seed", type=int, default=0,
                   help="noise stream for --gen_mels (one fold_in per batch)")
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
    # outputs key by basename stem (the reference's scheme); filelists with
    # duplicate stems across speaker directories would silently overwrite
    # each other and --gen_mels_dir consumers would then load the WRONG
    # conditioning mel — fail loudly up front instead
    seen: dict = {}
    for p_, _, _ in ds.items:
        stem = Path(p_).stem
        if stem in seen and seen[stem] != p_:
            raise SystemExit(
                f"duplicate basename stem {stem!r} in {args.filelist}: "
                f"{seen[stem]} and {p_} would overwrite each other under "
                f"durations/ and gen_mels/ — rename the files or split the filelist")
        seen[stem] = p_
    batcher = BucketBatcher(ds, args.batch_size, shuffle=False)
    out_dir = Path(args.output_dir)
    (out_dir / "durations").mkdir(parents=True, exist_ok=True)
    if args.gen_mels:
        (out_dir / "gen_mels").mkdir(parents=True, exist_ok=True)

    def _forward(mdl, x, x_lengths, y, y_lengths, spks, rng):
        """MAS alignment (training forward), plus — under --gen_mels — the
        teacher-forced decode: CFM conditioned on mu expanded by the
        GROUND-TRUTH durations (attn summed over mel frames), so the output
        covers exactly y_lengths frames, 1:1 with the real wav.  This is the
        mel HiFi-GAN fine-tuning conditions on (meldataset.py:168-200)."""
        _, _, _, attn = mdl(x, x_lengths, y, y_lengths, spks,
                            rng=jax.random.PRNGKey(0), deterministic=True)
        if not args.gen_mels:  # static at trace time
            return attn, None
        mu_x, _, _, x_mask, spk_e = mdl.encode_text(x, x_lengths, spks)
        out = mdl.decode_mel(mu_x, attn.sum(axis=-1)[..., None], y_lengths,
                             x_mask, spk_e, y.shape[1],
                             n_timesteps=args.n_timesteps,
                             temperature=args.temperature, rng=rng)
        return attn, out["mel"]

    fwd = jax.jit(lambda p_, *a: model.apply(p_, *a, method=_forward))

    idx = 0
    for bi, batch in enumerate(batcher):
        attn, gen_mel = fwd(params, jnp.asarray(batch["x"]), jnp.asarray(batch["x_lengths"]),
                            jnp.asarray(batch["y"]), jnp.asarray(batch["y_lengths"]),
                            jnp.asarray(batch["spks"]),
                            jax.random.fold_in(jax.random.PRNGKey(args.seed), bi))
        durs = np.asarray(attn.sum(axis=-1))  # (B, T_x)
        if gen_mel is not None:
            gen_mel = np.asarray(gen_mel)
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
            if gen_mel is not None:
                ly = int(batch["y_lengths"][i])
                np.save(out_dir / "gen_mels" / f"{stem}.npy",
                        gen_mel[i, :ly].astype(np.float32))
            idx += 1
        print(f"[get-durations] {idx}/{len(ds)}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
