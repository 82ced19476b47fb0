"""Canonical single-utterance synthesis recipe.

Equivalent of the reference's synthesis.ipynb: load checkpoint + HiFi-GAN,
synthesise at 10 ODE steps / temperature 0.667 / length_scale 1.0, save a
22.05 kHz wav, print RTF and RTF-with-vocoder.

    python examples/synthesis.py --checkpoint_path paige.ckpt --vocoder g_02500000
    python examples/synthesis.py --random_init     # no checkpoints needed
"""

import argparse

from emojivoice_tpu.inference.cli import save_png, save_wav
from emojivoice_tpu.inference.pipeline import SynthesisPipeline

TEXT = "Hey there! I am an emoji voice, running natively on a TPU."


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_path", default=None)
    p.add_argument("--vocoder", default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--text", default=TEXT)
    p.add_argument("--spk", type=int, default=79)  # 😎
    p.add_argument("--output", default="synthesis_out.wav")
    args = p.parse_args()

    if args.random_init or not args.checkpoint_path:
        pipe = SynthesisPipeline.from_random(cleaners=("basic_cleaners",))
    else:
        pipe = SynthesisPipeline.from_torch_checkpoints(args.checkpoint_path, args.vocoder)

    res = pipe.synthesise([args.text], spks=[args.spk], n_timesteps=10,
                          temperature=0.667, length_scale=1.0)[0]
    save_wav(args.output, res.wav)
    save_png(args.output.replace(".wav", ".png"), res.mel)
    print(f"phonetised: {res.cleaned_text}")
    print(f"{len(res.wav) / res.sample_rate:.2f}s audio → {args.output}")
    print(f"RTF: {res.rtf:.4f}   RTF w/ vocoder: {res.rtf_w:.4f}")


if __name__ == "__main__":
    main()
