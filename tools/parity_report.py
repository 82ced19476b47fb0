#!/usr/bin/env python
"""One-command checkpoint parity report: real torch ckpt in, verdict out.

Given a reference-format Lightning checkpoint (Paige/Olivia/Zach, or a
``emojivoice-export-torch`` export) and optionally a HiFi-GAN dump, this:

1. converts the checkpoint with the production converter
   (io/torch_ckpt.load_matcha_params — hparams-aware);
2. builds the REAL reference MatchaTTS from the same file
   (tests/reference_harness.build_reference_matcha — reference code
   executing under the harness's import stand-ins);
3. runs both sides on the same texts with the SAME injected noise
   (the reference's torch.randn_like draw is captured and replayed into our
   jitted synthesise — reference semantics: flow_matching.py:51,
   synthesis.ipynb cells 12-18);
4. optionally runs both vocoder+denoiser stacks (cli.py:110-126 operating
   point) and reports waveform MAE;
5. emits a JSON report with per-utterance mel-MAE / wav-MAE and a pass/fail
   verdict against the BASELINE budget (mel-MAE < 1e-2).

Usage (CPU by default — parity needs determinism, not speed):

    python tools/parity_report.py --matcha_ckpt paige.ckpt \
        [--vocoder hifigan_univ_v1] [--texts texts.txt] [--spk 12] \
        [--steps 10] [--output report.json]

Exit code 0 = parity holds, 2 = it does not.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_TEXTS = [
    "The Secret Service believed that it was very doubtful that any President would ride regularly in a vehicle with a fixed top, even though transparent.",
    "Hello there, how are you doing today?",
]


def _parse_texts(args) -> tuple[list[str], list[int]]:
    if args.texts:
        lines = [l.strip() for l in Path(args.texts).read_text().splitlines() if l.strip()]
    else:
        lines = DEFAULT_TEXTS
    texts, spks = [], []
    for line in lines:
        if "|" in line:  # reference file format: text|spk (cli.py:319-345)
            text, spk = line.rsplit("|", 1)
            texts.append(text)
            spks.append(int(spk))
        else:
            texts.append(line)
            spks.append(args.spk)
    return texts, spks


def run_report(args) -> dict:
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from emojivoice_tpu.io.torch_ckpt import (
        convert_matcha_state_dict,
        export_matcha_hparams,
        extract_hyper_parameters,
        infer_model_config_from_state_dict,
        load_torch_state_dict,
        state_dict_arrays,
    )
    from emojivoice_tpu.models import MatchaTTS
    from emojivoice_tpu.text import encode
    from emojivoice_tpu.utils.masks import fix_len_compatibility
    from tests.reference_harness import build_reference_matcha
    from emojivoice_tpu.io.torch_pickle import load_torch_file

    texts, spks = _parse_texts(args)

    # --- load ONCE, share between both sides (real ckpts are hundreds of MB)
    obj = load_torch_file(args.matcha_ckpt)
    hparams = extract_hyper_parameters(obj)
    sd_raw = state_dict_arrays(obj)

    # --- our side: production converter ---------------------------------
    cfg = infer_model_config_from_state_dict(sd_raw, hparams=hparams)
    params = convert_matcha_state_dict(sd_raw, cfg)
    if hparams is None:
        hparams = export_matcha_hparams(cfg)

    # --- reference side: the real torch model ----------------------------
    ref = build_reference_matcha(hparams, sd_raw)

    # --- shared text ids (identical on both sides) -----------------------
    cleaners = (args.cleaner,)
    enc = [encode(t, cleaners) for t in texts]
    max_len = max(int(l[0]) for _, l, _ in enc)
    b = len(texts)
    x_np = np.zeros((b, max_len), np.int64)
    xl_np = np.zeros((b,), np.int64)
    for i, (ids, length, _cleaned) in enumerate(enc):
        xl_np[i] = int(length[0])
        x_np[i, : xl_np[i]] = ids[0, : xl_np[i]]
    spks_np = np.asarray(spks, np.int64)

    # --- reference synthesise with captured noise -------------------------
    noise_rng = np.random.default_rng(args.seed)
    captured: dict = {}
    real_randn_like = torch.randn_like

    def capture_randn_like(mu):
        z = noise_rng.standard_normal(tuple(mu.shape)).astype(np.float32)
        captured["z"] = z
        return torch.from_numpy(z)

    torch.randn_like = capture_randn_like
    try:
        with torch.no_grad():
            ref_out = ref.synthesise(
                torch.from_numpy(x_np), torch.from_numpy(xl_np),
                n_timesteps=args.steps, temperature=args.temperature,
                spks=torch.from_numpy(spks_np) if cfg.n_spks > 1 else None,
                length_scale=args.length_scale,
            )
    finally:
        torch.randn_like = real_randn_like

    z = captured["z"]  # (B, n_feats, T_pad) with T_pad = fix_len(y_max)
    t_pad = z.shape[2]
    assert t_pad == fix_len_compatibility(int(ref_out["mel_lengths"].max())), \
        "reference padded length disagrees with fix_len_compatibility"

    # --- our synthesise at the same padded length, same noise -------------
    model = MatchaTTS(cfg=cfg)
    ours = model.apply(
        params,
        jnp.asarray(x_np.astype(np.int32)), jnp.asarray(xl_np.astype(np.int32)),
        t_pad, args.steps, args.temperature,
        jnp.asarray(spks_np.astype(np.int32)) if cfg.n_spks > 1 else None,
        args.length_scale, None,
        jnp.asarray(z.transpose(0, 2, 1) * args.temperature),
        method=MatchaTTS.synthesise,
    )

    mel_ours = np.asarray(ours["mel"])  # (B, T, C)
    mel_ref = ref_out["mel"].numpy()    # (B, C, T)
    len_ours = np.asarray(ours["mel_lengths"]).astype(int)
    len_ref = ref_out["mel_lengths"].numpy().astype(int)

    report = {
        "checkpoint": str(args.matcha_ckpt),
        "n_texts": b,
        "steps": args.steps,
        "temperature": args.temperature,
        "length_scale": args.length_scale,
        "mel_lengths_ours": len_ours.tolist(),
        "mel_lengths_ref": len_ref.tolist(),
        "durations_match": bool((len_ours == len_ref).all()),
        "tolerance": args.tolerance,
    }
    mel_maes = []
    for i in range(b):
        n = min(len_ours[i], len_ref[i])
        mel_maes.append(float(np.abs(mel_ours[i, :n] - mel_ref[i].T[:n]).mean()))
    report["mel_mae"] = mel_maes
    report["mel_mae_max"] = max(mel_maes)

    # --- vocoder + denoiser (optional) ------------------------------------
    if args.vocoder:
        from emojivoice_tpu.config import HiFiGANConfig
        from emojivoice_tpu.io.torch_ckpt import load_hifigan_params
        from emojivoice_tpu.vocoder import Denoiser as OurDenoiser
        from emojivoice_tpu.vocoder import HiFiGANGenerator

        sys.path.insert(0, "/root/reference/Matcha-TTS")
        try:
            from matcha.hifigan.denoiser import Denoiser as RefDenoiser
            from matcha.hifigan.env import AttrDict
            from matcha.hifigan.models import Generator as RefGenerator
        finally:
            sys.path.pop(0)

        vcfg = HiFiGANConfig()
        h = AttrDict(dict(
            resblock=vcfg.resblock,
            upsample_rates=list(vcfg.upsample_rates),
            upsample_kernel_sizes=list(vcfg.upsample_kernel_sizes),
            upsample_initial_channel=vcfg.upsample_initial_channel,
            resblock_kernel_sizes=list(vcfg.resblock_kernel_sizes),
            resblock_dilation_sizes=[list(d) for d in vcfg.resblock_dilation_sizes],
        ))
        ref_gen = RefGenerator(h)
        vsd = load_torch_state_dict(args.vocoder)
        ref_gen.load_state_dict({k: torch.from_numpy(np.asarray(v).copy()) for k, v in vsd.items()})
        ref_gen.remove_weight_norm()
        ref_gen.eval()
        ref_den = RefDenoiser(ref_gen, mode="zeros")

        vparams = load_hifigan_params(args.vocoder, vcfg)
        voc = HiFiGANGenerator(cfg=vcfg)
        our_den = OurDenoiser(lambda m: voc.apply(vparams, m), mode="zeros", num_mels=vcfg.num_mels)

        wav_maes = []
        for i in range(b):
            n = min(len_ours[i], len_ref[i])
            with torch.no_grad():
                wav_ref = ref_gen(torch.from_numpy(mel_ref[i:i + 1, :, :n])).squeeze(1)
                wav_ref = ref_den(wav_ref, strength=args.denoiser_strength).numpy().squeeze()
            wav_ours = np.asarray(voc.apply(vparams, jnp.asarray(mel_ours[i:i + 1, :n])))
            wav_ours = np.asarray(our_den(jnp.asarray(wav_ours), args.denoiser_strength)).squeeze()
            m = min(wav_ref.shape[-1], wav_ours.shape[-1])
            wav_maes.append(float(np.abs(wav_ours[..., :m] - wav_ref[..., :m]).mean()))
        report["vocoder"] = str(args.vocoder)
        report["wav_mae"] = wav_maes
        report["wav_mae_max"] = max(wav_maes)

    report["pass"] = bool(
        report["durations_match"]
        and report["mel_mae_max"] < args.tolerance
        and report.get("wav_mae_max", 0.0) < args.tolerance
    )
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="parity_report",
        description="Verify a reference torch checkpoint reproduces bit-comparable "
                    "output through this framework (BASELINE: mel-MAE < 1e-2).",
    )
    p.add_argument("--matcha_ckpt", required=True)
    p.add_argument("--vocoder", default=None, help="HiFi-GAN dump ({'generator': sd})")
    p.add_argument("--texts", default=None, help="file with one 'text' or 'text|spk' per line")
    p.add_argument("--spk", type=int, default=0)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--temperature", type=float, default=0.667)
    p.add_argument("--length_scale", type=float, default=1.0)
    p.add_argument("--denoiser_strength", type=float, default=0.00025)
    p.add_argument("--cleaner", default="english_cleaners2")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tolerance", type=float, default=1e-2)
    p.add_argument("--output", default=None, help="write the JSON report here too")
    p.add_argument("--tpu", action="store_true",
                   help="run our side on the default backend instead of CPU")
    args = p.parse_args(argv)

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    report = run_report(args)
    line = json.dumps(report)
    print(line)
    if args.output:
        Path(args.output).write_text(line + "\n")
    return 0 if report["pass"] else 2


if __name__ == "__main__":
    raise SystemExit(main())
