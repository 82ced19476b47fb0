"""Vocoder compute decomposition on the real chip: XLA vs Pallas-MRF, B=1 vs 8.

Questions this answers (amortized in-jit device time, tunnel-RTT-free):
  1. What does HiFi-GAN cost inside the fused program (per item, per batch)?
  2. Does the fused Pallas MRF path beat XLA's conv fusion — at batch 1 and
     at serving batch sizes (where lane packing can reclaim the 128-wide
     MXU at the C=32/64 stages)?
  3. How much of the fused synthesise program is the CFM Euler loop
     (steps-10 minus steps-2, divided by 8)?

Prints one JSON line with all timings in ms.

Timing method: N executions inside one jitted fori_loop (single dispatch,
so the axon tunnel RTT amortizes away), (rep8 - rep1)/7 per execution.
Loop-carried input perturbation defeats LICM/CSE.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_util import amortized_ms as _amortized_ms


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emojivoice_tpu.config import HiFiGANConfig, enable_compilation_cache
    from emojivoice_tpu.ops.pallas_mrf import hifigan_apply_pallas
    from emojivoice_tpu.vocoder import HiFiGANGenerator

    enable_compilation_cache()
    backend = jax.default_backend()
    print(f"[bench_vocoder] backend={backend}", file=sys.stderr)

    cfg = HiFiGANConfig()
    voc = HiFiGANGenerator(cfg=cfg)
    params = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.num_mels)))
    n_frames = 512  # bench.py utterance bucket (~5.9 s of audio)
    rng = np.random.default_rng(0)

    out = {"backend": backend, "mel_frames": n_frames}
    for b in (1, 8):
        mel = jnp.asarray(rng.normal(size=(b, n_frames, cfg.num_mels)).astype(np.float32))

        def xla_call(i, acc, mel, params):
            return voc.apply(params, mel * (1.0 + 1e-9 * i.astype(jnp.float32)))

        out[f"xla_b{b}_ms"] = round(_amortized_ms(xla_call, (mel, params)), 3)

        def pallas_call_(i, acc, mel, params):
            return hifigan_apply_pallas(
                cfg, params, mel * (1.0 + 1e-9 * i.astype(jnp.float32)))

        def pallas_bf16_call(i, acc, mel, params):
            return hifigan_apply_pallas(
                cfg, params, mel * (1.0 + 1e-9 * i.astype(jnp.float32)),
                compute_dtype=jnp.bfloat16)

        if backend != "cpu":
            try:
                out[f"pallas_b{b}_ms"] = round(_amortized_ms(pallas_call_, (mel, params)), 3)
                out[f"pallas_bf16_b{b}_ms"] = round(
                    _amortized_ms(pallas_bf16_call, (mel, params)), 3)
                if b == 1:
                    ref = jax.jit(lambda m, p: voc.apply(p, m))(mel, params)
                    got = jax.jit(lambda m, p: hifigan_apply_pallas(
                        cfg, p, m, compute_dtype=jnp.bfloat16))(mel, params)
                    out["bf16_wav_max_abs_err"] = round(
                        float(jnp.max(jnp.abs(got - ref))), 5)
            except Exception as e:  # keep the XLA numbers even if the kernel trips
                out[f"pallas_b{b}_err"] = f"{type(e).__name__}: {e}"[:200]

    # --- CFM share of the fused program: steps-10 vs steps-2 ----------------
    from emojivoice_tpu.inference.pipeline import SynthesisPipeline
    from emojivoice_tpu.utils.buckets import pick_bucket

    text = ("The quick brown fox jumped over the lazy dog, and everyone at "
            "the party cheered loudly for the brave little robot.")
    pipe = SynthesisPipeline.from_random(cleaners=("basic_cleaners",))
    first = pipe.synthesise([text], spks=[79], n_timesteps=10, seed=0, pcm16=True)[0]
    m_bucket = pick_bucket(first.mel_length, pipe.mel_buckets)
    x, x_lengths, _, t_bucket = pipe.encode_texts([text])
    spk = jnp.asarray(np.asarray([79], np.int32))
    base = (pipe.params, pipe.vocoder_params, x, x_lengths, spk,
            jnp.float32(1.0), jnp.float32(0.667), jax.random.PRNGKey(0),
            jnp.float32(0.00025))
    per_steps = {}
    for steps in (2, 10):
        fn = pipe._get_fused(t_bucket, m_bucket, 1, steps, True, False, True)

        def fused_call(i, acc, *args):
            args = list(args)
            args[7] = jax.random.fold_in(args[7], i)
            return fn(*args)["wav"]

        per_steps[steps] = _amortized_ms(fused_call, tuple(base))
    out["fused_steps2_ms"] = round(per_steps[2], 3)
    out["fused_steps10_ms"] = round(per_steps[10], 3)
    out["cfm_per_step_ms"] = round((per_steps[10] - per_steps[2]) / 8.0, 3)
    out["non_cfm_ms"] = round(per_steps[2] - 2 * out["cfm_per_step_ms"], 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
