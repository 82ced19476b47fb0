"""AOT export of compiled synthesis programs.

The TPU-native analog of the reference's ONNX story
(reference: Matcha-TTS/matcha/onnx/export.py — synthesise with n_timesteps
baked at export, optional vocoder fused into the graph).  Here the same
property holds natively: the fused synthesis program IS one static graph,
and ``jax.export`` serializes it as portable StableHLO that reloads and
runs without the Python model code.

Two artifacts per export:
  <name>.stablehlo  — serialized jax.export program (weights baked in)
  <name>.json       — metadata (shapes, steps, buckets, config)
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def export_synthesis(
    pipeline,
    path: str,
    text_bucket: int = 256,
    mel_bucket: int = 512,
    n_timesteps: int = 10,
    with_vocoder: bool = True,
    denoiser_strength: float = 0.00025,
    platforms: Optional[list] = None,
) -> Path:
    """Serialize the fused text→wav program with weights baked in.

    Exported signature: f(x (1, text_bucket) i32, x_lengths (1,) i32,
    spks (1,) i32, length_scale f32, temperature f32, rng_seed (2,) u32)
    → (wav (1, mel_bucket·ups) f32 | mel, mel_lengths).
    """
    model = pipeline.model
    params = pipeline.params
    voc = pipeline.vocoder if with_vocoder else None
    voc_params = pipeline.vocoder_params
    denoiser = pipeline.denoiser if with_vocoder else None

    def fn(x, x_lengths, spks, length_scale, temperature, rng_key):
        from emojivoice_tpu.models import MatchaTTS

        key = jax.random.wrap_key_data(rng_key, impl="threefry2x32")
        out = model.apply(params, x, x_lengths, mel_bucket, n_timesteps, temperature, spks,
                          length_scale, key, method=MatchaTTS.synthesise)
        if voc is not None:
            wav = voc.apply(voc_params, out["mel"])
            if denoiser is not None and denoiser_strength > 0:
                wav = denoiser(wav, denoiser_strength)
            return wav, out["mel_lengths"]
        return out["mel"], out["mel_lengths"]

    args = (
        jax.ShapeDtypeStruct((1, text_bucket), jnp.int32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    exported = jax_export.export(jax.jit(fn), platforms=platforms)(*args)
    blob = exported.serialize()

    out_path = Path(path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.with_suffix(".stablehlo").write_bytes(blob)
    meta = {
        "text_bucket": text_bucket,
        "mel_bucket": mel_bucket,
        "n_timesteps": n_timesteps,
        "with_vocoder": with_vocoder,
        "denoiser_strength": denoiser_strength,
        "n_spks": pipeline.model_cfg.n_spks,
        "upsample": pipeline.vocoder_cfg.total_upsample if with_vocoder else None,
        "platforms": list(exported.platforms),
    }
    out_path.with_suffix(".json").write_text(json.dumps(meta, indent=2))
    return out_path.with_suffix(".stablehlo")


class ExportedSynthesizer:
    """Run a serialized program (reference analog: onnx/infer.py)."""

    def __init__(self, path: str):
        p = Path(path)
        self.exported = jax_export.deserialize(p.with_suffix(".stablehlo").read_bytes())
        self.meta = json.loads(p.with_suffix(".json").read_text())

    def __call__(self, x, x_lengths, spks, length_scale=1.0, temperature=0.667, seed=0):
        rng = jax.random.key_data(jax.random.PRNGKey(seed)).astype(jnp.uint32)
        out, mel_lengths = self.exported.call(
            jnp.asarray(x, jnp.int32),
            jnp.asarray(x_lengths, jnp.int32),
            jnp.asarray(spks, jnp.int32),
            jnp.float32(length_scale),
            jnp.float32(temperature),
            rng,
        )
        return np.asarray(out), np.asarray(mel_lengths)
