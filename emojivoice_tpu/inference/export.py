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

from emojivoice_tpu.utils.prng import host_prng_key


def export_synthesis(
    pipeline,
    path: str,
    text_bucket: int = 256,
    mel_bucket: int = 512,
    n_timesteps: int = 10,
    with_vocoder: bool = True,
    denoiser_strength: float = 0.00025,
    platforms: Optional[list] = None,
    batch: int = 1,
    pcm16: bool = False,
) -> Path:
    """Serialize the fused text→wav program with weights baked in.

    Exported signature: f(x (B, text_bucket) i32, x_lengths (B,) i32,
    spks (B,) i32, length_scale f32, temperature f32, rng_keys (B, 2) u32)
    → (wav (B, mel_bucket·ups) f32 | mel, mel_lengths).

    RNG is PER ROW: row i draws ``normal(key_i, (mel_bucket, n_feats))·T``
    in f32 — the same stream a batch-1 call with that key draws (threefry
    streams depend on element count, not leading batch dims), so a request
    served inside a merged batch reproduces its direct call exactly.  This
    is what lets the serving engine run on a bundle without giving up
    per-request seeds (the live pipeline's (B, 2) seed path, pipeline.py).

    ``pcm16=True`` quantizes the wav to int16 on device (same op as the
    live fused path's pcm16 mode) — halves the device→host payload, which
    is the dominant cost on a tunnel/network-attached chip.
    """
    model = pipeline.model
    params = pipeline.params
    # a pipeline without a vocoder exports mel programs regardless of the flag
    with_vocoder = with_vocoder and pipeline.vocoder is not None
    voc = pipeline.vocoder if with_vocoder else None
    voc_params = pipeline.vocoder_params
    denoiser = pipeline.denoiser if with_vocoder else None

    n_spks = pipeline.model_cfg.n_spks

    n_feats = pipeline.model_cfg.n_feats

    def fn(x, x_lengths, spks, length_scale, temperature, rng_keys):
        from emojivoice_tpu.models import MatchaTTS

        # per-row explicit noise, f32 (the noise-dtype invariant); matches
        # the live pipeline's _row_noise so exported == live per seed
        z = jax.vmap(
            lambda k: jax.random.normal(
                jax.random.wrap_key_data(k, impl="threefry2x32"),
                (mel_bucket, n_feats), jnp.float32)
        )(rng_keys) * temperature
        out = model.apply(params, x, x_lengths, mel_bucket, n_timesteps, temperature,
                          spks if n_spks > 1 else None,
                          length_scale, None, z, method=MatchaTTS.synthesise)
        if voc is not None:
            wav = voc.apply(voc_params, out["mel"])
            if denoiser is not None and denoiser_strength > 0:
                wav = denoiser(wav, denoiser_strength)
            if pcm16:
                wav = jnp.clip(wav.astype(jnp.float32), -1.0, 1.0)
                wav = (wav * 32767.0).astype(jnp.int16)
            return wav, out["mel_lengths"]
        return out["mel"], out["mel_lengths"]

    args = (
        jax.ShapeDtypeStruct((batch, text_bucket), jnp.int32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
        jax.ShapeDtypeStruct((batch, 2), jnp.uint32),
    )
    exported = jax_export.export(jax.jit(fn), platforms=platforms)(*args)
    blob = exported.serialize()

    out_path = Path(path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.with_suffix(".stablehlo").write_bytes(blob)
    meta = {
        "batch": batch,
        "text_bucket": text_bucket,
        "mel_bucket": mel_bucket,
        "n_timesteps": n_timesteps,
        "with_vocoder": with_vocoder,
        "denoiser_strength": denoiser_strength,
        "n_spks": pipeline.model_cfg.n_spks,
        "upsample": pipeline.vocoder_cfg.total_upsample if with_vocoder else None,
        "platforms": list(exported.platforms),
        "pcm16": bool(pcm16 and with_vocoder),
        "rng_per_row": True,
    }
    out_path.with_suffix(".json").write_text(json.dumps(meta, indent=2))
    return out_path.with_suffix(".stablehlo")


def export_durations(pipeline, path: str, text_bucket: int, batch: int = 1,
                     platforms: Optional[list] = None) -> Path:
    """Serialize the duration-only program: f(x, x_lengths, spks,
    length_scale) → y_lengths.  The runner uses it to pick the mel bucket
    before dispatching the matching synthesis program — the explicit
    equivalent of the reference's `.item()` graph break (matcha_tts.py:124-126)."""
    model = pipeline.model
    params = pipeline.params

    n_spks = pipeline.model_cfg.n_spks

    def fn(x, x_lengths, spks, length_scale):
        from emojivoice_tpu.models import MatchaTTS

        _mu, _w, y_lengths, _m, _s = model.apply(
            params, x, x_lengths, spks if n_spks > 1 else None, length_scale,
            method=MatchaTTS.encode_text
        )
        return y_lengths

    args = (
        jax.ShapeDtypeStruct((batch, text_bucket), jnp.int32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.float32),
    )
    exported = jax_export.export(jax.jit(fn), platforms=platforms)(*args)
    out_path = Path(path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.with_suffix(".stablehlo").write_bytes(exported.serialize())
    return out_path.with_suffix(".stablehlo")


def export_bundle(
    pipeline,
    out_dir: str,
    text_buckets: Optional[list] = None,
    mel_buckets: Optional[list] = None,
    batches: tuple = (1, 8),
    n_timesteps: int = 10,
    with_vocoder: bool = True,
    denoiser_strength: float = 0.00025,
    platforms: Optional[list] = None,
    pcm16: bool = False,
) -> Path:
    """Export a MANIFEST of programs over (batch × text_bucket × mel_bucket).

    The reference exports ONE onnx graph with dynamic batch/time axes
    (onnx/export.py:140-162); XLA programs are static-shaped, so the bundle
    enumerates the shape grid instead — the same static-bucket discipline the
    live pipeline uses — plus per-(batch, text_bucket) duration programs so
    the runner can pick the right mel bucket.  Returns the manifest path.
    """
    text_buckets = sorted(text_buckets or pipeline.text_buckets)
    mel_buckets = sorted(mel_buckets or pipeline.mel_buckets)
    batches = tuple(sorted(set(int(b) for b in batches)))
    with_vocoder = with_vocoder and pipeline.vocoder is not None
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    programs = []
    for b in batches:
        for t in text_buckets:
            dur_name = f"dur_b{b}_t{t}"
            export_durations(pipeline, str(out / dur_name), t, batch=b, platforms=platforms)
            for m in mel_buckets:
                name = f"synth_b{b}_t{t}_m{m}"
                export_synthesis(
                    pipeline, str(out / name), text_bucket=t, mel_bucket=m,
                    n_timesteps=n_timesteps, with_vocoder=with_vocoder,
                    denoiser_strength=denoiser_strength, platforms=platforms, batch=b,
                    pcm16=pcm16,
                )
                programs.append({"batch": b, "text_bucket": t, "mel_bucket": m,
                                 "synth": name, "durations": dur_name})

    manifest = {
        "format": "emojivoice-export-bundle-v1",
        "batches": list(batches),
        "text_buckets": list(text_buckets),
        "mel_buckets": list(mel_buckets),
        "n_timesteps": n_timesteps,
        "with_vocoder": with_vocoder,
        "denoiser_strength": denoiser_strength,
        "n_spks": pipeline.model_cfg.n_spks,
        "sample_rate": 22050,
        "hop_length": 256,
        "upsample": pipeline.vocoder_cfg.total_upsample if with_vocoder else None,
        "pcm16": bool(pcm16 and with_vocoder),
        "rng_per_row": True,
        "cleaners": list(pipeline.cleaners),
        "programs": programs,
    }
    manifest_path = out / "manifest.json"
    manifest_path.write_text(json.dumps(manifest, indent=2))
    return manifest_path


class ExportedSynthesizer:
    """Run a serialized program (reference analog: onnx/infer.py)."""

    def __init__(self, path: str):
        p = Path(path)
        self.exported = jax_export.deserialize(p.with_suffix(".stablehlo").read_bytes())
        self.meta = json.loads(p.with_suffix(".json").read_text())

    def __call__(self, x, x_lengths, spks, length_scale=1.0, temperature=0.667, seed=0):
        # host-built keys: no eager device round trip.  Per-row programs
        # (rng_per_row) take (B, 2) keys — an int seed gives row i the
        # stream of seed+i, a sequence pins each row's stream explicitly.
        if self.meta.get("rng_per_row"):
            b = self.meta["batch"]
            seeds = [seed + i for i in range(b)] if isinstance(seed, int) else list(seed)
            if len(seeds) != b:
                raise ValueError(f"got {len(seeds)} seeds for batch {b}")
            rng = np.stack([host_prng_key(int(s)) for s in seeds])
        else:  # pre-per-row bundle: one (2,) key for the whole batch
            rng = host_prng_key(seed)
        out, mel_lengths = self.exported.call(
            jnp.asarray(x, jnp.int32),
            jnp.asarray(x_lengths, jnp.int32),
            jnp.asarray(spks, jnp.int32),
            jnp.float32(length_scale),
            jnp.float32(temperature),
            rng,
        )
        out, mel_lengths = jax.device_get((out, mel_lengths))  # one fetch, one RTT
        return np.asarray(out), np.asarray(mel_lengths)


class LoadedBundle:
    """Run an exported bundle end to end (reference analog: onnx/infer.py).

    Loads programs lazily from a manifest directory, pads inputs to the
    bucket grid, picks the (batch, text, mel) program via the duration
    program, and returns trimmed per-utterance results.  Must match the
    live pipeline bit-for-bit on every exported shape
    (tests/test_export_and_obs.py).
    """

    def __init__(self, bundle_dir: str):
        self.dir = Path(bundle_dir)
        self.meta = json.loads((self.dir / "manifest.json").read_text())
        if self.meta.get("format") != "emojivoice-export-bundle-v1":
            raise ValueError(f"{bundle_dir}: not an export bundle")
        self._cache: dict = {}

    def _load(self, name: str):
        if name not in self._cache:
            self._cache[name] = jax_export.deserialize(
                (self.dir / f"{name}.stablehlo").read_bytes())
        return self._cache[name]

    @staticmethod
    def _pick(value: int, buckets, what: str) -> int:
        for b in sorted(buckets):
            if b >= value:
                return b
        raise ValueError(f"{what} {value} exceeds largest exported bucket {max(buckets)}")

    def encode_texts(self, texts, language=None):
        """Clean + encode through the bundle's exported cleaners (or a
        per-call ``language`` override).  Returns (interspersed id lists,
        cleaned texts) — the single copy of the bundle text frontend that
        :meth:`dispatch` rides."""
        from emojivoice_tpu import text as textlib
        from emojivoice_tpu.utils import intersperse

        cleaners = tuple(self.meta["cleaners"])
        if language is not None:
            from emojivoice_tpu.text.cleaners import LANGUAGE_CLEANERS

            cleaners = (LANGUAGE_CLEANERS[language].__name__,)
        seqs, cleaned = [], []
        for t in texts:
            ids, cl = textlib.text_to_sequence(t, cleaners)
            seqs.append(intersperse(ids, 0))
            cleaned.append(cl)
        return seqs, cleaned

    def synthesise(self, texts, spks=None, length_scale: float = 1.0,
                   temperature: float = 0.667, seed=0, language=None,
                   mel_bucket: Optional[int] = None):
        """Returns (results, timings): results = list of dicts with wav/mel,
        mel_length; timings = {"wall_s", "rtf"} over the whole padded batch.

        More texts than the largest exported batch bucket are served in
        chunks of that bucket (the reference's onnx runner handles any count
        via dynamic axes; the static-bucket analog is chunking).

        ``seed`` may be an int (text k draws the stream of seed+k, chunking
        included) or a per-text sequence pinning each row's stream — a row
        reproduces a direct batch-1 call with the same seed exactly
        (per-row keys in the exported program; pre-per-row bundles take
        only an int and share one batch stream).

        The synth programs compute durations in-graph; the separate duration
        program exists only to CHOOSE a mel bucket.  When the bundle has one
        mel bucket, or the caller pins one via ``mel_bucket``, that call (and
        its transfer round trip) is skipped — one program, one dispatch."""
        import datetime as _dt

        max_batch = max(self.meta["batches"])
        if len(texts) > max_batch:
            all_results, walls, audio = [], 0.0, 0.0
            for i in range(0, len(texts), max_batch):
                chunk_spks = spks[i:i + max_batch] if spks is not None else None
                chunk_seed = seed + i if isinstance(seed, int) else list(seed)[i:i + max_batch]
                res, t = self.synthesise(texts[i:i + max_batch], spks=chunk_spks,
                                         length_scale=length_scale, temperature=temperature,
                                         seed=chunk_seed, language=language,
                                         mel_bucket=mel_bucket)
                all_results.extend(res)
                walls += t["wall_s"]
                audio += t["wall_s"] / t["rtf"] if t["rtf"] else 0.0
            timings = {"wall_s": walls, "rtf": walls / audio if audio else float("inf"),
                       "batch": max_batch, "chunks": -(-len(texts) // max_batch)}
            return all_results, timings

        return self.fetch(self.dispatch(texts, spks=spks, length_scale=length_scale,
                                        temperature=temperature, seed=seed,
                                        language=language, mel_bucket=mel_bucket))

    def dispatch(self, texts, spks=None, length_scale: float = 1.0,
                 temperature: float = 0.667, seed=0, language=None,
                 mel_bucket: Optional[int] = None) -> dict:
        """Enqueue ONE padded-batch program on the device WITHOUT fetching
        its outputs (JAX dispatch is asynchronous).  Returns an in-flight
        record for :meth:`fetch` — a caller can dispatch the next batch
        while this one computes (the serving engine's depth-1 pipeline).
        ``len(texts)`` must fit the largest exported batch bucket; the
        chunking loop lives in :meth:`synthesise`."""
        import datetime as _dt

        t0 = _dt.datetime.now()
        seqs, cleaned = self.encode_texts(texts, language=language)
        n = len(seqs)
        batch = self._pick(n, self.meta["batches"], "batch")
        t_bucket = self._pick(max(len(s) for s in seqs), self.meta["text_buckets"], "text length")

        x = np.zeros((batch, t_bucket), np.int32)
        xl = np.zeros((batch,), np.int32)
        for i in range(batch):
            s = seqs[min(i, n - 1)]  # pad rows repeat the last text
            x[i, : len(s)] = s
            xl[i] = len(s)
        spk_arr = np.zeros((batch,), np.int32)
        if spks is not None:
            for i in range(batch):
                spk_arr[i] = int(spks[min(i, n - 1)])

        if mel_bucket is not None:
            if mel_bucket not in self.meta["mel_buckets"]:
                raise ValueError(f"mel_bucket {mel_bucket} not in exported grid "
                                 f"{self.meta['mel_buckets']}")
            m_bucket = int(mel_bucket)
        elif len(self.meta["mel_buckets"]) == 1:
            m_bucket = int(self.meta["mel_buckets"][0])
        else:
            dur = self._load(f"dur_b{batch}_t{t_bucket}")
            y_lengths = np.asarray(dur.call(x, xl, spk_arr, np.float32(length_scale)))
            from emojivoice_tpu.utils.masks import fix_len_compatibility

            m_bucket = self._pick(int(fix_len_compatibility(int(y_lengths.max()))),
                                  self.meta["mel_buckets"], "mel length")

        prog = self._load(f"synth_b{batch}_t{t_bucket}_m{m_bucket}")
        # host-built keys: no eager device round trip
        if self.meta.get("rng_per_row"):
            row_seeds = ([seed + i for i in range(n)] if isinstance(seed, int)
                         else [int(s) for s in seed])
            if len(row_seeds) != n:
                raise ValueError(f"got {len(row_seeds)} seeds for {n} texts")
            row_seeds += [row_seeds[-1]] * (batch - n)  # pad rows trimmed anyway
            rng = np.stack([host_prng_key(s) for s in row_seeds])
        elif not isinstance(seed, int):
            raise ValueError("per-row seeds need a bundle exported with rng_per_row")
        else:
            rng = host_prng_key(seed)
        out, mel_lengths = prog.call(x, xl, spk_arr, np.float32(length_scale),
                                     np.float32(temperature), rng)
        return {"out": out, "mel_lengths": mel_lengths, "n": n, "batch": batch,
                "t_bucket": t_bucket, "m_bucket": m_bucket, "t0": t0,
                "cleaned": cleaned,
                # escalation replay args (a pinned bucket may saturate)
                "args": dict(texts=texts, spks=spks, length_scale=length_scale,
                             temperature=temperature, seed=seed, language=language),
                "pinned": mel_bucket is not None}

    def fetch(self, p: dict):
        """Block on a dispatched batch's device→host transfer and build the
        trimmed results.  Counterpart of :meth:`dispatch`."""
        import datetime as _dt

        # ONE device_get for the pair: separate np.asarray fetches would pay
        # a transfer round trip each (measured ~28 ms apiece on the tunnel)
        out, mel_lengths = jax.device_get((p["out"], p["mel_lengths"]))
        out = np.asarray(out)
        mel_lengths = np.asarray(mel_lengths).astype(int)
        n, m_bucket = p["n"], p["m_bucket"]
        if (p["pinned"] and mel_lengths.max() >= m_bucket
                and m_bucket < max(self.meta["mel_buckets"])):
            # the pinned bucket saturated (in-graph durations clamp at the
            # bucket, so audio would be silently truncated) and the bundle
            # has headroom: redo via the duration program's accurate pick.
            # The replay keeps the ORIGINAL t0 so wall_s/rtf include the
            # wasted pinned attempt instead of under-reporting by ~2x.
            replay = self.dispatch(**p["args"])
            replay["t0"] = p["t0"]
            return self.fetch(replay)
        wall = (_dt.datetime.now() - p["t0"]).total_seconds()

        results = []
        ups = self.meta["upsample"] or self.meta["hop_length"]
        for i in range(n):  # pad rows trimmed
            ml = int(mel_lengths[i])
            if self.meta["with_vocoder"]:
                # pcm16 bundles return int16 samples (device-quantized);
                # f32 bundles return float samples — dtype says which
                results.append({"wav": out[i, : ml * ups], "mel_length": ml,
                                "cleaned_text": p["cleaned"][i]})
            else:
                results.append({"mel": out[i, :ml], "mel_length": ml,
                                "cleaned_text": p["cleaned"][i]})
        audio_s = float(mel_lengths[:n].sum()) * self.meta["hop_length"] / self.meta["sample_rate"]
        timings = {"wall_s": wall, "rtf": wall / audio_s if audio_s else float("inf"),
                   "batch": p["batch"], "n": n,
                   "text_bucket": p["t_bucket"], "mel_bucket": m_bucket}
        return results, timings


class BundleSynthesisPipeline:
    """The serving engine's pipeline surface over an exported bundle.

    Production deployments can point ``BatchingEngine`` (and the web app) at
    a versioned AOT artifact instead of live model code: no checkpoint
    loading, no tracing, no Python model graph — just the manifest of
    StableHLO programs.  Implements the subset of ``SynthesisPipeline`` the
    engine and webapp use: ``synthesise_async``/``finalize`` (depth-1
    pipelining), blocking ``synthesise``, and ``warmup``.  Per-request seeds
    work exactly as on the live path (per-row keys in the exported programs).

    Baked at export and therefore FIXED per bundle: ODE step count and
    denoiser strength (requests asking for other values are rejected —
    export a bundle per operating point), pcm16 wire format (requests'
    ``pcm16`` flag is advisory; results always expose float32 wav), and
    mel output (vocoder bundles carry none: ``keep_mel`` requests get an
    empty mel, which the webapp renders as audio-only).
    """

    def __init__(self, bundle, language: Optional[str] = None):
        self.bundle = bundle if isinstance(bundle, LoadedBundle) else LoadedBundle(bundle)
        meta = self.bundle.meta
        if not meta.get("rng_per_row"):
            raise ValueError("serving needs per-request seeds: re-export this "
                             "bundle (programs take per-row RNG keys now)")
        if not meta.get("with_vocoder"):
            # a --no_vocoder bundle carries mels only; serving it would hand
            # every client zero-length audio with no error
            raise ValueError("bundle was exported with --no_vocoder (mel-only); "
                             "serving needs waveform programs — re-export "
                             "without --no_vocoder")
        if language is not None:
            from emojivoice_tpu.text.cleaners import LANGUAGE_CLEANERS

            if language not in LANGUAGE_CLEANERS:
                raise KeyError(f"Unknown language {language!r}; available: "
                               f"{sorted(LANGUAGE_CLEANERS)}")
        # default cleaning language for requests that don't name one; None
        # falls back to the bundle's exported cleaners
        self.language = language
        self.batch_buckets = tuple(meta["batches"])
        self.n_timesteps = int(meta["n_timesteps"])
        self.denoiser_strength = float(meta["denoiser_strength"])

    def _check(self, n_timesteps: int, denoiser_strength: float) -> None:
        if int(n_timesteps) != self.n_timesteps:
            raise ValueError(f"bundle is exported at n_timesteps={self.n_timesteps}, "
                             f"got {n_timesteps} (export a bundle per operating point)")
        if abs(float(denoiser_strength) - self.denoiser_strength) > 1e-9:
            raise ValueError(f"bundle is exported at denoiser_strength="
                             f"{self.denoiser_strength}, got {denoiser_strength}")

    def synthesise_async(self, texts, spks=None, n_timesteps: Optional[int] = None,
                         temperature: float = 0.667, length_scale: float = 1.0,
                         denoiser_strength=None, language=None,
                         seed=None, keep_mel: bool = True, vocode: bool = True,
                         pcm16: bool = False):
        self._check(self.n_timesteps if n_timesteps is None else n_timesteps,
                    self.denoiser_strength
                    if denoiser_strength is None else denoiser_strength)
        if seed is None:
            seed = int(np.random.randint(0, 2**31))
        return self.bundle.dispatch(texts, spks=spks, length_scale=length_scale,
                                    temperature=temperature, seed=seed,
                                    language=language if language is not None
                                    else self.language)

    def finalize(self, pending) -> list:
        from emojivoice_tpu.inference.pipeline import (HOP_LENGTH, SAMPLE_RATE,
                                                       SynthesisResult)

        results, timings = self.bundle.fetch(pending)
        # amortize over REAL rows like the live finalize (pad rows are free
        # riders of the same dispatch, not separate work)
        b = max(timings.get("n", timings["batch"]), 1)
        out = []
        for r in results:
            wav = r.get("wav")
            if wav is None:
                wav = np.zeros(0, np.float32)
            elif wav.dtype == np.int16:
                wav = wav.astype(np.float32) / 32767.0
            else:
                wav = np.asarray(wav, np.float32)
            ml = r["mel_length"]
            # reference RTF formulas (cli.py:301-302), amortized per row like
            # the live finalize; under engine pipelining the wall window
            # overlaps neighbor batches — throughput is the engine's utt/s
            rtf = timings["wall_s"] * SAMPLE_RATE / (max(ml, 1) * HOP_LENGTH) / b
            rtf_w = (timings["wall_s"] * SAMPLE_RATE / max(len(wav), 1) / b
                     if len(wav) else float("nan"))
            mel = r.get("mel")
            out.append(SynthesisResult(
                wav=wav,
                mel=np.asarray(mel, np.float32) if mel is not None else np.zeros((0, 0), np.float32),
                mel_length=ml, rtf=rtf, rtf_w=rtf_w,
                cleaned_text=r.get("cleaned_text", ""),
            ))
        return out

    def synthesise(self, texts, **kw) -> list:
        return self.finalize(self.synthesise_async(texts, **kw))

    def warmup(self, n_timesteps: Optional[int] = None, batch: int = 1,
               **_ignored) -> None:
        """Load + run every program at this batch bucket once (deserialize
        and XLA-compile off the request path).  ``n_timesteps=None`` means
        the bundle's exported step count."""
        self._check(self.n_timesteps if n_timesteps is None else n_timesteps,
                    self.denoiser_strength)
        meta = self.bundle.meta
        if batch not in meta["batches"]:
            raise ValueError(f"batch {batch} not in exported grid {meta['batches']}")
        for t in meta["text_buckets"]:
            x = np.zeros((batch, t), np.int32)
            x[:, 0] = 50
            xl = np.ones((batch,), np.int32)
            spk = np.zeros((batch,), np.int32)
            rng = np.stack([host_prng_key(i) for i in range(batch)])
            if len(meta["mel_buckets"]) > 1:
                np.asarray(self.bundle._load(f"dur_b{batch}_t{t}").call(
                    x, xl, spk, np.float32(1.0)))
            for m in meta["mel_buckets"]:
                prog = self.bundle._load(f"synth_b{batch}_t{t}_m{m}")
                jax.device_get(prog.call(x, xl, spk, np.float32(1.0),
                                         np.float32(0.667), rng))


# ---------------------------------------------------------------------------
# CLIs: emojivoice-export / emojivoice-run-exported
# ---------------------------------------------------------------------------

def main_export(argv=None) -> int:
    """Export a checkpoint (or random init) to a self-contained bundle."""
    import argparse

    p = argparse.ArgumentParser(prog="emojivoice-export")
    p.add_argument("--checkpoint_path", default=None, help="torch ckpt (reference format)")
    p.add_argument("--vocoder", default=None)
    p.add_argument("--orbax_dir", default=None, help="alternatively: orbax ckpts dir")
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--text_buckets", type=int, nargs="+", default=None)
    p.add_argument("--mel_buckets", type=int, nargs="+", default=None)
    p.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    p.add_argument("--no_vocoder", action="store_true")
    p.add_argument("--pcm16", action="store_true",
                   help="quantize wav to int16 on device (halves transfer)")
    p.add_argument("--denoiser_strength", type=float, default=0.00025)
    p.add_argument("--platforms", nargs="+", default=None,
                   help="e.g. tpu cpu — export multi-platform StableHLO")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from emojivoice_tpu.inference.pipeline import SynthesisPipeline

    if args.random_init:
        pipe = SynthesisPipeline.from_random()
    elif args.orbax_dir:
        pipe = SynthesisPipeline.from_orbax(args.orbax_dir, vocoder_ckpt=args.vocoder)
    elif args.checkpoint_path:
        pipe = SynthesisPipeline.from_torch_checkpoints(args.checkpoint_path, args.vocoder)
    else:
        p.error("one of --checkpoint_path / --orbax_dir / --random_init is required")
    manifest = export_bundle(
        pipe, args.output_dir, text_buckets=args.text_buckets, mel_buckets=args.mel_buckets,
        batches=tuple(args.batches), n_timesteps=args.steps,
        with_vocoder=not args.no_vocoder, denoiser_strength=args.denoiser_strength,
        platforms=args.platforms, pcm16=args.pcm16,
    )
    meta = json.loads(manifest.read_text())
    print(f"wrote bundle: {manifest.parent} ({len(meta['programs'])} programs, "
          f"batches={meta['batches']} text={meta['text_buckets']} mel={meta['mel_buckets']})")
    return 0


def main_run(argv=None) -> int:
    """Run an exported bundle: pad, pick programs, write wavs, report RTF
    (reference analog: onnx/infer.py:24-83,136-146)."""
    import argparse

    p = argparse.ArgumentParser(prog="emojivoice-run-exported")
    p.add_argument("--bundle", required=True)
    p.add_argument("--text", default=None)
    p.add_argument("--file", default=None, help="lines of 'text' or 'text|spk'")
    p.add_argument("--spk", type=int, default=0)
    p.add_argument("--language", default=None)
    p.add_argument("--temperature", type=float, default=0.667)
    p.add_argument("--speaking_rate", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mel_bucket", type=int, default=None,
                   help="pin an exported mel bucket to skip the duration "
                        "program (escalates automatically if it saturates)")
    p.add_argument("--output_folder", default="exported_out")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.text and not args.file:
        p.error("--text or --file required")
    if args.file:
        lines = [l.strip() for l in Path(args.file).read_text().splitlines() if l.strip()]
        texts, spks = [], []
        for line in lines:
            if "|" in line:
                t, s = line.rsplit("|", 1)
                texts.append(t)
                spks.append(int(s))
            else:
                texts.append(line)
                spks.append(args.spk)
    else:
        texts, spks = [args.text], [args.spk]

    bundle = LoadedBundle(args.bundle)
    # the reference passes speaking_rate straight through as length_scale
    # (cli.py:297, onnx/infer.py:145), as does our live CLI
    results, timings = bundle.synthesise(
        texts, spks=spks, length_scale=args.speaking_rate, temperature=args.temperature,
        seed=args.seed, language=args.language, mel_bucket=args.mel_bucket,
    )
    out_dir = Path(args.output_folder)
    out_dir.mkdir(parents=True, exist_ok=True)
    sr = bundle.meta["sample_rate"]
    for i, res in enumerate(results):
        if "wav" in res:
            if res["wav"].dtype == np.int16:  # pcm16 bundle: write PCM directly
                from scipy.io import wavfile

                wavfile.write(out_dir / f"utterance_{i+1:03d}.wav", sr, res["wav"])
            else:
                from emojivoice_tpu.inference.cli import save_wav

                save_wav(str(out_dir / f"utterance_{i+1:03d}.wav"), res["wav"], sr)
        else:
            np.save(out_dir / f"utterance_{i+1:03d}_mel.npy", res["mel"])
    print(json.dumps({"n": len(results), **timings, "output_folder": str(out_dir)}))
    return 0
