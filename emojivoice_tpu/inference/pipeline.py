"""End-to-end synthesis pipeline: text → waveform, compiled.

This is the TPU-native replacement for the reference's eager chain
``process_text → MatchaTTS.synthesise → HiFiGAN → Denoiser``
(reference: Matcha-TTS/matcha/cli.py:38-64,121-126,389-425 and
synthesis.ipynb).  Design:

* **Two-stage bucketed programs** (default): stage A (text bucket) runs the
  encoder + duration head; the host reads the predicted mel length — the one
  unavoidable host sync, which the reference also has as ``.item()``
  (matcha_tts.py:124-126) — picks a mel bucket, and stage B
  (text × mel bucket) runs alignment expansion + unrolled Euler CFM +
  HiFi-GAN + denoiser as ONE fused XLA program ending in the waveform.
* **Fused single program** (``fused=True``): everything including duration →
  one program at a fixed mel capacity; zero host syncs in the loop — the
  mode the driver benchmarks.
* Compiled programs are cached per bucket; recompiles are bounded by
  ``len(text_buckets) × len(mel_buckets)``.

RTF accounting matches the reference formulas exactly
(mel: matcha_tts.py:142-143; end-to-end: cli.py:301-302).
"""

from __future__ import annotations

import dataclasses
import datetime as dt
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from emojivoice_tpu import config as cfglib
from emojivoice_tpu import text as textlib
from emojivoice_tpu.models import MatchaTTS
from emojivoice_tpu.utils.buckets import default_mel_buckets, default_text_buckets, pick_bucket
from emojivoice_tpu.utils.masks import intersperse
from emojivoice_tpu.utils.masks import fix_len_compatibility
from emojivoice_tpu.utils.prng import host_prng_key
from emojivoice_tpu.vocoder import Denoiser, HiFiGANGenerator

HOP_LENGTH = 256
SAMPLE_RATE = 22050


@dataclasses.dataclass
class SynthesisResult:
    wav: np.ndarray  # (samples,) float32 in [-1, 1]
    mel: np.ndarray  # (T_mel, n_feats), denormalized
    mel_length: int
    rtf: float  # acoustic-only, reference formula
    rtf_w: float  # with vocoder
    cleaned_text: str = ""
    sample_rate: int = SAMPLE_RATE


@dataclasses.dataclass
class PendingSynthesis:
    """In-flight synthesis: the jitted program is dispatched (async) but its
    outputs have not been fetched.  ``SynthesisPipeline.finalize`` blocks on
    the device→host transfer and builds the results — callers can dispatch
    the NEXT batch first so the device computes while this one drains over
    the link (the serving engine's depth-1 pipeline)."""

    out: dict  # device arrays (or numpy on CPU backends)
    cleaned: list
    b: int
    t0: dt.datetime


class SynthesisPipeline:
    def __init__(
        self,
        model_cfg: cfglib.ModelConfig,
        params: dict,
        vocoder_cfg: Optional[cfglib.HiFiGANConfig] = None,
        vocoder_params: Optional[dict] = None,
        denoiser_mode: str = "zeros",
        text_buckets: Sequence[int] = None,
        mel_buckets: Sequence[int] = None,
        cleaners: Sequence[str] = ("english_cleaners2",),
        compute_dtype=jnp.float32,
        mesh=None,
        vocoder_backend: str = "auto",
        vocoder_dtype=jnp.float32,
    ):
        """``mesh`` scales inference over devices: params are placed by the
        tensor-parallel rules (replicated when the mesh has no/size-1 model
        axis), and each synthesise batch is sharded over the mesh's ``data``
        axis when the batch size divides it — data-parallel serving with XLA
        collectives over ICI, the inference twin of the training mesh
        (reference has nothing comparable; its serving is one GPU,
        cli.py:438-447).  Batches not divisible by the data axis run
        replicated.

        ``vocoder_backend`` selects the HiFi-GAN compute path: ``"auto"``
        (default) fuses the Pallas MRF stages on real TPUs when params are
        replicated f32, else XLA; ``"xla"`` forces XLA conv fusion;
        ``"pallas"`` forces the fused kernel (raises unless f32/unsharded).
        Unknown values raise.

        ``vocoder_dtype=bfloat16`` runs ONLY the HiFi-GAN convs in bf16
        (acoustic model, noise, denoiser, and params at rest stay f32) —
        the serving-throughput knob: at batch the vocoder is MXU-bound, and
        bf16 convs measured 37.4 vs 51.0 ms (XLA f32) / 43.3 ms (Pallas
        f32) at B=8×512 frames, 141 vs 204 ms at B=32 on v5e, with max
        waveform deviation ~1e-3 (-59 dB).  At batch 1 the vocoder is
        overhead-bound and Pallas f32 stays ahead — keep the default for
        single-stream latency."""
        self.model_cfg = model_cfg
        self.model = MatchaTTS(cfg=model_cfg)
        self.mesh = mesh
        if mesh is not None:
            from emojivoice_tpu.parallel.tp import shard_params as _tp_shard

            params = _tp_shard(params, mesh)
            if vocoder_params is not None:
                vocoder_params = _tp_shard(vocoder_params, mesh)
        self.params = params
        self.vocoder_cfg = vocoder_cfg
        self.vocoder = HiFiGANGenerator(cfg=vocoder_cfg) if vocoder_cfg is not None else None
        self.vocoder_params = vocoder_params
        self.text_buckets = tuple(text_buckets or default_text_buckets())
        self.mel_buckets = tuple(mel_buckets or default_mel_buckets())
        self.cleaners = tuple(cleaners)
        self.compute_dtype = compute_dtype
        self.denoiser = None
        if self.vocoder is not None:
            self.denoiser = Denoiser(
                lambda m: self.vocoder.apply(self.vocoder_params, m),
                mode=denoiser_mode,
                num_mels=model_cfg.n_feats,
            )
        # "auto" engages the fused Pallas MRF stages on real TPUs where they
        # measured faster than XLA's conv fusion (ops/pallas_mrf.py: -33%
        # vocoder time at batch 1 via time-split lane packing, -15% at
        # batch 8); XLA everywhere Pallas can't run (CPU tests, virtual
        # meshes) or where params may be sharded/cast (mesh/TP, bf16).
        if vocoder_backend not in ("auto", "xla", "pallas"):
            raise ValueError(
                f"vocoder_backend={vocoder_backend!r}: expected 'auto', 'xla', or 'pallas'"
            )
        self.vocoder_dtype = vocoder_dtype
        if vocoder_backend == "pallas":
            # the kernel's VMEM scratch is f32 and expects replicated params —
            # the same conditions "auto" checks, but an explicit ask must fail
            # loudly instead of crashing at compile time deep in pallas_call
            if compute_dtype != jnp.float32 or vocoder_dtype != jnp.float32:
                raise ValueError(
                    "vocoder_backend='pallas' requires compute_dtype=float32 "
                    "and vocoder_dtype=float32 (the fused MRF kernel stages "
                    "f32 VMEM scratch; bf16 vocoding goes through XLA)"
                )
            if mesh is not None:
                raise ValueError(
                    "vocoder_backend='pallas' is incompatible with mesh/TP-sharded "
                    "params; use vocoder_backend='auto' or 'xla' with a mesh"
                )
        self._pallas_voc = vocoder_backend == "pallas" or (
            vocoder_backend == "auto"
            and mesh is None
            and compute_dtype == jnp.float32
            and vocoder_dtype == jnp.float32
            and jax.default_backend() == "tpu"
        )
        self._stage_a = {}
        self._stage_b = {}
        self._fused = {}

    def _vocode(self, voc_params, mel):
        if self.vocoder_dtype != jnp.float32:
            # vocoder-only mixed precision: the weight cast happens in-graph
            # (XLA fuses the converts; ~55 MB of weights read once per call),
            # the waveform comes back f32 for the denoiser's phase math
            from emojivoice_tpu.utils.trees import cast_floats

            wav = self.vocoder.apply(cast_floats(voc_params, self.vocoder_dtype),
                                     mel.astype(self.vocoder_dtype))
            return wav.astype(jnp.float32)
        if self._pallas_voc:
            from emojivoice_tpu.ops.pallas_mrf import hifigan_apply_pallas

            return hifigan_apply_pallas(self.vocoder_cfg, voc_params, mel)
        return self.vocoder.apply(voc_params, mel)

    # ------------------------------------------------------------------ #
    # constructors
    # ------------------------------------------------------------------ #

    @classmethod
    def from_torch_checkpoints(cls, matcha_ckpt: str, vocoder_ckpt: Optional[str] = None, **kw):
        """Load the released PyTorch checkpoints (Paige/Olivia/Zach +
        hifigan_univ_v1) directly (reference analog: cli.py:110-118,84-107)."""
        from emojivoice_tpu.io.torch_ckpt import load_hifigan_params, load_matcha_params

        params, model_cfg = load_matcha_params(matcha_ckpt)
        voc_cfg = voc_params = None
        if vocoder_ckpt is not None:
            voc_cfg = cfglib.HiFiGANConfig()
            voc_params = load_hifigan_params(vocoder_ckpt, voc_cfg)
        return cls(model_cfg, params, voc_cfg, voc_params, **kw)

    @classmethod
    def from_orbax(cls, ckpt_dir: str, vocoder_ckpt: Optional[str] = None, step: Optional[int] = None, **kw):
        """Serve a model trained by emojivoice-train: restores params + the
        RootConfig sidecar from the orbax directory (ckpts/ under --out_dir);
        the vocoder still comes from a torch HiFi-GAN dump."""
        from emojivoice_tpu.io.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir)
        root_cfg = mgr.load_config()
        restored = mgr.restore(step)
        params = restored["params"] if "params" in restored else restored
        mgr.close()
        voc_cfg = voc_params = None
        if vocoder_ckpt is not None:
            from emojivoice_tpu.io.torch_ckpt import load_hifigan_params

            voc_cfg = root_cfg.vocoder
            voc_params = load_hifigan_params(vocoder_ckpt, voc_cfg)
        return cls(root_cfg.model, params, voc_cfg, voc_params, **kw)

    @classmethod
    def from_random(cls, root_cfg: Optional[cfglib.RootConfig] = None, seed: int = 0, with_vocoder=True, **kw):
        """Random-init pipeline (tests/benchmarks without released weights)."""
        root_cfg = root_cfg or cfglib.get_preset("emoji_multi")
        model = MatchaTTS(cfg=root_cfg.model)
        rng = jax.random.PRNGKey(seed)
        x = jnp.ones((1, 8), jnp.int32)
        y = jnp.zeros((1, 16, root_cfg.model.n_feats))
        spks = jnp.array([0]) if root_cfg.model.n_spks > 1 else None
        params = model.init({"params": rng, "dropout": rng}, x, jnp.array([8]), y, jnp.array([16]),
                            spks, rng=rng)
        voc_cfg = voc_params = None
        if with_vocoder:
            voc_cfg = root_cfg.vocoder
            voc = HiFiGANGenerator(cfg=voc_cfg)
            voc_params = voc.init(jax.random.PRNGKey(seed + 1), jnp.zeros((1, 8, root_cfg.model.n_feats)))
        return cls(root_cfg.model, params, voc_cfg, voc_params, **kw)


    # ------------------------------------------------------------------ #
    # precision
    # ------------------------------------------------------------------ #

    def _cast_in(self, tree):
        """Cast float arrays to the compute dtype inside the jitted program
        (bf16 feeds the MXU at 2x the f32 rate; params stay f32 at rest)."""
        if self.compute_dtype == jnp.float32:
            return tree
        from emojivoice_tpu.utils.trees import cast_floats

        return cast_floats(tree, self.compute_dtype)

    def _cast_out(self, tree):
        if self.compute_dtype == jnp.float32:
            return tree
        from emojivoice_tpu.utils.trees import cast_floats

        return cast_floats(tree, jnp.float32)

    # ------------------------------------------------------------------ #
    # compiled stages
    # ------------------------------------------------------------------ #

    def _get_stage_a(self, t_bucket: int, batch: int):
        key = (t_bucket, batch)
        if key not in self._stage_a:

            @jax.jit
            def stage_a(params, x, x_lengths, spks, length_scale):
                return self.model.apply(
                    params, x, x_lengths, spks, length_scale, method=MatchaTTS.encode_text
                )

            self._stage_a[key] = stage_a
        return self._stage_a[key]

    def _get_stage_b(self, t_bucket: int, m_bucket: int, batch: int, n_timesteps: int, denoise: bool,
                     keep_mel: bool = True, vocode: bool = True, pcm16: bool = False):
        key = (t_bucket, m_bucket, batch, n_timesteps, denoise, keep_mel, vocode, pcm16)
        if key not in self._stage_b:

            @jax.jit
            def stage_b(params, voc_params, mu_x, w_ceil, y_lengths, x_mask, spk_e, temperature, rng,
                        denoiser_strength):
                params, mu_x, x_mask, spk_e = self._cast_in((params, mu_x, x_mask, spk_e))
                rng_in, z = self._row_noise(rng, temperature, m_bucket)
                out = self.model.apply(
                    params, mu_x, w_ceil, y_lengths, x_mask, spk_e, m_bucket, n_timesteps,
                    temperature, rng_in, z, method=MatchaTTS.decode_mel,
                )
                # only ship what the caller reads — over a TPU tunnel the
                # D2H transfer of attn/encoder outputs would dominate
                res = {"mel_lengths": out["mel_lengths"]}
                if keep_mel:
                    res["mel"] = out["mel"]
                if vocode and self.vocoder is not None:
                    wav = self._vocode(self._cast_in(voc_params), out["mel"])
                    if denoise:
                        # denoiser STFT/iSTFT stays f32 (phase math)
                        wav = self.denoiser(wav.astype(jnp.float32), denoiser_strength)
                    if pcm16:
                        # quantize on device: halves the D2H payload
                        wav = jnp.clip(wav.astype(jnp.float32), -1.0, 1.0)
                        wav = (wav * 32767.0).astype(jnp.int16)
                    res["wav"] = wav
                return self._cast_out(res)

            self._stage_b[key] = stage_b
        return self._stage_b[key]

    def _get_fused(self, t_bucket: int, m_bucket: int, batch: int, n_timesteps: int, denoise: bool,
                   keep_mel: bool = True, pcm16: bool = False):
        key = (t_bucket, m_bucket, batch, n_timesteps, denoise, keep_mel, pcm16)
        if key not in self._fused:

            @jax.jit
            def fused(params, voc_params, x, x_lengths, spks, length_scale, temperature, rng,
                      denoiser_strength):
                params = self._cast_in(params)
                rng_in, z = self._row_noise(rng, temperature, m_bucket)
                out = self.model.apply(
                    params, x, x_lengths, m_bucket, n_timesteps, temperature, spks, length_scale,
                    rng_in, z, method=MatchaTTS.synthesise,
                )
                res = {"mel_lengths": out["mel_lengths"]}
                if keep_mel:
                    res["mel"] = out["mel"]
                if self.vocoder is not None:
                    wav = self._vocode(self._cast_in(voc_params), out["mel"])
                    if denoise:
                        wav = self.denoiser(wav.astype(jnp.float32), denoiser_strength)
                    if pcm16:
                        wav = jnp.clip(wav.astype(jnp.float32), -1.0, 1.0)
                        wav = (wav * 32767.0).astype(jnp.int16)
                    res["wav"] = wav
                return self._cast_out(res)

            self._fused[key] = fused
        return self._fused[key]

    def _shard_batch_inputs(self, b: int, *arrays):
        """Place batch-leading arrays on the mesh's data axis (replicated
        when there is no mesh or the batch doesn't divide it).  Inputs stay
        numpy otherwise — the no-mesh fast path keeps the lazy-transfer
        behavior the tunnel needs."""
        if self.mesh is None:
            return arrays
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = self.mesh.shape.get("data", 1)
        if n_data <= 1 or b % n_data:
            return arrays
        placed = []
        for a in arrays:
            if a is None:
                placed.append(None)
                continue
            spec = P(*(("data",) + (None,) * (a.ndim - 1)))
            placed.append(jax.device_put(a, NamedSharding(self.mesh, spec)))
        return placed

    def _row_noise(self, rng, temperature, m_bucket: int):
        """Per-row keys → explicit noise; a single key passes through.

        A (B, 2) stacked key array means per-request streams: row i draws
        ``normal(key_i, (m_bucket, n_feats)) * temperature`` in f32 (the
        noise-dtype invariant).  The threefry stream depends on the element
        count, not leading batch dims, so a row inside a merged batch draws
        the identical noise as a batch-1 call with the same key at the same
        mel bucket."""
        if rng.ndim == 1:
            return rng, None
        z = jax.vmap(
            lambda k: jax.random.normal(k, (m_bucket, self.model_cfg.n_feats), jnp.float32)
        )(rng)
        return None, z * temperature

    # ------------------------------------------------------------------ #
    # public API
    # ------------------------------------------------------------------ #

    def encode_texts(self, texts: Sequence[str], language: Optional[str] = None):
        """Host-side text processing for a padded batch."""
        cleaners = self.cleaners
        if language is not None:
            from emojivoice_tpu.text.cleaners import LANGUAGE_CLEANERS

            if language not in LANGUAGE_CLEANERS:
                raise KeyError(f"Unknown language {language!r}; available: {sorted(LANGUAGE_CLEANERS)}")
            cleaners = (LANGUAGE_CLEANERS[language].__name__,)
        seqs, lengths, cleaned = [], [], []
        for t in texts:
            ids, c = textlib.text_to_sequence(t, cleaners)
            ids = intersperse(ids, 0)
            seqs.append(ids)
            lengths.append(len(ids))
            cleaned.append(c)
        t_bucket = pick_bucket(max(lengths), self.text_buckets)
        x = np.zeros((len(texts), t_bucket), np.int32)
        for i, ids in enumerate(seqs):
            x[i, : len(ids)] = ids
        # numpy, not jnp: eager device_put is a synchronous tunnel round trip
        # per array on remote TPU; as numpy the transfer rides the dispatch
        return x, np.asarray(lengths, np.int32), cleaned, t_bucket

    def synthesise(
        self,
        texts: Sequence[str],
        spks: Optional[Sequence[int]] = None,
        n_timesteps: int = 10,
        temperature: float = 0.667,
        length_scale: float = 1.0,
        denoiser_strength: float = 0.00025,
        language: Optional[str] = None,
        seed: Optional[int | Sequence[int]] = None,
        fused: bool = False,
        fused_mel_bucket: Optional[int] = None,
        keep_mel: bool = True,
        vocode: bool = True,
        pcm16: bool = False,
    ) -> list[SynthesisResult]:
        """Synthesise a padded batch of texts (all 11 emoji voices in one
        compiled call is `texts×11` with per-item spks — BASELINE config #2).

        ``seed`` may be a single int (one key, rows get slices of one batch
        stream — cheapest) or a per-row sequence of ints.  Per-row seeds make
        each row's noise a function of its own seed alone, so a row inside a
        merged serving batch draws the same stream as a direct batch-1 call
        with that seed (same mel bucket) — outputs agree to XLA
        reassociation level, and exact replays through the same program are
        bit-identical (pinned in tests/test_pipeline.py).
        """
        return self.finalize(self.synthesise_async(
            texts, spks=spks, n_timesteps=n_timesteps, temperature=temperature,
            length_scale=length_scale, denoiser_strength=denoiser_strength,
            language=language, seed=seed, fused=fused, fused_mel_bucket=fused_mel_bucket,
            keep_mel=keep_mel, vocode=vocode, pcm16=pcm16,
        ))

    def synthesise_async(
        self,
        texts: Sequence[str],
        spks: Optional[Sequence[int]] = None,
        n_timesteps: int = 10,
        temperature: float = 0.667,
        length_scale: float = 1.0,
        denoiser_strength: float = 0.00025,
        language: Optional[str] = None,
        seed: Optional[int | Sequence[int]] = None,
        fused: bool = False,
        fused_mel_bucket: Optional[int] = None,
        keep_mel: bool = True,
        vocode: bool = True,
        pcm16: bool = False,
    ) -> PendingSynthesis:
        """Dispatch the compiled program WITHOUT fetching its outputs.

        JAX dispatch is asynchronous: this returns as soon as the program is
        enqueued (the two-stage path's one mid-point host sync aside), so a
        caller can overlap this batch's device time with the previous
        batch's ``finalize`` fetch."""
        t0 = dt.datetime.now()
        x, x_lengths, cleaned, t_bucket = self.encode_texts(texts, language)
        b = x.shape[0]
        spk_arr = None
        if self.model_cfg.n_spks > 1:
            raw = np.asarray(spks if spks is not None else [0] * b, np.int32)
            # out-of-range ids would hit jnp.take's NaN fill inside Embed;
            # clamp like a robust lookup (the reference would hard-crash)
            spk_arr = np.clip(raw, 0, self.model_cfg.n_spks - 1)
        # all per-call inputs stay numpy until the jitted call: each eager
        # jnp conversion / PRNGKey is its own synchronous put over the tunnel
        if seed is not None and not isinstance(seed, (int, np.integer)):
            row_seeds = [int(s) for s in seed]
            if len(row_seeds) != b:
                raise ValueError(f"got {len(row_seeds)} seeds for {b} texts")
            rng = np.stack([host_prng_key(s) for s in row_seeds])  # (B, 2)
        else:
            rng = host_prng_key(np.random.randint(0, 2**31) if seed is None else seed)
        ls = np.float32(length_scale)
        temp = np.float32(temperature)
        denoise = self.denoiser is not None and denoiser_strength > 0
        if self.mesh is not None:
            # rng: a single (2,) key replicates; per-row (B, 2) keys shard
            rng_in = rng if rng.ndim == 1 else None
            x, x_lengths, spk_arr, rng_rows = self._shard_batch_inputs(
                b, x, x_lengths, spk_arr, None if rng.ndim == 1 else rng)
            rng = rng_in if rng_rows is None else rng_rows

        if fused:
            m_bucket = fused_mel_bucket or self.mel_buckets[-1]
            fn = self._get_fused(t_bucket, m_bucket, b, n_timesteps, denoise, keep_mel, pcm16)
            out = fn(self.params, self.vocoder_params, x, x_lengths, spk_arr, ls, temp, rng,
                     np.float32(denoiser_strength))
        else:
            stage_a = self._get_stage_a(t_bucket, b)
            mu_x, w_ceil, y_lengths, x_mask, spk_e = stage_a(self.params, x, x_lengths, spk_arr, ls)
            # the host sync — fetch the (B,) vector and reduce on host: an
            # eager jnp.max would be its own dispatched program (one extra
            # tunnel round trip) before the fetch
            y_len_max = int(np.max(jax.device_get(y_lengths)))
            m_bucket = pick_bucket(fix_len_compatibility(y_len_max), self.mel_buckets)
            stage_b = self._get_stage_b(t_bucket, m_bucket, b, n_timesteps, denoise, keep_mel, vocode, pcm16)
            out = stage_b(self.params, self.vocoder_params, mu_x, w_ceil, y_lengths, x_mask, spk_e,
                          temp, rng, np.float32(denoiser_strength))

        return PendingSynthesis(out=out, cleaned=cleaned, b=b, t0=t0)

    def finalize(self, p: PendingSynthesis) -> list[SynthesisResult]:
        """Fetch a dispatched batch's outputs and build the results.  The
        RTF wall clock spans dispatch→fetch of THIS batch; under the serving
        engine's pipelining that window overlaps the neighbor batches, so
        throughput there is the engine's utt/s, not 1/rtf."""
        b, cleaned, t0 = p.b, p.cleaned, p.t0
        out = jax.device_get(p.out)  # blocks until the program finishes
        t_done = dt.datetime.now()

        results = []
        mel_lengths = np.asarray(out["mel_lengths"])
        # acoustic and vocoder run fused in one program, so a single wall
        # clock covers both; per-item RTF amortizes the batch (the reference
        # computes batched RTF over the padded batch length, cli.py:301-302).
        t_mel = t_total = (t_done - t0).total_seconds()
        ups = self.vocoder_cfg.total_upsample if self.vocoder_cfg is not None else HOP_LENGTH
        for i in range(b):
            ml = int(mel_lengths[i])
            mel = np.asarray(out["mel"][i][:ml]) if "mel" in out else np.zeros((0, 0), np.float32)
            wav = None
            if "wav" in out:
                # trim the padded-bucket waveform to the true mel length
                # (reference: cli.py:306-311 trims by mel_lengths·256); the
                # denoiser's iSTFT can shave a partial final frame.
                raw = out["wav"][i][: ml * ups]
                wav = (np.asarray(raw, np.float32) / 32767.0) if raw.dtype == np.int16 \
                    else np.asarray(raw, np.float32)
            # reference RTF formulas (matcha_tts.py:142-143, cli.py:301-302)
            rtf = t_mel * SAMPLE_RATE / (max(ml, 1) * HOP_LENGTH) / b
            rtf_w = (t_total * SAMPLE_RATE / max(len(wav), 1) / b) if wav is not None else float("nan")
            results.append(
                SynthesisResult(
                    wav=wav if wav is not None else np.zeros(0, np.float32),
                    mel=mel,
                    mel_length=ml,
                    rtf=rtf,
                    rtf_w=rtf_w,
                    cleaned_text=cleaned[i],
                )
            )
        return results

    def warmup(self, n_timesteps: int = 10, batch: int = 1, fused: bool = False,
               keep_mel: bool = True, vocode: bool = True, pcm16: bool = False):
        """Compile the common program(s) ahead of time.

        The compiled-program key includes keep_mel/vocode/pcm16, so warm with
        the SAME flags the serving path will use (BatchingEngine.warmup does)
        — warming only the defaults would leave the first real request paying
        a full compile."""
        text = "a " * 10
        self.synthesise([text] * batch, spks=[0] * batch if self.model_cfg.n_spks > 1 else None,
                        n_timesteps=n_timesteps, seed=0, fused=fused,
                        keep_mel=keep_mel, vocode=vocode, pcm16=pcm16)
