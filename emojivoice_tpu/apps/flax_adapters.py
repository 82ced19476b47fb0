"""JAX-native ASR and LLM adapters — the conversational stack on the TPU.

The reference's feel_me agent chains torch Whisper (feel_me.py:29,268) and an
Ollama server (feel_me.py:115-119) around the TTS.  Both are host-process
round trips in the reference; here the same capabilities run as compiled XLA
programs on the same device mesh as synthesis, via transformers' Flax model
classes:

  FlaxWhisperASR  — Whisper encoder/decoder greedy decode under one jit
                    (fixed (1, 80, 3000) feature shape → a single program).
  FlaxChatLM      — causal-LM chat (e.g. GPT-2 family) with static bucketed
                    prompt lengths and explicit PRNG threading, so sampling
                    is reproducible and the compiled-program cache stays
                    bounded (framework invariants: static shapes, explicit
                    keys).

Both take either a pretrained name (weights must be on disk — this image has
no network) or injected (model, params, tokenizer) for hermetic use; tests
drive them with tiny random-init configs and stub tokenizers.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

WHISPER_SAMPLE_RATE = 16_000


def _load_wav_16k(wav_path: str) -> np.ndarray:
    """Read a wav file → mono float32 at Whisper's 16 kHz."""
    from emojivoice_tpu.data.audio_np import load_wav, resample_poly_np

    data, sr = load_wav(wav_path)
    if data.ndim > 1:  # (T, C) → mono
        data = data.mean(axis=-1)
    if sr != WHISPER_SAMPLE_RATE:
        data = resample_poly_np(data, sr, WHISPER_SAMPLE_RATE)
    return np.asarray(data, dtype=np.float32)


class FlaxWhisperASR:
    """Whisper speech-to-text as one jitted XLA program.

    The log-mel frontend runs on host (tiny, 30 s fixed window); the
    encoder + greedy decoder-loop (`lax.while_loop` inside transformers'
    Flax generate) is compiled once — the feature shape is always
    (1, 80, 3000), so there is exactly one program regardless of input.
    """

    needs_audio = True  # reads a recorded wav — the loop must supply one

    def __init__(
        self,
        model=None,
        params=None,
        feature_extractor=None,
        tokenizer=None,
        model_name: str = "openai/whisper-tiny.en",
        max_length: Optional[int] = None,
    ):
        import jax

        if model is None:
            from transformers import (  # noqa: PLC0415
                FlaxWhisperForConditionalGeneration,
                WhisperProcessor,
            )

            model = FlaxWhisperForConditionalGeneration.from_pretrained(model_name)
            processor = WhisperProcessor.from_pretrained(model_name)
            feature_extractor = feature_extractor or processor.feature_extractor
            tokenizer = tokenizer or processor.tokenizer
        if feature_extractor is None:
            from transformers import WhisperFeatureExtractor  # noqa: PLC0415

            feature_extractor = WhisperFeatureExtractor(
                feature_size=model.config.num_mel_bins
            )
        if tokenizer is None:
            raise ValueError("tokenizer required when injecting a model")
        self._model = model
        self._params = params if params is not None else model.params
        self._fe = feature_extractor
        self._tok = tokenizer
        self._max_length = int(max_length or min(model.config.max_target_positions, 128))

        def _gen(feats, p):
            return self._model.generate(
                feats, params=p, max_length=self._max_length, do_sample=False
            ).sequences

        self._generate = jax.jit(_gen)

    def transcribe_array(self, wav: np.ndarray, sample_rate: int) -> str:
        from emojivoice_tpu.data.audio_np import resample_poly_np

        wav = np.asarray(wav, dtype=np.float32)
        if wav.ndim > 1:
            wav = wav.mean(axis=-1)
        if sample_rate != WHISPER_SAMPLE_RATE:
            wav = resample_poly_np(wav, sample_rate, WHISPER_SAMPLE_RATE)
        feats = self._fe(
            wav, sampling_rate=WHISPER_SAMPLE_RATE, return_tensors="np"
        ).input_features
        seq = np.asarray(self._generate(feats, self._params))[0]
        return self._tok.decode(seq.tolist(), skip_special_tokens=True).strip()

    def transcribe(self, wav_path: str) -> str:
        return self.transcribe_array(_load_wav_16k(wav_path), WHISPER_SAMPLE_RATE)


class FlaxChatLM:
    """Causal-LM chat on the device: static bucketed prompts, explicit PRNG.

    Prompt tokens are left-padded to the smallest bucket that fits (one
    compiled program per (bucket, sampling) pair); sampling keys derive from
    the constructor seed via fold_in(turn counter), so a conversation replays
    bit-identically from the same seed — the reference's Ollama temperature
    0.6 call (feel_me.py:115-119) has no such reproducibility.
    """

    def __init__(
        self,
        model=None,
        params=None,
        tokenizer=None,
        model_name: str = "gpt2",
        temperature: float = 0.6,
        max_new_tokens: int = 64,
        seed: int = 0,
        prompt_buckets: Sequence[int] = (64, 128, 256, 512),
    ):
        import jax

        if model is None:
            from transformers import (  # noqa: PLC0415
                AutoTokenizer,
                FlaxAutoModelForCausalLM,
            )

            model = FlaxAutoModelForCausalLM.from_pretrained(model_name)
            tokenizer = tokenizer or AutoTokenizer.from_pretrained(model_name)
        if tokenizer is None:
            raise ValueError("tokenizer required when injecting a model")
        self._model = model
        self._params = params if params is not None else model.params
        self._tok = tokenizer
        self.temperature = float(temperature)
        self.max_new_tokens = int(max_new_tokens)
        # a bucket + its new tokens must fit the model's position table
        n_pos = getattr(model.config, "max_position_embeddings", None) or getattr(
            model.config, "n_positions", None
        )
        buckets = sorted(b for b in prompt_buckets
                         if n_pos is None or b + self.max_new_tokens <= n_pos)
        if not buckets:
            buckets = [int(n_pos) - self.max_new_tokens]
        self.prompt_buckets = tuple(buckets)
        self._base_key = jax.random.PRNGKey(seed)
        self._turn = 0
        self._programs = {}  # (bucket, do_sample) → jitted generate
        pad = getattr(tokenizer, "pad_token_id", None)
        if pad is None:
            pad = getattr(tokenizer, "eos_token_id", None)
        if pad is None:
            pad = int(model.config.pad_token_id or model.config.eos_token_id or 0)
        self._pad_id = int(pad)

    # -- prompt construction ------------------------------------------------

    def _prompt_ids(self, messages: List[dict]) -> List[int]:
        tmpl = getattr(self._tok, "chat_template", None)
        if tmpl:
            # templated tokenizers: let the template emit its own specials —
            # re-tokenizing the rendered string would duplicate BOS etc.
            return list(
                self._tok.apply_chat_template(messages, tokenize=True,
                                              add_generation_prompt=True)
            )
        text = "\n".join(f"{m['role']}: {m['content']}" for m in messages) + "\nassistant:"
        return list(self._tok(text)["input_ids"])

    def _fit_messages(self, messages: List[dict]) -> List[int]:
        """Token ids that fit the largest bucket, dropping the OLDEST history
        message first and never the system message — tail-truncation would
        silently cut the system instructions (the emoji rules in feel_me)
        exactly when the conversation gets long."""
        max_bucket = self.prompt_buckets[-1]
        messages = list(messages)
        ids = self._prompt_ids(messages)
        while len(ids) > max_bucket and len(messages) > 2:
            del messages[1]  # oldest non-system message
            ids = self._prompt_ids(messages)
        if len(ids) > max_bucket:
            # system + current turn alone overflow: keep the instruction head
            # and the current-user tail
            head = max_bucket // 2
            ids = ids[:head] + ids[-(max_bucket - head):]
        return ids

    def _encode(self, messages: List[dict]):
        ids = self._fit_messages(messages)
        bucket = next(b for b in self.prompt_buckets if b >= len(ids))
        n_pad = bucket - len(ids)
        padded = np.full((1, bucket), self._pad_id, dtype=np.int32)
        mask = np.zeros((1, bucket), dtype=np.int32)
        padded[0, n_pad:] = ids
        mask[0, n_pad:] = 1
        return padded, mask, bucket

    # -- generation ---------------------------------------------------------

    def _program(self, bucket: int, do_sample: bool):
        import jax

        key = (bucket, do_sample)
        if key not in self._programs:
            max_length = bucket + self.max_new_tokens
            temp = self.temperature

            def _gen(ids, mask, p, prng):
                kw = dict(params=p, max_length=max_length, attention_mask=mask)
                if do_sample:
                    out = self._model.generate(
                        ids, do_sample=True, temperature=temp, prng_key=prng, **kw
                    )
                else:
                    out = self._model.generate(ids, do_sample=False, **kw)
                return out.sequences

            self._programs[key] = jax.jit(_gen)
        return self._programs[key]

    def chat(self, system_prompt: str, history: List[dict], user_msg: str) -> str:
        import jax

        from emojivoice_tpu.apps.adapters import build_messages

        ids, mask, bucket = self._encode(build_messages(system_prompt, history, user_msg))
        do_sample = self.temperature > 0
        prng = jax.random.fold_in(self._base_key, self._turn)
        self._turn += 1
        seq = np.asarray(self._program(bucket, do_sample)(ids, mask, self._params, prng))[0]
        new_ids = seq[bucket:].tolist()
        eos = getattr(self._model.config, "eos_token_id", None)
        if eos is not None and eos in new_ids:
            new_ids = new_ids[: new_ids.index(eos)]
        return self._tok.decode(new_ids, skip_special_tokens=True).strip()
