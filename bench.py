"""Benchmark: end-to-end synthesis RTF at 10 Euler ODE steps.

Prints ONE JSON line:
  {"metric": "rtf_e2e_10steps", "value": <median RTF>, "unit": "rtf",
   "vs_baseline": <0.02 / value>}

RTF = wall_seconds · 22050 / wav_samples (the reference's formula,
Matcha-TTS/matcha/cli.py:301-302), measured over the production two-stage
path (encoder program → host bucket pick → fused alignment+CFM+vocoder+
denoiser program) on whatever backend jax selects (the driver runs this on
one real TPU v5e chip).  Weights are random-init (released torch
checkpoints are not present in this image) — compute is identical.

vs_baseline > 1 means better (faster) than the BASELINE.md target RTF 0.02.
"""

from __future__ import annotations

import datetime as dt
import json
import sys


def _wait_for_backend(max_wait_s: float = 900.0, probe_cmd=None,
                      probe_timeout_s: float = 150.0) -> None:
    """Wait for the backend with bounded patience, probing in a SUBPROCESS.

    A remote TPU can be transiently unavailable two ways: client init
    *raises* (backend registered but device claimed), or — when the tunnel
    itself is down — ``jax.devices()`` blocks in ``make_c_api_client``
    indefinitely.  An in-process probe would hang this process forever with
    no chance to retry, so each probe runs in a child with a deadline; a
    probe stuck connecting holds no device session, so killing it on expiry
    is safe (unlike killing a *connected* client, which wedges the device).
    Only after a child connects cleanly does this process init its backend.
    """
    import subprocess
    import time

    if probe_cmd is None:
        # the probe must exercise the DEFAULT backend chain (axon first):
        # register() pins jax_platforms="axon,cpu" in every process, so this
        # is what bench's own init will do
        probe_cmd = [sys.executable, "-c", "import jax; jax.devices()"]
    t0, delay = time.monotonic(), 30.0
    while True:
        try:
            probe = subprocess.run(
                probe_cmd, timeout=probe_timeout_s, capture_output=True, text=True,
            )
            if probe.returncode == 0:
                try:
                    import jax

                    jax.devices()  # tunnel is up: in-process init completes
                    return
                except Exception as e:  # noqa: BLE001 — e.g. UNAVAILABLE while
                    # the far side reaps the probe's just-closed session
                    reason = f"in-process init after good probe: {e!r:.200}"
                    try:  # drop the cached failed init so a retry can succeed
                        from jax.extend.backend import clear_backends

                        clear_backends()
                    except Exception:  # noqa: BLE001
                        pass
            else:
                tail = (probe.stderr or "").strip().splitlines()[-1:] or ["?"]
                reason = f"probe rc={probe.returncode}: {tail[0][:200]}"
        except subprocess.TimeoutExpired:
            reason = "probe hung in client init (tunnel down?)"
        waited = time.monotonic() - t0
        if waited > max_wait_s:
            raise RuntimeError(f"backend unavailable after {waited:.0f}s — {reason}")
        print(f"[bench] backend unavailable after {waited:.0f}s ({reason}); "
              f"retrying in {delay:.0f}s", file=sys.stderr, flush=True)
        time.sleep(delay)
        delay = min(delay * 1.5, 120.0)


def main() -> int:
    import jax
    import numpy as np

    from emojivoice_tpu.config import enable_compilation_cache
    from emojivoice_tpu.inference.pipeline import SynthesisPipeline

    _wait_for_backend()
    enable_compilation_cache()

    text = (
        "The quick brown fox jumped over the lazy dog, and everyone at the "
        "party cheered loudly for the brave little robot."
    )
    steps = 10
    spk = [79]  # 😎 in the emoji mapping

    pipe = SynthesisPipeline.from_random(cleaners=("basic_cleaners",))
    print(f"[bench] backend={jax.default_backend()} devices={jax.devices()}", file=sys.stderr)

    # size the fused program's mel bucket from one two-stage run, then
    # benchmark the single-dispatch fused program (production serving path)
    t0 = dt.datetime.now()
    first = pipe.synthesise([text], spks=spk, n_timesteps=steps, seed=0, keep_mel=False, pcm16=True)[0]
    from emojivoice_tpu.utils.buckets import pick_bucket

    m_bucket = pick_bucket(first.mel_length, pipe.mel_buckets)
    print(f"[bench] two-stage compile+first run: {(dt.datetime.now() - t0).total_seconds():.1f}s, "
          f"mel_len={first.mel_length} bucket={m_bucket}", file=sys.stderr)
    t0 = dt.datetime.now()
    pipe.synthesise([text], spks=spk, n_timesteps=steps, seed=0, fused=True,
                    fused_mel_bucket=m_bucket, keep_mel=False, pcm16=True)
    print(f"[bench] fused compile: {(dt.datetime.now() - t0).total_seconds():.1f}s", file=sys.stderr)

    rtfs, secs = [], []
    for i in range(10):
        batch = pipe.synthesise([text], spks=spk, n_timesteps=steps, seed=i, fused=True,
                                fused_mel_bucket=m_bucket, keep_mel=False, pcm16=True)
        # guardrail: the reported metric is SINGLE-STREAM RTF; a batched run
        # would amortize wall-clock over items and silently inflate the number
        assert len(batch) == 1, "bench must run batch size 1"
        res = batch[0]
        rtfs.append(res.rtf_w)
        secs.append(len(res.wav) / res.sample_rate)
    value = float(np.median(rtfs))
    audio_s = float(np.mean(secs))
    print(f"[bench] audio {audio_s:.2f}s/utt, RTFs={['%.4f' % r for r in rtfs]}", file=sys.stderr)

    # provenance: the kernel policies and program shape this number was
    # measured under — round-to-round deltas must be explainable from the
    # artifact alone (VERDICT r3 weak #2).  vocoder=pallas means the fused
    # time-split MRF kernels (ops/pallas_mrf.py, auto-on for f32 TPU).
    dev0 = jax.devices()[0]
    provenance = {
        "device_kind": getattr(dev0, "device_kind", str(dev0)),
        "backend": jax.default_backend(),
        "jax": jax.__version__,
        "path": "fused_single_dispatch",
        "vocoder_backend": "pallas" if pipe._pallas_voc else "xla",
        "compute_dtype": str(np.dtype(pipe.compute_dtype)),
        "pcm16": True,
        "denoiser": True,
        "n_timesteps": steps,
        "mel_bucket": int(m_bucket),
        "batch": 1,
        "audio_s_per_utt": round(audio_s, 2),
    }
    print(json.dumps({
        "metric": "rtf_e2e_10steps",
        "value": round(value, 5),
        "unit": "rtf",
        "vs_baseline": round(0.02 / value, 3),
        "provenance": provenance,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
