"""Where does the serving wall-clock go? (real TPU, tunnel environment)

Decomposes the bench.py operating point (fused single-dispatch program,
10 ODE steps, ~5.7 s utterance) into:

  compute   — amortized per-call device time: N back-to-back dispatches of
              the fused program, one final scalar fetch (no per-call sync)
  e2e       — bench-style per-call wall: dispatch + wait + full pcm16
              device_get every call
  overhead  — e2e − compute ≈ tunnel RTT + D2H of the waveform + host work

Prints one JSON line. The split tells us what further kernel work can and
cannot buy: compute is ours; the RTT floor is the environment's.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emojivoice_tpu.config import enable_compilation_cache
    from emojivoice_tpu.inference.pipeline import SynthesisPipeline
    from emojivoice_tpu.utils.buckets import pick_bucket

    enable_compilation_cache()
    text = (
        "The quick brown fox jumped over the lazy dog, and everyone at the "
        "party cheered loudly for the brave little robot."
    )
    steps, spk = 10, [79]
    pipe = SynthesisPipeline.from_random(cleaners=("basic_cleaners",))
    print(f"[breakdown] backend={jax.default_backend()}", file=sys.stderr)

    first = pipe.synthesise([text], spks=spk, n_timesteps=steps, seed=0, keep_mel=False, pcm16=True)[0]
    m_bucket = pick_bucket(first.mel_length, pipe.mel_buckets)
    # exact args the pipeline passes
    x, x_lengths, _, t_bucket = pipe.encode_texts([text])
    fn = pipe._get_fused(t_bucket, m_bucket, 1, steps, True, False, True)
    spk_arr = jnp.asarray(np.asarray(spk, np.int32))
    args = (pipe.params, pipe.vocoder_params, x, x_lengths, spk_arr,
            jnp.float32(1.0), jnp.float32(0.667), jax.random.PRNGKey(0), jnp.float32(0.00025))
    out = fn(*args)  # compile + warm
    wav_bytes = int(np.asarray(out["wav"]).nbytes)
    _ = float(jnp.sum(out["mel_lengths"]))

    # --- compute: in-jit repetition (one dispatch, N device executions;
    # the axon tunnel throttles per-dispatch, so host-side loops measure
    # dispatch cost, not device time) ---------------------------------------
    def make_rep(n):
        @jax.jit
        def rep(params, voc, x, xl, spk, ls, temp, rng, dn):
            def body(i, acc):
                out = fn(params, voc, x, xl, spk, ls, temp, jax.random.fold_in(rng, i), dn)
                return acc + jnp.sum(out["wav"][:, ::4096].astype(jnp.int32))
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return rep

    rep1, rep8 = make_rep(1), make_rep(8)
    _ = int(rep1(*args)); _ = int(rep8(*args))  # compile + warm
    t1s, t8s = [], []
    for _ in range(5):
        t0 = dt.datetime.now(); _ = int(rep1(*args))
        t1s.append((dt.datetime.now() - t0).total_seconds() * 1e3)
        t0 = dt.datetime.now(); _ = int(rep8(*args))
        t8s.append((dt.datetime.now() - t0).total_seconds() * 1e3)
    compute_ms = (float(np.median(t8s)) - float(np.median(t1s))) / 7.0

    # --- e2e: per-call full fetch (bench.py behavior) ---------------------
    walls = []
    for _ in range(10):
        t0 = dt.datetime.now()
        out = fn(*args)
        _ = jax.device_get(out)
        walls.append((dt.datetime.now() - t0).total_seconds() * 1e3)
    e2e_ms = float(np.median(walls))

    audio_s = 5.68
    print(json.dumps({
        "metric": "serving_breakdown",
        "compute_ms": round(compute_ms, 2),
        "e2e_ms": round(e2e_ms, 2),
        "overhead_ms": round(e2e_ms - compute_ms, 2),
        "wav_payload_kb": round(wav_bytes / 1024, 1),
        "rtf_compute_only": round(compute_ms / 1e3 / audio_s, 5),
        "rtf_e2e": round(e2e_ms / 1e3 / audio_s, 5),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
