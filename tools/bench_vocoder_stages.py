"""Per-stage HiFi-GAN timing on the real chip: where does vocoder time go?

Times each piece of the generator as its own jitted program at serving batch
(conv_pre, each transposed-conv upsample, each MRF stage XLA-unfused vs
fused-Pallas, conv_post) so kernel work can be aimed at the actual hot stage
instead of the aggregate number (tools/bench_vocoder.py reports only e2e).

Run:  python tools/bench_vocoder_stages.py [--batch 8] [--frames 512]
Emits one JSON line; stage keys are `<piece>_ms` (amortized per call).

Reference cost model for orientation (flagship cfg, B=8, T=512 frames):
an MRF stage is 252*B*T_s*C^2 FLOPs (3 res-blocks x 6 convs, k in {3,7,11});
stages (C=256,128,64,32) are ~0.5/1.1/0.5/0.27 TFLOP — if a stage runs far
from the MXU roofline the gap is shifts/DMA/layout, not math.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench_util import amortized_ms


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from emojivoice_tpu.config import HiFiGANConfig, enable_compilation_cache
    from emojivoice_tpu.ops.convs import conv1d, conv_transpose1d
    from emojivoice_tpu.ops.pallas_mrf import (
        LRELU_SLOPE,
        _max_resblock_weight_bytes,
        mrf_stage_pallas_packed,
        mrf_stage_unfused,
        stack_resblock_weights,
    )
    from emojivoice_tpu.vocoder import HiFiGANGenerator

    enable_compilation_cache()
    cfg = HiFiGANConfig()
    voc = HiFiGANGenerator(cfg=cfg)
    params = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.num_mels)))
    p = params["params"]
    num_kernels = len(cfg.resblock_kernel_sizes)
    n_dils = [len(d) for d in cfg.resblock_dilation_sizes]
    rng = np.random.default_rng(0)

    out = {"backend": jax.default_backend(), "batch": args.batch,
           "frames": args.frames}

    def timed(name, fn, x_shape):
        """Amortized per-call ms via the shared two-depth slope method."""
        x = jnp.asarray(rng.normal(size=x_shape).astype(np.float32))
        try:
            ms = amortized_ms(
                lambda i, acc, x: fn(x * (1.0 + 1e-9 * i.astype(jnp.float32))),
                (x,), n_hi=args.reps, stride=1024)
            out[f"{name}_ms"] = round(ms, 3)
        except Exception as e:  # keep going; record the failure
            out[f"{name}_err"] = f"{type(e).__name__}: {e}"[:160]

    b, t = args.batch, args.frames
    timed("conv_pre", lambda x: conv1d(x, p["conv_pre"]["kernel"],
                                       p["conv_pre"]["bias"], padding=3),
          (b, t, cfg.num_mels))

    t_cur, c_cur = t, cfg.upsample_initial_channel
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        up = p[f"ups_{i}"]
        timed(f"ups{i}", lambda x, up=up, u=u, k=k: conv_transpose1d(
            jax.nn.leaky_relu(x, LRELU_SLOPE), up["kernel"], up["bias"],
            stride=u, padding=(k - u) // 2), (b, t_cur, c_cur))
        t_cur, c_cur = t_cur * u, c_cur // 2

        timed(f"mrf{i}_xla", lambda x, i=i: mrf_stage_unfused(cfg, p, x, i),
              (b, t_cur, c_cur))
        # same VMEM gate as hifigan_apply_pallas: a stage whose res-block
        # weights exceed VMEM would only produce a remote-compile error here
        if _max_resblock_weight_bytes(cfg, c_cur) <= 12 * 1024 * 1024:
            weights = stack_resblock_weights(params, num_kernels, i, n_dils)
            dils = tuple(tuple(d) for d in cfg.resblock_dilation_sizes)
            timed(f"mrf{i}_pallas", lambda x, w=weights, d=dils: mrf_stage_pallas_packed(
                x, w, cfg.resblock_kernel_sizes, d), (b, t_cur, c_cur))
        else:
            out[f"mrf{i}_pallas_skipped"] = "weights exceed VMEM (production path unfuses this stage)"

    timed("conv_post", lambda x: jnp.tanh(conv1d(
        jax.nn.leaky_relu(x, 0.01), p["conv_post"]["kernel"],
        p["conv_post"]["bias"], padding=3)), (b, t_cur, c_cur))

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
