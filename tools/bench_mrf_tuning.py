"""MRF kernel tuning sweep on the real chip: t_tile and packing glue.

Three questions, each measured directly:
  1. t_tile: halo overhead falls with bigger tiles (2*60/t_tile extra compute)
     but VMEM scratch grows — where is the knee?
  2. glue: how much of the time-split path is the XLA pad/concat/transpose
     around the kernel vs the kernel itself?  Compares timesplit on the
     stage-native shape against the raw kernel on the pre-packed shape.
  3. per-stage totals at the chosen tile, to refresh the "auto" policy data.

Run: python tools/bench_mrf_tuning.py   (TPU; one JSON line)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench_util import amortized_ms


def main() -> int:
    import jax
    import jax.numpy as jnp

    from emojivoice_tpu.config import HiFiGANConfig, enable_compilation_cache
    from emojivoice_tpu.ops.pallas_mrf import (
        mrf_stage_pallas,
        mrf_stage_pallas_timesplit,
        stack_resblock_weights,
    )
    from emojivoice_tpu.vocoder import HiFiGANGenerator

    enable_compilation_cache()
    cfg = HiFiGANConfig()
    voc = HiFiGANGenerator(cfg=cfg)
    params = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.num_mels)))
    num_kernels = len(cfg.resblock_kernel_sizes)
    n_dils = [len(d) for d in cfg.resblock_dilation_sizes]
    dils = tuple(tuple(d) for d in cfg.resblock_dilation_sizes)
    rng = np.random.default_rng(0)
    reps = 8

    out = {"backend": jax.default_backend()}

    def timed(name, fn, x_shape):
        x = jnp.asarray(rng.normal(size=x_shape).astype(np.float32))
        try:
            ms = amortized_ms(
                lambda i, acc, x: fn(x * (1.0 + 1e-9 * i.astype(jnp.float32))),
                (x,), n_hi=reps, stride=1024)
            out[name] = round(ms, 3)
        except Exception as e:  # noqa: BLE001
            out[f"{name}_err"] = f"{type(e).__name__}: {e}"[:120]

    # stage-1 weights (C=128): the raw-kernel shape every packed stage reduces to
    w1 = stack_resblock_weights(params, num_kernels, 1, n_dils)
    for tt in (1024, 2048, 4096, 8192):
        timed(f"raw_128x32768_tt{tt}",
              lambda x, tt=tt: mrf_stage_pallas(x, w1, cfg.resblock_kernel_sizes,
                                                dils, t_tile=tt), (1, 32768, 128))

    # glue: time-split stage 3 (native (131072, 32)) vs raw kernel on the
    # already-packed (32768, 128) with the SAME weights — the difference is
    # pad/concat/block-diag/transpose glue + mask arithmetic
    w3 = stack_resblock_weights(params, num_kernels, 3, n_dils)
    for tt in (2048, 4096):
        timed(f"timesplit_32x131072_tt{tt}",
              lambda x, tt=tt: mrf_stage_pallas_timesplit(
                  x, w3, cfg.resblock_kernel_sizes, dils, t_tile=tt),
              (1, 131072, 32))
    w2 = stack_resblock_weights(params, num_kernels, 2, n_dils)
    for tt in (2048, 4096):
        timed(f"timesplit_64x65536_tt{tt}",
              lambda x, tt=tt: mrf_stage_pallas_timesplit(
                  x, w2, cfg.resblock_kernel_sizes, dils, t_tile=tt),
              (1, 65536, 64))

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
