"""`python -m emojivoice_tpu.io.export_torch` — export a trained model back
to the reference's checkpoint format.

Lets reference-side tooling (or collaborators still on the PyTorch stack)
consume voices fine-tuned here: reads an orbax checkpoint directory, maps
params to reference names/layouts (io.torch_ckpt.export_matcha_state_dict),
and writes either a real torch checkpoint (when torch is importable) or an
.npz with the same names plus a loader stub.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def export(ckpt_dir: str, output: str, step: int = None) -> Path:
    from emojivoice_tpu.io.checkpoint import CheckpointManager
    from emojivoice_tpu.io.torch_ckpt import export_matcha_hparams, export_matcha_state_dict

    mgr = CheckpointManager(ckpt_dir)
    cfg = mgr.load_config()
    restored = mgr.restore(step)
    params = restored["params"] if "params" in restored else restored
    mgr.close()

    sd = export_matcha_state_dict(params, cfg.model)
    out = Path(output)
    try:
        import torch  # noqa: PLC0415

        torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v).copy())
                                   for k, v in sd.items()},
                    # reference-shaped architecture record (plain dicts —
                    # readable by extract_hyper_parameters and torch-side code)
                    "hyper_parameters": export_matcha_hparams(cfg.model)}, out)
        print(f"wrote torch checkpoint: {out} ({len(sd)} tensors)")
    except ImportError:
        out = out.with_suffix(".npz")
        np.savez(out, **sd)
        print(f"torch not available; wrote npz with reference names: {out}")
        print("load on the torch side with: "
              "sd = {k: torch.from_numpy(v) for k, v in np.load(path).items()}")
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="emojivoice-export-torch")
    p.add_argument("--ckpt_dir", required=True, help="orbax dir (out_dir/ckpts)")
    p.add_argument("--output", required=True, help="output .ckpt path")
    p.add_argument("--step", type=int, default=None)
    args = p.parse_args(argv)
    export(args.ckpt_dir, args.output, args.step)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
