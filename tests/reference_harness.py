"""Import REAL reference model code as a parity oracle.

The strongest possible oracle is the reference's own torch modules — code
this repo's authors did not write.  The vocoder imports cleanly
(tests/test_hifigan_parity.py); the acoustic modules are blocked only by
IMPORT-TIME scaffolding absent from this image (hydra, lightning, omegaconf,
gdown, wget — all used for config printing / logging / downloads, none in
the model math).  This harness installs inert stand-ins for exactly those
names so `matcha.models.components.text_encoder` and `matcha.utils.model`
load and run their real forward passes.

Scope note: the decoder/CFM chain additionally needs the real `diffusers`
attention implementation (the math itself) — stubbing that would replace
reference code with ours and defeat the point, so the U-Net keeps the
condensed torch oracle (tests/torch_oracle.py) instead.
"""

from __future__ import annotations

import contextlib
import sys
import types

REF_ROOT = "/root/reference/Matcha-TTS"


def _module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def install_reference_stubs() -> None:
    """Idempotently register import-time stand-ins (see module docstring)."""
    identity = lambda fn: fn  # noqa: E731 — rank_zero_only decorator shape

    lightning = _module("lightning", Callback=object)
    pytorch = _module("lightning.pytorch")
    lightning.pytorch = pytorch
    pytorch.loggers = _module("lightning.pytorch.loggers", Logger=object)
    pytorch.utilities = _module("lightning.pytorch.utilities", rank_zero_only=identity)

    hydra = _module("hydra")
    core = _module("hydra.core")
    hydra.core = core
    core.hydra_config = _module("hydra.core.hydra_config", HydraConfig=type("HydraConfig", (), {}))

    _module("omegaconf", DictConfig=dict, OmegaConf=type("OmegaConf", (), {}),
            open_dict=contextlib.nullcontext)
    _module("gdown")
    _module("wget")


def import_reference(modname: str):
    """install stubs, put the reference on sys.path, import `modname`."""
    install_reference_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import importlib

    return importlib.import_module(modname)
