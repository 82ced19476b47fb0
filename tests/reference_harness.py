"""Import REAL reference model code as a parity oracle.

The strongest possible oracle is the reference's own torch modules — code
this repo's authors did not write.  The vocoder imports cleanly
(tests/test_hifigan_parity.py); the acoustic modules are blocked only by
IMPORT-TIME scaffolding absent from this image (hydra, lightning, omegaconf,
gdown, wget — all used for config printing / logging / downloads, none in
the model math).  This harness installs inert stand-ins for exactly those
names so `matcha.models.components.text_encoder` and `matcha.utils.model`
load and run their real forward passes.

The decoder/CFM chain additionally needs a small slice of `diffusers`
(pinned 0.25.0 in the reference requirements, absent from this image):
`Attention` with its default ``AttnProcessor2_0``, ``LoRACompatibleLinear``
(an ``nn.Linear`` subclass), ``get_activation``, and the GELU-family
projection modules.  That slice is small, publicly documented math, so
``install_reference_stubs`` registers an executable stand-in
(`_install_diffusers_stub`) — the structural wiring under test
(`matcha/models/components/decoder.py`, `transformer.py`,
`flow_matching.py`) is then entirely reference code.
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
    import torch as _torch

    identity = lambda fn: fn  # noqa: E731 — rank_zero_only decorator shape

    class _LightningModule(_torch.nn.Module):
        """Just enough of lightning.LightningModule for the reference
        MatchaTTS to __init__ and run inference: a plain nn.Module whose
        save_hyperparameters is a no-op (we instantiate with explicit
        kwargs instead of a ckpt re-load)."""

        def save_hyperparameters(self, *a, **k):
            pass

    lightning = _module("lightning", Callback=object)
    lightning.LightningModule = _LightningModule
    pytorch = _module("lightning.pytorch")
    lightning.pytorch = pytorch
    pytorch.loggers = _module("lightning.pytorch.loggers", Logger=object)
    pytorch.utilities = _module("lightning.pytorch.utilities", rank_zero_only=identity)
    pytorch.utilities.grad_norm = lambda module, norm_type=2: {}

    def _numpy_maximum_path(value, mask):
        """Stand-in for the reference's UNBUILT Cython MAS extension
        (matcha/utils/monotonic_align/core.pyx — .pyx only, no compiled
        module in the snapshot): same contract, computed by our
        oracle-pinned numpy DP."""
        import numpy as _np

        from emojivoice_tpu.ops.mas import maximum_path_numpy

        v = (value * mask).detach().cpu().numpy().astype(_np.float32)
        m = mask.detach().cpu().numpy().astype(_np.float32)
        path = maximum_path_numpy(v, m)
        return _torch.from_numpy(_np.asarray(path)).to(device=value.device, dtype=value.dtype)

    _install_monotonic_align_finder(_numpy_maximum_path)

    hydra = _module("hydra")
    core = _module("hydra.core")
    hydra.core = core
    core.hydra_config = _module("hydra.core.hydra_config", HydraConfig=type("HydraConfig", (), {}))

    _module("omegaconf", DictConfig=dict, OmegaConf=type("OmegaConf", (), {}),
            open_dict=contextlib.nullcontext)
    _module("gdown")
    _module("wget")
    _install_diffusers_stub()


def _install_monotonic_align_finder(impl) -> None:
    """Meta-path finder shadowing matcha.utils.monotonic_align.

    A plain sys.modules pre-registration breaks `import a.b.c as x` (the
    parent chain never imports, so the attribute binding fails); a finder
    participates in normal import machinery and wins over the on-disk
    package (whose __init__ would import the unbuilt Cython core)."""
    import importlib.abc
    import importlib.util

    NAME = "matcha.utils.monotonic_align"

    class _MonoFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
        def find_spec(self, name, path=None, target=None):
            if name == NAME or name == NAME + ".core":
                return importlib.util.spec_from_loader(name, self, is_package=(name == NAME))
            return None

        def create_module(self, spec):
            return None

        def exec_module(self, module):
            if module.__name__ == NAME:
                module.maximum_path = impl

    if not any(isinstance(f, _MonoFinder) or getattr(f, "_mono_stub", False) for f in sys.meta_path):
        finder = _MonoFinder()
        finder._mono_stub = True
        sys.meta_path.insert(0, finder)


def _install_diffusers_stub() -> None:
    """Executable stand-ins for the diffusers-0.25.0 slice the reference uses.

    Written from the public diffusers documentation/API, NOT copied: the
    `Attention` module is q/k/v linears (bias-free by default), a biased out
    projection, heads split, and torch's scaled_dot_product_attention with the
    prepared mask.  Two behaviors matter for parity and are reproduced
    deliberately:

    - ``prepare_attention_mask`` turns the (B, T) float 0/1 mask Matcha passes
      into (B·heads, T) then (B, heads, 1, T), and sdpa treats a FLOAT mask as
      an additive bias — the reference's additive-0/1 attention-mask quirk
      (documented in emojivoice_tpu/models/decoder.py).
    - ``LoRACompatibleLinear`` is exactly ``nn.Linear`` with an ignored
      ``scale`` arg (the LoRA layer is None in eval usage), so state_dict
      names/shapes match the real package.

    The AdaLayerNorm variants are config-dead in the reference
    (``num_embeds_ada_norm=None``), so their stand-ins refuse construction.
    The conformer package (alternative block type) gets its own executable
    stand-in — see ``_install_conformer_stub``.
    """
    import torch
    import torch.nn as tnn
    import torch.nn.functional as tF

    class LoRACompatibleLinear(tnn.Linear):
        def forward(self, x, scale: float = 1.0):  # scale: LoRA-only, no-op here
            return tnn.Linear.forward(self, x)

    class Attention(tnn.Module):
        """diffusers.models.attention_processor.Attention (AttnProcessor2_0 path)."""

        def __init__(self, query_dim, cross_attention_dim=None, heads=8, dim_head=64,
                     dropout=0.0, bias=False, upcast_attention=False, out_bias=True, **_):
            super().__init__()
            self.heads = heads
            inner = dim_head * heads
            kv_dim = cross_attention_dim if cross_attention_dim is not None else query_dim
            self.to_q = LoRACompatibleLinear(query_dim, inner, bias=bias)
            self.to_k = LoRACompatibleLinear(kv_dim, inner, bias=bias)
            self.to_v = LoRACompatibleLinear(kv_dim, inner, bias=bias)
            self.to_out = tnn.ModuleList(
                [LoRACompatibleLinear(inner, query_dim, bias=out_bias), tnn.Dropout(dropout)]
            )

        def prepare_attention_mask(self, attention_mask, target_length, batch_size):
            if attention_mask is None:
                return None
            if attention_mask.shape[-1] != target_length:
                attention_mask = tF.pad(
                    attention_mask, (0, target_length - attention_mask.shape[-1]), value=0.0
                )
            if attention_mask.shape[0] < batch_size * self.heads:
                attention_mask = attention_mask.repeat_interleave(self.heads, dim=0)
            return attention_mask

        def forward(self, hidden_states, encoder_hidden_states=None, attention_mask=None, **_):
            b, t, _c = hidden_states.shape
            if attention_mask is not None:
                attention_mask = self.prepare_attention_mask(attention_mask, t, b)
                attention_mask = attention_mask.view(b, self.heads, -1, attention_mask.shape[-1])
            q = self.to_q(hidden_states)
            kv = hidden_states if encoder_hidden_states is None else encoder_hidden_states
            k, v = self.to_k(kv), self.to_v(kv)
            head_dim = k.shape[-1] // self.heads
            q = q.view(b, -1, self.heads, head_dim).transpose(1, 2)
            k = k.view(b, -1, self.heads, head_dim).transpose(1, 2)
            v = v.view(b, -1, self.heads, head_dim).transpose(1, 2)
            # float attn_mask is ADDED to the scores (torch sdpa semantics)
            out = tF.scaled_dot_product_attention(
                q, k, v, attn_mask=attention_mask, dropout_p=0.0, is_causal=False
            )
            out = out.transpose(1, 2).reshape(b, -1, self.heads * head_dim)
            return self.to_out[1](self.to_out[0](out))

    class GELU(tnn.Module):
        def __init__(self, dim_in, dim_out, approximate="none"):
            super().__init__()
            self.proj = tnn.Linear(dim_in, dim_out)
            self.approximate = approximate

        def forward(self, x):
            return tF.gelu(self.proj(x), approximate=self.approximate)

    class GEGLU(tnn.Module):
        def __init__(self, dim_in, dim_out):
            super().__init__()
            self.proj = LoRACompatibleLinear(dim_in, dim_out * 2)

        def forward(self, x):
            h, gate = self.proj(x).chunk(2, dim=-1)
            return h * tF.gelu(gate)

    class ApproximateGELU(tnn.Module):
        def __init__(self, dim_in, dim_out):
            super().__init__()
            self.proj = tnn.Linear(dim_in, dim_out)

        def forward(self, x):
            x = self.proj(x)
            return x * torch.sigmoid(1.702 * x)

    class _AdaNormUnused(tnn.Module):
        def __init__(self, *a, **k):
            raise NotImplementedError("AdaLayerNorm paths are config-dead in Matcha-TTS")

    _acts = {"silu": tnn.SiLU, "swish": tnn.SiLU, "mish": tnn.Mish,
             "gelu": tnn.GELU, "relu": tnn.ReLU}

    def get_activation(name):
        return _acts[name]()

    diffusers = _module("diffusers")
    models = _module("diffusers.models")
    diffusers.models = models
    models.attention = _module(
        "diffusers.models.attention", GEGLU=GEGLU, GELU=GELU, ApproximateGELU=ApproximateGELU,
        AdaLayerNorm=_AdaNormUnused, AdaLayerNormZero=_AdaNormUnused,
    )
    models.attention_processor = _module("diffusers.models.attention_processor", Attention=Attention)
    models.lora = _module("diffusers.models.lora", LoRACompatibleLinear=LoRACompatibleLinear)
    models.activations = _module("diffusers.models.activations", get_activation=get_activation)
    utils = _module("diffusers.utils")
    diffusers.utils = utils
    utils.torch_utils = _module("diffusers.utils.torch_utils", maybe_allow_in_graph=lambda cls: cls)

    _install_conformer_stub()


def _install_conformer_stub() -> None:
    """Executable stand-in for the lucidrains ``conformer==0.3.2`` package
    (pinned in the reference requirements, absent from this image), written
    from its public math — NOT copied.  The reference's ``ConformerWrapper``
    (decoder.py:161-197) subclasses this ``ConformerBlock``:

      ff1 = Scale(0.5, PreNorm(FeedForward))     linear → swish → dropout →
                                                 linear → dropout
      attn = PreNorm(Attention)                  Shaw relative-position
                                                 attention: fused to_kv,
                                                 (2·512+1, dim_head) distance
                                                 table, clamp ±512, output
                                                 dropout after to_out
      conv = ConformerConvModule                 LN → 1×1 conv ×2 expansion →
                                                 GLU → depthwise k=31 (same
                                                 padding) → BatchNorm1d →
                                                 swish → 1×1 conv → dropout
      ff2 = Scale(0.5, PreNorm(FeedForward))
      post_norm = LayerNorm

    Module/parameter names match the published package so state_dict keys
    line up with real conformer-config checkpoints."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as tF

    class _Swish(tnn.Module):
        def forward(self, x):
            return x * torch.sigmoid(x)

    class _GLU(tnn.Module):
        def __init__(self, dim):
            super().__init__()
            self.dim = dim

        def forward(self, x):
            out, gate = x.chunk(2, dim=self.dim)
            return out * gate.sigmoid()

    class _Transpose(tnn.Module):
        def forward(self, x):
            return x.transpose(1, 2)

    class DepthWiseConv1d(tnn.Module):
        def __init__(self, chan_in, chan_out, kernel_size, padding):
            super().__init__()
            self.padding = padding
            self.conv = tnn.Conv1d(chan_in, chan_out, kernel_size, groups=chan_in)

        def forward(self, x):
            return self.conv(tF.pad(x, self.padding))

    class Scale(tnn.Module):
        def __init__(self, scale, fn):
            super().__init__()
            self.fn, self.scale = fn, scale

        def forward(self, x, **kwargs):
            return self.fn(x, **kwargs) * self.scale

    class PreNorm(tnn.Module):
        def __init__(self, dim, fn):
            super().__init__()
            self.fn, self.norm = fn, tnn.LayerNorm(dim)

        def forward(self, x, **kwargs):
            return self.fn(self.norm(x), **kwargs)

    class Attention(tnn.Module):
        def __init__(self, dim, heads=8, dim_head=64, dropout=0.0, max_pos_emb=512):
            super().__init__()
            inner = dim_head * heads
            self.heads, self.scale = heads, dim_head**-0.5
            self.to_q = tnn.Linear(dim, inner, bias=False)
            self.to_kv = tnn.Linear(dim, inner * 2, bias=False)
            self.to_out = tnn.Linear(inner, dim)
            self.max_pos_emb = max_pos_emb
            self.rel_pos_emb = tnn.Embedding(2 * max_pos_emb + 1, dim_head)
            self.dropout = tnn.Dropout(dropout)

        def forward(self, x, context=None, mask=None, context_mask=None):
            n, h, mx = x.shape[-2], self.heads, self.max_pos_emb
            context = x if context is None else context
            q = self.to_q(x)
            k, v = self.to_kv(context).chunk(2, dim=-1)
            b = x.shape[0]

            def split(t):
                return t.view(b, -1, h, t.shape[-1] // h).transpose(1, 2)

            q, k, v = split(q), split(k), split(v)
            dots = torch.einsum("bhid,bhjd->bhij", q, k) * self.scale

            seq = torch.arange(n, device=x.device)
            dist = (seq.view(-1, 1) - seq.view(1, -1)).clamp(-mx, mx) + mx
            rel = self.rel_pos_emb(dist).to(q)
            pos_attn = torch.einsum("bhnd,nrd->bhnr", q, rel) * self.scale
            dots = dots + pos_attn

            if mask is not None or context_mask is not None:
                mask = torch.ones(*x.shape[:2], device=x.device).bool() if mask is None else mask
                context_mask = mask if context_mask is None else context_mask
                mask_value = -torch.finfo(dots.dtype).max
                pair = mask.view(b, 1, -1, 1) * context_mask.view(b, 1, 1, -1)
                dots.masked_fill_(~pair.bool(), mask_value)

            attn = dots.softmax(dim=-1)
            out = torch.einsum("bhij,bhjd->bhid", attn, v)
            out = out.transpose(1, 2).reshape(b, -1, h * (out.shape[-1]))
            return self.dropout(self.to_out(out))

    class FeedForward(tnn.Module):
        def __init__(self, dim, mult=4, dropout=0.0):
            super().__init__()
            self.net = tnn.Sequential(
                tnn.Linear(dim, dim * mult), _Swish(), tnn.Dropout(dropout),
                tnn.Linear(dim * mult, dim), tnn.Dropout(dropout),
            )

        def forward(self, x):
            return self.net(x)

    def _calc_same_padding(kernel_size):
        pad = kernel_size // 2
        return (pad, pad - (kernel_size + 1) % 2)

    class ConformerConvModule(tnn.Module):
        def __init__(self, dim, causal=False, expansion_factor=2, kernel_size=31, dropout=0.0):
            super().__init__()
            inner = dim * expansion_factor
            padding = _calc_same_padding(kernel_size) if not causal else (kernel_size - 1, 0)
            self.net = tnn.Sequential(
                tnn.LayerNorm(dim), _Transpose(),
                tnn.Conv1d(dim, inner * 2, 1), _GLU(dim=1),
                DepthWiseConv1d(inner, inner, kernel_size=kernel_size, padding=padding),
                tnn.BatchNorm1d(inner) if not causal else tnn.Identity(),
                _Swish(), tnn.Conv1d(inner, dim, 1), _Transpose(), tnn.Dropout(dropout),
            )

        def forward(self, x):
            return self.net(x)

    class ConformerBlock(tnn.Module):
        def __init__(self, *, dim, dim_head=64, heads=8, ff_mult=4, conv_expansion_factor=2,
                     conv_kernel_size=31, attn_dropout=0.0, ff_dropout=0.0, conv_dropout=0.0,
                     conv_causal=False):
            super().__init__()
            self.ff1 = FeedForward(dim=dim, mult=ff_mult, dropout=ff_dropout)
            self.attn = Attention(dim=dim, dim_head=dim_head, heads=heads, dropout=attn_dropout)
            self.conv = ConformerConvModule(
                dim=dim, causal=conv_causal, expansion_factor=conv_expansion_factor,
                kernel_size=conv_kernel_size, dropout=conv_dropout,
            )
            self.ff2 = FeedForward(dim=dim, mult=ff_mult, dropout=ff_dropout)
            self.attn = PreNorm(dim, self.attn)
            self.ff1 = Scale(0.5, PreNorm(dim, self.ff1))
            self.ff2 = Scale(0.5, PreNorm(dim, self.ff2))
            self.post_norm = tnn.LayerNorm(dim)

        def forward(self, x, mask=None):
            x = self.ff1(x) + x
            x = self.attn(x, mask=mask) + x
            x = self.conv(x) + x
            x = self.ff2(x) + x
            return self.post_norm(x)

    _module("conformer", ConformerBlock=ConformerBlock)


def import_reference(modname: str):
    """install stubs, put the reference on sys.path, import `modname`."""
    install_reference_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import importlib

    return importlib.import_module(modname)


def build_reference_matcha(hparams: dict, state_dict: dict):
    """Instantiate the REAL reference MatchaTTS from plain hparams + a flat
    numpy state dict (reference: matcha_tts.py:26-76 init contract).

    Used by tools/parity_report.py: given any reference Lightning checkpoint
    (Paige/Olivia/Zach when reachable, or an export of ours), this builds the
    reference-side model for output comparison.  The dims that tensors
    determine (n_vocab, n_feats, spk_emb_dim) are taken from the state dict
    itself; hparams supply the rest."""
    import types

    import numpy as np
    import torch

    m = import_reference("matcha.models.matcha_tts")
    enc_hp = hparams["encoder"]
    n_vocab = int(state_dict["encoder.emb.weight"].shape[0])
    n_feats = int(state_dict["encoder.proj_m.weight"].shape[0])
    if "spk_emb.weight" in state_dict:
        n_spks, spk_emb_dim = (int(s) for s in state_dict["spk_emb.weight"].shape)
    else:
        n_spks, spk_emb_dim = 1, int(hparams.get("spk_emb_dim") or 64)
    encoder = types.SimpleNamespace(
        encoder_type=enc_hp.get("encoder_type", "RoPE Encoder"),
        encoder_params=types.SimpleNamespace(**enc_hp["encoder_params"]),
        duration_predictor_params=types.SimpleNamespace(**enc_hp["duration_predictor_params"]),
    )
    model = m.MatchaTTS(
        n_vocab=n_vocab,
        n_spks=n_spks,
        spk_emb_dim=spk_emb_dim,
        n_feats=n_feats,
        encoder=encoder,
        decoder=dict(hparams["decoder"]),
        cfm=types.SimpleNamespace(**hparams["cfm"]),
        data_statistics=dict(hparams.get("data_statistics") or {"mel_mean": 0.0, "mel_std": 1.0}),
        out_size=hparams.get("out_size"),
        prior_loss=bool(hparams.get("prior_loss", True)),
        use_precomputed_durations=bool(hparams.get("use_precomputed_durations", False)),
    )
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in state_dict.items()}, strict=False
    )
    stats_only = {"mel_mean", "mel_std"}
    bad_missing = [k for k in missing if k not in stats_only]
    bad_unexpected = [k for k in unexpected if k not in stats_only]
    if bad_missing or bad_unexpected:
        raise ValueError(f"state dict mismatch: missing={bad_missing} unexpected={bad_unexpected}")
    model.eval()
    return model
