"""Parity against the REAL reference U-Net decoder and CFM chain.

Round-2 verdict: the CFM decoder/U-Net — the single biggest compute block —
was pinned only against a torch oracle written in this repo, so a shared
misreading of the decoder spec would pass every parity test.  This closes
that gap: the actual `matcha/models/components/decoder.py:200-443`,
`transformer.py:17-316`, and `flow_matching.py:12-118` import and execute via
tests/reference_harness.py (which supplies the small diffusers-0.25.0 slice
they need as executable public-math stand-ins), random-init at FLAGSHIP dims
(n_feats=80, spk_emb 64, channels (256,256), 2 heads × head_dim 64,
snakebeta FFN), and our flax Decoder/CFM — fed through the production
converter — must agree to MAE < 1e-5.

Covered reference behaviors now locked against code we did not write:
- down/mid/up wiring, skip concat order, stride-2 mask halving
- time conditioning (sinusoidal scale 1000 → SiLU MLP → in-resnet add)
- the additive-0/1 float attention mask quirk
- snakebeta FFN with log-scale alpha/beta
- Euler solve over linspace t (power-of-two step counts keep the
  reference's accumulated-t exactly representable)
- the unmasked-CFM-loss-target quirk (flow_matching.py:115)
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_harness import import_reference

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref_dec():
    return import_reference("matcha.models.components.decoder")


@pytest.fixture(scope="module")
def ref_fm():
    return import_reference("matcha.models.components.flow_matching")


def _flagship():
    from emojivoice_tpu.config import get_preset

    return get_preset("emoji_multi").model


def _decoder_kwargs(cfg):
    return dict(
        channels=tuple(cfg.decoder.channels),
        dropout=cfg.decoder.dropout,
        attention_head_dim=cfg.decoder.attention_head_dim,
        n_blocks=cfg.decoder.n_blocks,
        num_mid_blocks=cfg.decoder.num_mid_blocks,
        num_heads=cfg.decoder.num_heads,
        act_fn="snakebeta",
    )


def _convert(ref_module, cfg):
    """Reference state_dict → our flax estimator params via the production
    converter (checkpoint-exact names, layout transposes happen there)."""
    from emojivoice_tpu.io.torch_ckpt import _convert_estimator

    sd = {f"decoder.estimator.{k}": v.numpy() for k, v in ref_module.state_dict().items()}
    out = {}
    _convert_estimator(sd, cfg, out)
    return out["decoder"]["estimator"]


def _inputs(cfg, b=2, t_y=32, lengths=(32, 24), seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(b, cfg.n_feats, t_y)).astype(np.float32)
    mu = rng.normal(size=(b, cfg.n_feats, t_y)).astype(np.float32)
    mask = np.zeros((b, 1, t_y), np.float32)
    for i, l in enumerate(lengths):
        mask[i, :, :l] = 1.0
    spks = rng.normal(size=(b, cfg.spk_emb_dim)).astype(np.float32)
    return x, mu, mask, spks


def test_real_reference_decoder_flagship_parity(ref_dec):
    import jax.numpy as jnp

    from emojivoice_tpu.models.decoder import Decoder

    cfg = _flagship()
    in_ch = 2 * cfg.n_feats + cfg.spk_emb_dim  # x ++ mu ++ spks (flow_matching.py:130)
    torch.manual_seed(11)
    ref = ref_dec.Decoder(in_channels=in_ch, out_channels=cfg.n_feats, **_decoder_kwargs(cfg))
    ref.eval()

    x, mu, mask, spks = _inputs(cfg)
    t = np.array([0.35, 0.75], np.float32)
    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(x), torch.from_numpy(mask), torch.from_numpy(mu),
            torch.from_numpy(t), torch.from_numpy(spks),
        ).numpy()

    params = _convert(ref, cfg)
    ours = Decoder(cfg=cfg.decoder, in_channels=in_ch, out_channels=cfg.n_feats)
    out_j = ours.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(mask.transpose(0, 2, 1)),
        jnp.asarray(mu.transpose(0, 2, 1)), jnp.asarray(t), jnp.asarray(spks),
    )

    mae = float(np.abs(np.asarray(out_j) - out_ref.transpose(0, 2, 1)).mean())
    assert mae < 1e-5, mae
    # both sides fully masked beyond each row's length
    assert np.abs(np.asarray(out_j)[1, 24:]).max() == 0.0
    assert np.abs(out_ref[1, :, 24:]).max() == 0.0


def test_real_reference_cfm_solve_euler_parity(ref_dec, ref_fm):
    """Full inference-time CFM chain: injected noise, 4 Euler steps (dt=0.25
    is exactly representable, so the reference's accumulated t matches our
    step·dt bit-for-bit) — reference flow_matching.py:55-85."""
    import jax.numpy as jnp

    from emojivoice_tpu.models.cfm import CFM

    cfg = _flagship()
    torch.manual_seed(13)
    ref = ref_fm.CFM(
        in_channels=2 * cfg.n_feats, out_channel=cfg.n_feats,
        cfm_params=types.SimpleNamespace(solver="euler", sigma_min=cfg.cfm.sigma_min),
        decoder_params=_decoder_kwargs(cfg), n_spks=cfg.n_spks, spk_emb_dim=cfg.spk_emb_dim,
    )
    ref.eval()

    _, mu, mask, spks = _inputs(cfg, seed=1)
    rng = np.random.default_rng(2)
    z = (rng.normal(size=mu.shape) * 0.667).astype(np.float32) * mask  # pre-masked, fed to both
    n_steps = 4
    with torch.no_grad():
        t_span = torch.linspace(0, 1, n_steps + 1)
        out_ref = ref.solve_euler(
            torch.from_numpy(z.copy()), t_span, torch.from_numpy(mu),
            torch.from_numpy(mask), torch.from_numpy(spks), None,
        ).numpy()

    params = _convert(ref.estimator, cfg)
    ours = CFM(cfg=cfg.cfm, decoder=cfg.decoder, n_feats=cfg.n_feats,
               n_spks=cfg.n_spks, spk_emb_dim=cfg.spk_emb_dim)
    out_j = ours.apply(
        {"params": {"estimator": params}},
        jnp.asarray(z.transpose(0, 2, 1)), jnp.asarray(mu.transpose(0, 2, 1)),
        jnp.asarray(mask.transpose(0, 2, 1)), n_steps, jnp.asarray(spks),
        method=CFM.solve_euler,
    )

    mae = float(np.abs(np.asarray(out_j) - out_ref.transpose(0, 2, 1)).mean())
    assert mae < 1e-5, mae


def test_real_reference_cfm_loss_parity(ref_dec, ref_fm, monkeypatch):
    """Training-side CFM loss vs the real reference compute_loss
    (flow_matching.py:87-118), including the unmasked-target quirk: the
    estimator output is masked but the target u is not, so padded frames add
    a parameter-independent term.  The reference draws t and z from ambient
    torch RNG; we pin them by patching the draws to fixed tensors."""
    import jax.numpy as jnp

    from emojivoice_tpu.models.cfm import CFM

    cfg = _flagship()
    torch.manual_seed(17)
    ref = ref_fm.CFM(
        in_channels=2 * cfg.n_feats, out_channel=cfg.n_feats,
        cfm_params=types.SimpleNamespace(solver="euler", sigma_min=cfg.cfm.sigma_min),
        decoder_params=_decoder_kwargs(cfg), n_spks=cfg.n_spks, spk_emb_dim=cfg.spk_emb_dim,
    )
    ref.eval()

    x1, mu, mask, spks = _inputs(cfg, seed=3)
    rng = np.random.default_rng(4)
    t_fix = rng.uniform(size=(2, 1, 1)).astype(np.float32)
    z_fix = rng.normal(size=x1.shape).astype(np.float32)
    monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.from_numpy(t_fix.copy()))
    monkeypatch.setattr(torch, "randn_like", lambda ref_t: torch.from_numpy(z_fix.copy()))
    with torch.no_grad():
        loss_ref, y_ref = ref.compute_loss(
            torch.from_numpy(x1), torch.from_numpy(mask), torch.from_numpy(mu),
            torch.from_numpy(spks),
        )

    params = _convert(ref.estimator, cfg)
    ours = CFM(cfg=cfg.cfm, decoder=cfg.decoder, n_feats=cfg.n_feats,
               n_spks=cfg.n_spks, spk_emb_dim=cfg.spk_emb_dim)
    loss_j, y_j = ours.apply(
        {"params": {"estimator": params}},
        jnp.asarray(x1.transpose(0, 2, 1)), jnp.asarray(mask.transpose(0, 2, 1)),
        jnp.asarray(mu.transpose(0, 2, 1)), jnp.asarray(spks),
        t=jnp.asarray(t_fix), z=jnp.asarray(z_fix.transpose(0, 2, 1)),
        deterministic=True, method=CFM.compute_loss,
    )

    np.testing.assert_allclose(float(loss_j), float(loss_ref), rtol=2e-5)
    mae = float(np.abs(np.asarray(y_j) - y_ref.numpy().transpose(0, 2, 1)).mean())
    assert mae < 1e-6, mae
