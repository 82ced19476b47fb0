"""tools/parity_report.py: the one-command checkpoint parity harness.

Validated end-to-end with what this image can produce: a FLAGSHIP-dims
(emoji_multi) export of our params in the reference checkpoint format plus
a reference-format HiFi-GAN dump.  The tool converts the ckpt, builds the
REAL reference MatchaTTS (tests/reference_harness), replays the same noise
through both sides, and must report pass with mel-MAE far under the
BASELINE 1e-2 budget.  The moment real Paige/Olivia/Zach weights are
reachable, the same command verifies them:

    python tools/parity_report.py --matcha_ckpt paige.ckpt --vocoder hifigan_univ_v1
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

TOOLS = Path(__file__).resolve().parent.parent / "tools"


@pytest.fixture(scope="module")
def exported_ckpts(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from emojivoice_tpu.config import HiFiGANConfig, get_preset
    from emojivoice_tpu.io.torch_ckpt import export_matcha_hparams, export_matcha_state_dict
    from emojivoice_tpu.models import MatchaTTS

    tmp = tmp_path_factory.mktemp("parity")
    cfg = get_preset("emoji_multi").model
    model = MatchaTTS(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, jnp.ones((1, 8), jnp.int32),
                        jnp.array([8]), jnp.zeros((1, 16, cfg.n_feats)), jnp.array([16]),
                        jnp.array([0]), rng=rng)
    sd = export_matcha_state_dict(jax.device_get(params), cfg)
    ck = tmp / "flagship.ckpt"
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
                "hyper_parameters": export_matcha_hparams(cfg)}, ck)

    sys.path.insert(0, "/root/reference/Matcha-TTS")
    try:
        from matcha.hifigan.env import AttrDict
        from matcha.hifigan.models import Generator as RefGenerator
    finally:
        sys.path.pop(0)
    vcfg = HiFiGANConfig()
    h = AttrDict(dict(
        resblock=vcfg.resblock, upsample_rates=list(vcfg.upsample_rates),
        upsample_kernel_sizes=list(vcfg.upsample_kernel_sizes),
        upsample_initial_channel=vcfg.upsample_initial_channel,
        resblock_kernel_sizes=list(vcfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in vcfg.resblock_dilation_sizes],
    ))
    torch.manual_seed(5)
    gen = RefGenerator(h)
    vk = tmp / "hifigan.ckpt"
    # state_dict() directly: real dumps carry OrderedDict _metadata state,
    # which the torch-free reader must tolerate (io/torch_pickle._ODict)
    torch.save({"generator": gen.state_dict()}, vk)
    return ck, vk, tmp


def test_parity_report_flagship_pass(exported_ckpts):
    sys.path.insert(0, str(TOOLS))
    try:
        import parity_report
    finally:
        sys.path.pop(0)

    ck, vk, tmp = exported_ckpts
    texts = tmp / "texts.txt"
    texts.write_text("Hello there, how are you?|3\nA second short line.|7\n")
    out = tmp / "report.json"
    rc = parity_report.main([
        "--matcha_ckpt", str(ck), "--vocoder", str(vk), "--texts", str(texts),
        "--steps", "2", "--output", str(out),
    ])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["pass"] is True
    assert report["durations_match"] is True
    assert report["mel_mae_max"] < 1e-4  # far inside the 1e-2 budget
    assert report["wav_mae_max"] < 1e-5
    assert report["n_texts"] == 2


def test_parity_report_detects_divergence(exported_ckpts, monkeypatch):
    """The report must FAIL when our conversion genuinely diverges from the
    reference — simulated by perturbing only OUR side's converted params
    (a stand-in for any converter/model bug), leaving the reference side on
    the true weights."""
    sys.path.insert(0, str(TOOLS))
    try:
        import parity_report
    finally:
        sys.path.pop(0)

    import emojivoice_tpu.io.torch_ckpt as tc

    real_convert = tc.convert_matcha_state_dict

    def perturbed_convert(sd, cfg=None):
        params = real_convert(sd, cfg)
        est = params["params"]["decoder"]["estimator"]
        est["final_proj"]["bias"] = np.asarray(est["final_proj"]["bias"]) + 0.1
        return params

    monkeypatch.setattr(tc, "convert_matcha_state_dict", perturbed_convert)

    ck, _vk, tmp = exported_ckpts
    texts = tmp / "one.txt"
    texts.write_text("Hello there.\n")
    rc = parity_report.main(["--matcha_ckpt", str(ck), "--texts", str(texts), "--steps", "2"])
    assert rc == 2  # mel diverges → verdict fails → exit 2
