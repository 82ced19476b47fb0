"""Console entry points exist and --help works without touching jax."""

import pytest


@pytest.mark.parametrize(
    "mod,main_name",
    [
        ("emojivoice_tpu.inference.cli", "main"),
        ("emojivoice_tpu.training.train", "main"),
        ("emojivoice_tpu.training.get_durations", "main"),
        ("emojivoice_tpu.data.stats", "main"),
        ("emojivoice_tpu.apps.feel_me", "main"),
        ("emojivoice_tpu.apps.record_audio", "main"),
        ("emojivoice_tpu.apps.demos", "main"),
        ("emojivoice_tpu.apps.webapp", "main"),
        ("emojivoice_tpu.apps.pepper", "main"),
    ],
)
def test_help_exits_zero(mod, main_name):
    import importlib

    m = importlib.import_module(mod)
    with pytest.raises(SystemExit) as exc:
        getattr(m, main_name)(["--help"])
    assert exc.value.code == 0


def test_pyproject_scripts_resolve():
    import importlib
    import tomllib

    with open("pyproject.toml", "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    assert len(scripts) >= 7
    for target in scripts.values():
        mod, fn = target.split(":")
        assert callable(getattr(importlib.import_module(mod), fn)), target


def test_feel_me_main_text_mode(tmp_path, monkeypatch):
    """feel_me.main wires a pipeline + adapters and exits on 'end session'."""
    from emojivoice_tpu.apps import feel_me as fm
    from emojivoice_tpu.apps.adapters import FileSink, ScriptedLLM
    from emojivoice_tpu.inference.pipeline import SynthesisPipeline

    from tests.test_pipeline import tiny_root

    pipe = SynthesisPipeline.from_random(tiny_root(), cleaners=("basic_cleaners",),
                                         mel_buckets=(64, 128), text_buckets=(64,))
    monkeypatch.setattr(SynthesisPipeline, "from_random", classmethod(lambda cls, **kw: pipe))

    class OneShotASR:
        def __init__(self):
            self.lines = iter(["tell me something", "end session"])

        def transcribe(self, _):
            return next(self.lines)

    monkeypatch.setattr(fm.ad, "default_asr", OneShotASR)
    monkeypatch.setattr(fm.ad, "default_llm", lambda: ScriptedLLM(["Here is a thing! 😁"]))
    monkeypatch.setattr(fm.ad, "default_audio_sink", lambda out_dir=".": FileSink(str(tmp_path)))

    rc = fm.main(["--random_init", "--steps", "2", "--out_dir", str(tmp_path)])
    assert rc == 0
    assert len(list(tmp_path.glob("*.wav"))) == 1


def test_bench_wait_for_backend_probe_paths():
    """bench._wait_for_backend probes in a killable subprocess: a tunnel-down
    jax.devices() HANGS (doesn't raise), so an in-process attempt would block
    the benchmark forever with no retry."""
    import sys
    import time

    import pytest

    import bench

    # healthy: probe exits 0 → in-process init (CPU under pytest) → returns
    t0 = time.monotonic()
    bench._wait_for_backend(max_wait_s=30, probe_cmd=[sys.executable, "-c", "pass"])
    assert time.monotonic() - t0 < 30

    # hung probe: killed at the deadline, classified, retried, bounded raise
    with pytest.raises(RuntimeError, match="hung"):
        bench._wait_for_backend(
            max_wait_s=0.0,
            probe_cmd=[sys.executable, "-c", "import time; time.sleep(60)"],
            probe_timeout_s=1.0,
        )

    # failing probe: nonzero rc is reported with its stderr tail
    with pytest.raises(RuntimeError, match="rc=3"):
        bench._wait_for_backend(
            max_wait_s=0.0,
            probe_cmd=[sys.executable, "-c", "import sys; print('dead', file=sys.stderr); sys.exit(3)"],
            probe_timeout_s=10.0,
        )
