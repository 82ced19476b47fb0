"""case3 pygame window shell: gated import, console fallback, and the
GameWindow render path — driven against real pygame under the SDL dummy
video driver, plus a fake pygame module for call-granularity assertions
(reference: case_studies/case3_game/main.py:271-401)."""

import os
import sys
import types

import pytest

from emojivoice_tpu.apps import game_ui


def test_console_fallback_when_pygame_absent(monkeypatch):
    # simulate a hermetic image: import pygame → ImportError
    monkeypatch.setitem(sys.modules, "pygame", None)
    assert not game_ui.pygame_available()
    ui = game_ui.make_ui(window=True)
    assert isinstance(ui, game_ui.ConsoleUI)
    assert ui.pump()
    ui.typewriter("hello")
    ui.notice("notice")
    ui.clear_text()
    ui.close()
    assert not ui.pump()


def test_game_window_real_pygame_headless(monkeypatch):
    """Real pygame, SDL dummy driver (headless) — the actual window code."""
    pytest.importorskip("pygame")
    monkeypatch.setenv("SDL_VIDEODRIVER", "dummy")
    ui = game_ui.make_ui(window=True, char_delay=0.0)
    if isinstance(ui, game_ui.ConsoleUI):
        pytest.skip("pygame present but dummy video driver unavailable")
    try:
        assert ui.pump()
        ui.typewriter("hello there!")
        ui.notice("I didn't hear anything, try recording again...")
        ui.clear_text()
    finally:
        ui.close()
    assert not ui.pump()


def _fake_pygame():
    """Minimal pygame API surface used by GameWindow."""
    pg = types.ModuleType("pygame")
    calls = {"update": 0, "rects": [], "blits": [], "quit": 0}

    class Rect:
        def __init__(self, w, h):
            self.w, self.h = w, h
            self.topleft = (0, 0)

    class Surface:
        def __init__(self, w=10, h=10):
            self._w, self._h = w, h

        def get_rect(self):
            return Rect(self._w, self._h)

        def get_width(self):
            return self._w

        def fill(self, color):
            pass

        def blit(self, img, rect):
            calls["blits"].append(rect)

    class Font:
        def render(self, text, aa, color):
            calls.setdefault("rendered", []).append(text)
            return Surface(len(text), 10)

    class Clock:
        def tick(self, fps):
            calls.setdefault("ticks", []).append(fps)

    pg.init = lambda: None
    pg.quit = lambda: calls.__setitem__("quit", calls["quit"] + 1)
    pg.QUIT = 256
    pg.display = types.SimpleNamespace(
        set_mode=lambda size: Surface(*size),
        set_caption=lambda s: None,
        update=lambda: calls.__setitem__("update", calls["update"] + 1),
    )
    pg.draw = types.SimpleNamespace(
        rect=lambda screen, color, rect: calls["rects"].append(rect))
    pg.font = types.SimpleNamespace(SysFont=lambda name, size: Font())
    pg.event = types.SimpleNamespace(get=lambda: [])
    pg.time = types.SimpleNamespace(Clock=Clock)
    pg.image = types.SimpleNamespace(load=lambda p: Surface())
    return pg, calls


def test_game_window_typewriter_with_fake_pygame(monkeypatch):
    pg, calls = _fake_pygame()
    monkeypatch.setitem(sys.modules, "pygame", pg)
    monkeypatch.setenv("SDL_VIDEODRIVER", "dummy")  # pass the headless guard
    assert game_ui.pygame_available()

    ui = game_ui.make_ui(window=True, char_delay=0.0)
    assert isinstance(ui, game_ui.GameWindow)
    assert ui.pump()
    ui.typewriter("hi!")
    # one render per revealed char, black bar redrawn each frame
    assert calls["rendered"] == ["h", "hi", "hi!"]
    assert len(calls["rects"]) >= 3
    ui.notice("I didn't hear anything, try recording again...")
    assert calls["rendered"][-1].startswith("I didn't hear")
    ui.close()
    assert calls["quit"] == 1
    assert not ui.pump()


def test_game_loop_drives_ui(monkeypatch, tmp_path):
    """run_game renders each robot reply through the UI shell."""
    from emojivoice_tpu.apps.adapters import FileSink, ScriptedLLM
    from emojivoice_tpu.apps.demos import run_game
    from emojivoice_tpu.config import get_preset
    from emojivoice_tpu.inference.pipeline import SynthesisPipeline

    class FakeASR:
        def __init__(self):
            self.lines = iter(["once upon a time", "", "end session"])

        def transcribe(self, _):
            return next(self.lines)

    class RecordingUI(game_ui.ConsoleUI):
        def __init__(self):
            super().__init__()
            self.typed, self.notices = [], []

        def typewriter(self, text):
            self.typed.append(text)

        def notice(self, text):
            self.notices.append(text)

    pipe = SynthesisPipeline.from_random(get_preset("tiny"), cleaners=("basic_cleaners",))
    ui = RecordingUI()
    n = run_game(pipe, steps=2, llm=ScriptedLLM(), asr=FakeASR(),
                 sink=FileSink(str(tmp_path)), ui=ui)
    assert n == 1
    assert len(ui.typed) == 1
    assert len(ui.notices) == 1  # the empty transcription
    assert ui.closed


def test_game_sequencing_matches_reference(tmp_path):
    """Reference flow (case3_game/main.py:324-368): the reply is TYPED
    first, audio plays with the text still on screen, and the bar clears
    only after playback.  Also: the loop must not re-print text a console
    UI already echoed (echoes_text)."""
    from emojivoice_tpu.apps.adapters import FileSink, ScriptedLLM
    from emojivoice_tpu.apps.demos import run_game
    from emojivoice_tpu.config import get_preset
    from emojivoice_tpu.inference.pipeline import SynthesisPipeline

    events = []

    class FakeASR:
        def __init__(self):
            self.lines = iter(["a story begins", "end session"])

        def transcribe(self, _):
            return next(self.lines)

    class OrderedUI(game_ui.ConsoleUI):
        def typewriter(self, text):
            events.append("type")

        def clear_text(self):
            events.append("clear")

    class OrderedSink(FileSink):
        def play(self, wav, sr):
            events.append("play")
            return super().play(wav, sr)

    pipe = SynthesisPipeline.from_random(get_preset("tiny"), cleaners=("basic_cleaners",))
    n = run_game(pipe, steps=2, llm=ScriptedLLM(), asr=FakeASR(),
                 sink=OrderedSink(str(tmp_path)), ui=OrderedUI())
    assert n == 1
    assert events == ["type", "play", "clear"]
    assert game_ui.ConsoleUI.echoes_text and not game_ui.GameWindow.echoes_text
