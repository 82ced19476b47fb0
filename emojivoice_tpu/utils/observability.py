"""Profiling, debugging, and logging utilities.

Equivalents of the reference's aux subsystems (SURVEY.md §5):

* Lightning profiler configs (configs/debug/profiler.yaml) → ``trace()``
  context manager around ``jax.profiler`` (XPlane traces viewable in
  TensorBoard / xprof).
* ``detect_anomaly: true`` (configs/debug/default.yaml:33) →
  ``enable_nan_checks()`` via jax_debug_nans.
* ``L.seed_everything`` (train.py:46-47) → ``seed_everything()``.
* rank-zero logging (utils/pylogger.py) → ``is_main_process`` /
  ``main_process_only`` on ``jax.process_index()``.
* TensorBoard scalar/image logging (baselightningmodule.py:177-216) →
  ``TensorBoardWriter`` (tf.summary, gated on tensorflow; jsonl always).
"""

from __future__ import annotations

import contextlib
import functools
import json
import logging
import random as _random
import time
from pathlib import Path
from typing import Optional

import numpy as np


def seed_everything(seed: int):
    """Seed python/numpy and return a jax PRNGKey."""
    import jax

    _random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def enable_nan_checks(enable: bool = True):
    """Fail fast on NaN/Inf in any jitted computation (re-runs the offending
    op un-jitted for a precise traceback)."""
    import jax

    jax.config.update("jax_debug_nans", enable)


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def main_process_only(fn):
    """Run fn only on host 0 (the reference's rank_zero_only,
    utils/pylogger.py:6-21)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return fn(*args, **kwargs)
        return None

    return wrapper


def get_logger(name: str) -> logging.Logger:
    log = logging.getLogger(name)
    if not log.handlers and is_main_process():
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("[%(asctime)s][%(name)s][%(levelname)s] %(message)s"))
        log.addHandler(handler)
        log.setLevel(logging.INFO)
    return log


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace", enabled: bool = True):
    """Capture a jax.profiler trace around a block; open with TensorBoard's
    profile plugin or xprof."""
    import jax

    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Blocking wall-clock timer for compiled steps (RTF-style accounting)."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, result_to_block=None):
        import jax

        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self.times.append(time.perf_counter() - t0)

    def summary(self) -> dict:
        arr = np.asarray(self.times)
        if arr.size == 0:
            return {}
        return {"mean_s": float(arr.mean()), "median_s": float(np.median(arr)),
                "p90_s": float(np.percentile(arr, 90)), "n": int(arr.size)}


class TensorBoardWriter:
    """Scalar/image logging: tf.summary when tensorflow is available, and a
    jsonl sidecar always (hermetic environments, simple plotting)."""

    def __init__(self, log_dir: str):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.jsonl = self.log_dir / "scalars.jsonl"
        self._tf_writer = None
        try:
            import tensorflow as tf  # noqa: PLC0415

            self._tf = tf
            self._tf_writer = tf.summary.create_file_writer(str(self.log_dir))
        except Exception:  # noqa: BLE001
            self._tf = None

    def scalar(self, tag: str, value: float, step: int):
        with open(self.jsonl, "a") as f:
            f.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        if self._tf_writer is not None:
            with self._tf_writer.as_default():
                self._tf.summary.scalar(tag, float(value), step=step)

    def image(self, tag: str, image_hwc: np.ndarray, step: int):
        """image_hwc: (H, W) or (H, W, C) float array."""
        img = np.asarray(image_hwc)
        if img.size == 0:
            # a degenerate render (e.g. zero predicted frames early in
            # training) must not crash the training loop at a val step
            return
        if img.ndim == 2:
            img = img[..., None]
        path = self.log_dir / f"{tag.replace('/', '_')}_{step}.png"
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(10, 3))
            ax.imshow(img[..., 0], aspect="auto", origin="lower", interpolation="none")
            fig.tight_layout()
            fig.savefig(path)
            plt.close(fig)
        except Exception:  # noqa: BLE001
            pass
        if self._tf_writer is not None:
            norm = (img - img.min()) / (np.ptp(img) + 1e-9)
            with self._tf_writer.as_default():
                self._tf.summary.image(tag, norm[None].astype(np.float32), step=step)

    def flush(self):
        if self._tf_writer is not None:
            self._tf_writer.flush()

    def close(self):
        """Flush and release the tf writer (the reference's task_wrapper
        always-close-loggers guarantee, utils/utils.py:94-100)."""
        if self._tf_writer is not None:
            self._tf_writer.flush()
            self._tf_writer.close()
            self._tf_writer = None


class CSVLogger:
    """Lightning-CSVLogger-shaped metrics file (reference:
    configs/logger/csv.yaml): one wide ``metrics.csv`` with a ``step``
    column plus one column per metric tag, a row per logged step.

    Rows are appended incrementally on flush (no unbounded buffer, no
    O(steps²) rewrites over long runs); the file is rewritten only when a
    late-appearing tag (val/*, probe/*) widens the header — rare, since the
    tag set stabilizes within the first few steps.  Metrics logged for a
    step *after* that step's row already hit disk land on an additional row
    for the same step (readers group by the step column, like Lightning's).
    """

    def __init__(self, log_dir: str):
        self.path = Path(log_dir) / "metrics.csv"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._pending: dict[int, dict] = {}
        self._tags: list[str] = []
        self._header_tags: list[str] = []  # tags in the on-disk header

    def scalar(self, tag: str, value: float, step: int):
        if tag not in self._tags:
            self._tags.append(tag)
        self._pending.setdefault(int(step), {})[tag] = float(value)

    def image(self, tag: str, image_hwc, step: int):
        pass  # CSV carries scalars only (Lightning's does the same)

    def flush(self):
        import csv

        if not self._pending and self._tags == self._header_tags:
            return
        fields = ["step"] + self._tags
        if self._tags != self._header_tags:
            # header changed: (re)write it, carrying already-flushed rows over
            old_rows = []
            if self._header_tags and self.path.exists():
                with open(self.path, newline="") as f:
                    old_rows = list(csv.DictReader(f))
            with open(self.path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=fields)
                w.writeheader()
                for row in old_rows:
                    w.writerow({k: v for k, v in row.items() if v not in (None, "")})
            self._header_tags = list(self._tags)
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            for step in sorted(self._pending):
                w.writerow({"step": step, **self._pending[step]})
        self._pending.clear()

    def close(self):
        self.flush()


class WandbLogger:
    """Weights & Biases adapter (reference: configs/logger/wandb.yaml),
    gated on the ``wandb`` package — absent in hermetic environments, in
    which case construction raises ImportError (the factory below skips it
    with a warning instead of crashing the run)."""

    @staticmethod
    def available() -> bool:
        try:
            import wandb  # noqa: F401, PLC0415

            return True
        except ImportError:
            return False

    def __init__(self, log_dir: str, project: str = "emojivoice-tpu",
                 name: Optional[str] = None, **init_kw):
        import wandb  # raises ImportError when absent — factory gates

        self._wandb = wandb
        self._run = wandb.init(project=project, name=name, dir=log_dir,
                               **init_kw)

    def scalar(self, tag: str, value: float, step: int):
        self._run.log({tag: float(value)}, step=int(step))

    def image(self, tag: str, image_hwc, step: int):
        img = np.asarray(image_hwc)
        if img.size == 0:
            return
        self._run.log({tag: self._wandb.Image(img)}, step=int(step))

    def flush(self):
        pass  # wandb streams asynchronously

    def close(self):
        self._run.finish()


class MultiLogger:
    """Fan-out over several scalar/image writers (the reference's
    ``logger: many_loggers`` composition, configs/logger/many_loggers.yaml)."""

    def __init__(self, writers):
        self.writers = list(writers)

    def scalar(self, tag, value, step):
        for w in self.writers:
            w.scalar(tag, value, step)

    def image(self, tag, image_hwc, step):
        for w in self.writers:
            w.image(tag, image_hwc, step)

    def flush(self):
        for w in self.writers:
            w.flush()

    def close(self):
        for w in self.writers:
            w.close()


LOGGER_BACKENDS = ("tensorboard", "csv", "wandb")


def make_logger(kinds: str, log_dir: str):
    """Build a (possibly composite) metrics writer from a comma list —
    the analog of picking a configs/logger/*.yaml.  Unavailable backends
    (wandb without the package) are skipped with a stderr warning rather
    than failing the run."""
    import sys

    writers = []
    for kind in [k.strip().lower() for k in kinds.split(",") if k.strip()]:
        if kind in ("tensorboard", "tb"):
            writers.append(TensorBoardWriter(log_dir))
        elif kind == "csv":
            writers.append(CSVLogger(log_dir))
        elif kind == "wandb":
            if WandbLogger.available():
                writers.append(WandbLogger(log_dir))
            else:
                print("[observability] wandb requested but not installed — "
                      "skipping that backend", file=sys.stderr)
        else:
            raise ValueError(
                f"unknown logger backend {kind!r}; available: {LOGGER_BACKENDS}")
    if not writers:  # e.g. "wandb" alone in a hermetic image
        writers.append(TensorBoardWriter(log_dir))
    return writers[0] if len(writers) == 1 else MultiLogger(writers)
