"""Tracing, step timing, and metric logging.

The reference's observability is a Keras TensorBoard callback + prints
(`Voice digit recogniton/train_google_dataset.py:43-46`, SURVEY.md §5). TPU
equivalents here:

  trace(dir)        context manager around jax.profiler (XLA/TPU timeline,
                    viewable in TensorBoard or Perfetto)
  StepTimer         wall-clock steps/sec + utterances/sec/chip counters (the
                    BASELINE.json headline unit)
  MetricWriter      scalar logger: always writes JSONL events; mirrors to
                    TensorBoard via tf.summary when TF is importable
"""

from __future__ import annotations

import contextlib
import json
import os
import time

__all__ = ["trace", "StepTimer", "MetricWriter"]


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope; open the dir in TensorBoard's profile tab."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput accounting: call tick(n_examples) once per step."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()
        self.steps = 0
        self.examples = 0

    def tick(self, n_examples: int):
        self.steps += 1
        self.examples += n_examples

    @property
    def seconds(self) -> float:
        return time.perf_counter() - self.t0

    @property
    def steps_per_sec(self) -> float:
        return self.steps / max(self.seconds, 1e-9)

    @property
    def examples_per_sec(self) -> float:
        return self.examples / max(self.seconds, 1e-9)

    def summary(self) -> dict:
        return {
            "steps": self.steps,
            "examples": self.examples,
            "seconds": self.seconds,
            "steps_per_sec": self.steps_per_sec,
            "utterances_per_sec": self.examples_per_sec,
        }


class MetricWriter:
    """Scalar metric logger: JSONL always; TensorBoard when available."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = str(log_dir)
        os.makedirs(self.log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf  # noqa: F401

                self._tb = tf.summary.create_file_writer(self.log_dir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step),
                        "time": time.time()}) + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                tf.summary.scalar(tag, value, step=step)

    def scalars(self, values: dict, step: int):
        for tag, v in values.items():
            self.scalar(tag, v, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
