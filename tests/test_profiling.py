"""Observability utilities: timers, metric writer, distributed no-op."""

import json

from asr_using_robust_nn_tpu.parallel.mesh import maybe_init_distributed
from asr_using_robust_nn_tpu.utils.profiling import MetricWriter, StepTimer


class TestStepTimer:
    def test_counts(self):
        t = StepTimer()
        for _ in range(5):
            t.tick(64)
        s = t.summary()
        assert s["steps"] == 5
        assert s["examples"] == 320
        assert s["utterances_per_sec"] > 0


class TestMetricWriter:
    def test_jsonl_events(self, tmp_path):
        w = MetricWriter(tmp_path, use_tensorboard=False)
        w.scalars({"loss": 1.5, "acc": 0.5}, step=0)
        w.scalar("loss", 1.2, step=1)
        w.close()
        lines = [json.loads(l) for l in
                 (tmp_path / "metrics.jsonl").read_text().splitlines()]
        assert len(lines) == 3
        assert lines[-1]["tag"] == "loss"
        assert lines[-1]["step"] == 1


class TestDistributed:
    def test_noop_without_coordinator(self, monkeypatch):
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert maybe_init_distributed() is False
