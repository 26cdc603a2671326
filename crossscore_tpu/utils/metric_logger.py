"""Bounded append-only metric caches computed lazily.

Parity with reference ``utils/evaluation/metric_logger.py:7-55`` (numpy/jnp
instead of torch). Values are pulled to host on update (cheap scalars/maps at
logging cadence only).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from crossscore_tpu.ops.metrics import correlation


class MetricLogger:
    def __init__(self, max_length: Optional[int] = None):
        self.storage: list = []
        self.max_length = max_length

    def update(self, x):
        if self.max_length is not None and len(self) >= self.max_length:
            self.reset()
        self.storage.append(np.asarray(x))

    def reset(self):
        self.storage.clear()

    def __len__(self):
        return len(self.storage)


class MetricLoggerScalar(MetricLogger):
    def compute(self, aggregation_fn=np.mean):
        return float(aggregation_fn(np.stack(self.storage)))


class MetricLoggerHistogram(MetricLogger):
    def compute(self, bins: int = 10, range=None):
        flat = np.concatenate([np.asarray(s).reshape(-1) for s in self.storage])
        return np.histogram(flat, bins=bins, range=range)


class MetricLoggerCorrelation(MetricLoggerScalar):
    def update(self, a, b):  # type: ignore[override]
        super().update(float(correlation(np.asarray(a), np.asarray(b))))


class MetricLoggerImg(MetricLogger):
    def update(self, x):
        if self.max_length is not None and len(self) >= self.max_length:
            self.reset()
        self.storage.append(x)  # figures are kept as-is

    def compute(self):
        return self.storage
