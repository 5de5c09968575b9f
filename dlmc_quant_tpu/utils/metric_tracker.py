"""Metric tracking (pandas), matching the reference's MetricTracker API.

ref: utils/util.py:49-76 — running total/count plus per-log-window
``cur_*`` columns, ``avg``, ``avg_batch``, ``reset_batch``.
"""

from __future__ import annotations

import pandas as pd


class MetricTracker:
    def __init__(self, *keys, writer=None):
        self.writer = writer
        self._data = pd.DataFrame(
            index=keys,
            columns=["total", "counts", "average",
                     "cur_total", "cur_counts", "cur_average"],
            dtype=float)
        self.reset()

    def reset(self):
        for col in self._data.columns:
            self._data[col] = 0.0

    def reset_batch(self):
        for col in ("cur_total", "cur_counts", "cur_average"):
            self._data[col] = 0.0

    def update(self, key, value, n: int = 1):
        value = float(value)
        if self.writer is not None:
            self.writer.add_scalar(key, value)
        self._data.loc[key, "total"] += value * n
        self._data.loc[key, "counts"] += n
        self._data.loc[key, "average"] = (
            self._data.loc[key, "total"] / self._data.loc[key, "counts"])
        self._data.loc[key, "cur_total"] += value * n
        self._data.loc[key, "cur_counts"] += n
        self._data.loc[key, "cur_average"] = (
            self._data.loc[key, "cur_total"]
            / self._data.loc[key, "cur_counts"])

    def avg(self, key) -> float:
        return float(self._data.loc[key, "average"])

    def avg_batch(self, key) -> float:
        return float(self._data.loc[key, "cur_average"])

    def result(self):
        return dict(self._data["average"])

    def result_batch(self):
        return dict(self._data["cur_average"])
