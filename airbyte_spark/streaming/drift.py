"""Ingest drift detection — per-batch column profiles and an
exponentially-weighted baseline with z-score alerts.

A 100 TB ingest loop cannot afford a second scan per trigger to monitor
data quality, so the profile is a list of AGGREGATE EXPRESSIONS meant for
``df.observe`` (the same zero-extra-pass channel the O8 trace/estimate
operator uses): Spark folds them into the batch's existing pass and hands
back one row. The detector side is driver-only arithmetic on that row —
an exponentially-weighted mean/variance per watched metric (per-column
batch mean and null rate), flagging batches whose metric sits more than
``z`` deviations from the running baseline after a warmup. State is a few
floats per column, JSON-serializable so it can be persisted alongside the
stream's checkpoint and survive restarts.

The reference has no equivalent (its per-sync stats count records/bytes,
airbyte-cdk MessageTracker); this is the lake-side ingest-quality monitor
a self-hosted 10^10-event pipeline needs: schema-valid rows whose VALUES
went wrong (a producer starts emitting nulls, a unit change shifts a
numeric distribution) surface at the trigger that introduced them.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from typing import Mapping, Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: observe() metric suffixes
_MEAN = "__mean"
_NULLS = "__nulls"
_COUNT = "__drift_n"


def profile_cols(cols: Sequence[str]) -> list[Column]:
    """Aggregate expressions profiling ``cols`` — pass to ``df.observe``
    (streaming: one Observation per micro-batch; batch: one scan shared
    with the batch's own action). Numeric casts make the profile total:
    non-numeric columns contribute null-rate only (mean stays None)."""
    out = [F.count(F.lit(1)).alias(_COUNT)]
    for c in cols:
        # try_cast: non-numeric columns yield NULL means instead of an
        # ANSI CAST_INVALID_INPUT abort of the whole batch
        out.append(F.avg(F.col(c).try_cast("double")).alias(f"{c}{_MEAN}"))
        out.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}{_NULLS}")
        )
    return out


@dataclass
class _EwStat:
    """Exponentially-weighted mean/variance of one metric stream."""

    count: int = 0
    mean: float = 0.0
    var: float = 0.0

    def update(self, x: float, alpha: float) -> tuple[float, float, float]:
        """Returns (prev_mean, prev_var, prev_count) then folds x in."""
        prev = (self.mean, self.var, self.count)
        if self.count == 0:
            self.mean = x
        else:
            diff = x - self.mean
            incr = alpha * diff
            self.mean += incr
            self.var = (1.0 - alpha) * (self.var + diff * incr)
        self.count += 1
        return prev


@dataclass
class DriftDetector:
    """Driver-side drift monitor over ``profile_cols`` rows.

    ``observe_batch(row)`` folds one batch profile into the baseline and
    returns the alerts the batch raised BEFORE it was folded in (so a
    drifted batch cannot vouch for itself). A metric alerts when the
    baseline has seen >= ``warmup`` batches and
    |x - ew_mean| > z * sqrt(ew_var) + eps; ``eps`` absorbs exact-zero
    variance on constant streams (any change on a so-far-constant metric
    alerts, which is the desired sensitivity).
    """

    cols: Sequence[str]
    alpha: float = 0.1
    z: float = 4.0
    warmup: int = 5
    eps: float = 1e-9
    _stats: dict = field(default_factory=dict)

    def _stat(self, key: str) -> _EwStat:
        if key not in self._stats:
            self._stats[key] = _EwStat()
        return self._stats[key]

    def observe_batch(self, row: Mapping) -> list[dict]:
        n = row.get(_COUNT) or 0
        alerts: list[dict] = []
        if not n:
            return alerts  # empty trigger: no evidence either way
        for c in self.cols:
            metrics = {"null_rate": (row.get(f"{c}{_NULLS}") or 0) / n}
            mean = row.get(f"{c}{_MEAN}")
            if mean is not None:
                metrics["mean"] = float(mean)
            for name, x in metrics.items():
                stat = self._stat(f"{c}.{name}")
                prev_mean, prev_var, prev_count = stat.update(x, self.alpha)
                if prev_count < self.warmup:
                    continue
                bound = self.z * math.sqrt(max(prev_var, 0.0)) + self.eps
                if abs(x - prev_mean) > bound:
                    alerts.append(
                        {
                            "column": c,
                            "metric": name,
                            "value": x,
                            "baseline_mean": prev_mean,
                            "baseline_std": math.sqrt(max(prev_var, 0.0)),
                            "batches_seen": prev_count,
                        }
                    )
        return alerts

    # ------------------------------------------------------ persistence

    def to_json(self) -> str:
        return json.dumps(
            {
                "cols": list(self.cols),
                "alpha": self.alpha,
                "z": self.z,
                "warmup": self.warmup,
                "eps": self.eps,
                "stats": {
                    k: [s.count, s.mean, s.var] for k, s in self._stats.items()
                },
            }
        )

    @classmethod
    def from_json(cls, payload: str) -> "DriftDetector":
        d = json.loads(payload)
        det = cls(
            cols=d["cols"],
            alpha=d["alpha"],
            z=d["z"],
            warmup=d["warmup"],
            eps=d["eps"],
        )
        for k, (count, mean, var) in d["stats"].items():
            det._stats[k] = _EwStat(count=count, mean=mean, var=var)
        return det


def alerts_from_listener(
    listener,
    detector: DriftDetector,
    metric: str = "replay_feed",
    name: Optional[str] = None,
) -> list[dict]:
    """Replay a ReplayMetricsListener's per-batch observed rows (in batch
    order) through ``detector``; each alert gains the batch_id it fired
    on. The driver-side companion of ``ReplayConfig.drift_cols``."""
    with listener._lock:
        rows = [
            r
            for r in listener.progress
            if (name is None or r["name"] == name)
            and metric in r.get("observed", {})
        ]
    rows.sort(key=lambda r: r["batch_id"])
    out: list[dict] = []
    for r in rows:
        for a in detector.observe_batch(r["observed"][metric]):
            out.append({**a, "batch_id": r["batch_id"]})
    return out
