"""Structured logging + stage metrics.

Replaces the reference's print-tag convention (``[SculptMate Logging]``,
``[Generation Error]``, ... — SURVEY.md section 5) with a structured logger
and a stage-timing registry that feeds the benchmark metric set
(sec/asset, density queries/sec, MC Mvoxels/sec).
"""

from __future__ import annotations

import contextlib
import json
import logging
import sys
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

_LOGGER = logging.getLogger("sculptmate")
if not _LOGGER.handlers:
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter("[%(name)s %(levelname)s] %(message)s"))
    _LOGGER.addHandler(handler)
    _LOGGER.setLevel(logging.INFO)


def get_logger(name: str = "sculptmate") -> logging.Logger:
    return logging.getLogger(name)


@dataclass
class StageMetrics:
    """Per-generation stage timings and derived throughput numbers."""

    timings: Dict[str, float] = field(default_factory=dict)
    counters: Dict[str, float] = field(default_factory=dict)
    _order: List[str] = field(default_factory=list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.timings[name] = self.timings.get(name, 0.0) + dt
            if name not in self._order:
                self._order.append(name)

    def count(self, name: str, value: float) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + value

    @property
    def total(self) -> float:
        return sum(self.timings.values())

    def derived(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        q = self.counters.get("density_queries", 0)
        if q and self.timings.get("density_grid"):
            out["density_queries_per_sec"] = q / self.timings["density_grid"]
        vox = self.counters.get("mc_voxels", 0)
        if vox and self.timings.get("marching_cubes"):
            out["mc_mvoxels_per_sec"] = vox / self.timings["marching_cubes"] / 1e6
        return out

    def report(self) -> Dict[str, float]:
        rep = {f"{k}_s": round(v, 4) for k, v in self.timings.items()}
        rep["total_s"] = round(self.total, 4)
        rep.update({k: round(v, 2) for k, v in self.derived().items()})
        return rep

    def log(self, logger: Optional[logging.Logger] = None) -> None:
        (logger or _LOGGER).info("stages %s", json.dumps(self.report()))
