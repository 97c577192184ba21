"""Lineage / metrics sidecar: one JSONL record per (stage, shard) with row
counts, bytes and wall time — the "lineage + row-count/bytes metrics
emitted per stage" requirement of the north rule."""

from __future__ import annotations

import json
import os
import time
from pathlib import Path


class MetricsLog:
    def __init__(self, out_dir: str | os.PathLike) -> None:
        self.path = Path(out_dir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def emit(self, **record) -> None:
        record.setdefault("unix", int(time.time()))
        with self.path.open("a") as fh:
            fh.write(json.dumps(record, sort_keys=True) + "\n")

    def read(self) -> list[dict]:
        if not self.path.exists():
            return []
        return [json.loads(line) for line in self.path.read_text().splitlines() if line]
