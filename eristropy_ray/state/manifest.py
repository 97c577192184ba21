"""Per-partition checkpoint manifest (SURVEY.md §4.1 "Checkpoint / resume").

A run writes each shard's outputs under ``<out>/<stage>/shard=<id>/`` and
records completion in ``<out>/MANIFEST.json`` (atomic tmp+rename). Resume =
skip shards whose manifest entry AND output directory both exist. Shards
are input-file groups; conversations never span input files (the
synthesizer guarantees it; real ingest would partition the same way), so
skipping a completed shard can never split a window or a codec stream.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path


class Manifest:
    def __init__(self, out_dir: str | os.PathLike) -> None:
        self.path = Path(out_dir) / "MANIFEST.json"
        self._state: dict = {"version": 1, "shards": {}}
        if self.path.exists():
            self._state = json.loads(self.path.read_text())

    def is_complete(self, shard_id: str, stage: str) -> bool:
        entry = self._state["shards"].get(shard_id, {})
        done = stage in entry.get("stages", {})
        if not done:
            return False
        out_path = entry["stages"][stage].get("path")
        return out_path is None or Path(out_path).exists()

    def mark_complete(
        self,
        shard_id: str,
        stage: str,
        path: str | None,
        rows: int,
        wall_s: float,
        extra: dict | None = None,
    ) -> None:
        entry = self._state["shards"].setdefault(shard_id, {"stages": {}})
        entry["stages"][stage] = {
            "path": path,
            "rows": rows,
            "wall_s": round(wall_s, 3),
            "completed_unix": int(time.time()),
            **(extra or {}),
        }
        self._flush()

    def _flush(self) -> None:
        tmp = self.path.with_suffix(".json.tmp")
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp.write_text(json.dumps(self._state, indent=1, sort_keys=True))
        os.replace(tmp, self.path)

    @property
    def shards(self) -> dict:
        return self._state["shards"]
