"""Config hot-reload (SURVEY.md §2.9 T10): the reference polls SQLite
every 10s and restarts sync tasks whose config JSON changed
(cmd/sync/main.go:91-145). Engine analog: watch a spec file; on
content change, stop the running StreamingQuery and start a new one
built from the new spec — checkpoints make the swap seamless (the new
query resumes from the old one's committed offsets when it keeps the
same checkpoint dir).
"""

from __future__ import annotations

import hashlib
import os
import time
from typing import Callable, Optional

from sync_spark.spec import SyncSpec

POLL_INTERVAL_S = 10  # main.go:92


class SpecWatcher:
    """Polls a SyncSpec JSON file; rebuilds/restarts the pipeline on
    change. ``build`` maps a SyncSpec to a started StreamingQuery (or
    any handle exposing .stop())."""

    def __init__(self, spec_path: str, build: Callable[[SyncSpec], "object"]) -> None:
        self.spec_path = spec_path
        self.build = build
        self._digest: Optional[str] = None
        self.query = None
        self.reload_count = 0

    def _read(self) -> tuple[str, SyncSpec]:
        with open(self.spec_path) as f:
            raw = f.read()
        return hashlib.sha256(raw.encode()).hexdigest(), SyncSpec.from_json(raw)

    def poll_once(self) -> bool:
        """Check the file; (re)start on change. Returns True if a
        (re)start happened."""
        if not os.path.exists(self.spec_path):
            return False
        digest, spec = self._read()
        if digest == self._digest:
            return False
        if self.query is not None:
            self.query.stop()
            self.reload_count += 1
        self.query = self.build(spec)
        self._digest = digest
        return True

    def run(self, max_polls: Optional[int] = None, interval_s: float = POLL_INTERVAL_S) -> None:
        polls = 0
        while max_polls is None or polls < max_polls:
            self.poll_once()
            polls += 1
            time.sleep(interval_s)

    def stop(self) -> None:
        if self.query is not None:
            self.query.stop()
            self.query = None
