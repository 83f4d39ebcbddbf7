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
import logging
import os
import time
from typing import Callable, Optional

from sync_spark.spec import SyncSpec

POLL_INTERVAL_S = 10  # main.go:92

log = logging.getLogger(__name__)


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

    def poll_once(self) -> bool:
        """Check the file; (re)start on change. Returns True if a
        (re)start happened. A failed build leaves the watcher in a
        'nothing running, retry next poll' state rather than a
        stopped-forever one."""
        if not os.path.exists(self.spec_path):
            return False
        with open(self.spec_path) as f:
            raw = f.read()
        digest = hashlib.sha256(raw.encode()).hexdigest()
        if digest == self._digest:
            return False
        # parse only on change (unchanged files are not re-parsed)
        spec = SyncSpec.from_json(raw)
        if self.query is not None:
            self.query.stop()
            self.query = None
            self.reload_count += 1
        try:
            self.query = self.build(spec)
        except Exception:
            # old query already stopped; forget the digest so the next
            # poll retries the build instead of considering it live
            self._digest = None
            raise
        self._digest = digest
        return True

    def run(self, max_polls: Optional[int] = None, interval_s: float = POLL_INTERVAL_S) -> None:
        """Daemon loop: survives torn reads / bad specs / transient
        build failures (the reference's loop polls forever too)."""
        polls = 0
        while max_polls is None or polls < max_polls:
            try:
                self.poll_once()
            except Exception:
                log.exception("spec reload failed; retrying next poll")
            polls += 1
            time.sleep(interval_s)

    def stop(self) -> None:
        if self.query is not None:
            self.query.stop()
            self.query = None
        # forget the digest: a later poll/run must restart even if the
        # file is unchanged (nothing is running anymore)
        self._digest = None
