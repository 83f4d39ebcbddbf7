"""Stream guardian: restart-with-backoff loop (SURVEY.md §2.9 T7).

Reference: watchChangesWithRetry restarts a failed change stream with
exponential backoff — 5s base, ×1.5, capped at 5 min, ≤10 retries —
and only for errors classified as recoverable
(mongodb.go:612-691, 1793-1833); connection retries use 5 attempts ×2.0
base 2s (retry.go:8-21). Structured Streaming already restarts *tasks*;
this loop restarts the *query* (driver-side), resuming from the
checkpoint, which is the exact analog of the reference's guardian.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Optional

# reference constants (mongodb.go:616-629)
BASE_DELAY_S = 5.0
MAX_DELAY_S = 300.0
BACKOFF_FACTOR = 1.5
MAX_RETRIES = 10

RECOVERABLE_MARKERS = (
    # the reference classifies network/cursor/timeout errors as
    # recoverable (mongodb.go:1793-1833); Spark-side equivalents:
    "connection",
    "timeout",
    "timed out",
    "temporarily",
    "unavailable",
    "FileNotFoundException",  # log file compacted/rotated under us
)


# permanent-failure markers take precedence: an auth error whose
# message happens to mention a connection must NOT burn the full
# 10-attempt/5-min-cap schedule before alerting
PERMANENT_MARKERS = (
    "auth",
    "credential",
    "password",
    "permission",
    "denied",
    "unauthorized",
    "forbidden",
)


def is_recoverable(exc: BaseException) -> bool:
    msg = str(exc).lower()
    if any(m in msg for m in PERMANENT_MARKERS):
        return False
    return any(m.lower() in msg for m in RECOVERABLE_MARKERS)


@dataclass
class RetryStats:
    attempts: int = 0
    delays: Optional[list[float]] = None


def run_with_retry(
    run_once: Callable[[], None],
    max_retries: int = MAX_RETRIES,
    base_delay: float = BASE_DELAY_S,
    factor: float = BACKOFF_FACTOR,
    max_delay: float = MAX_DELAY_S,
    sleep: Callable[[float], None] = time.sleep,
    classify: Callable[[BaseException], bool] = is_recoverable,
) -> RetryStats:
    """Run ``run_once`` (e.g. pipeline.run_available) until it
    succeeds; on recoverable failure, back off and restart (the
    checkpoint makes restarts safe). Unrecoverable errors and retry
    exhaustion re-raise."""
    stats = RetryStats(delays=[])
    delay = base_delay
    while True:
        stats.attempts += 1
        try:
            run_once()
            return stats
        except Exception as exc:  # noqa: BLE001 — classification decides
            if not classify(exc) or stats.attempts > max_retries:
                raise
            stats.delays.append(delay)
            sleep(delay)
            delay = min(delay * factor, max_delay)
