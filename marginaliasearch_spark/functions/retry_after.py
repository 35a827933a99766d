"""Retry-After header parsing.

Reimplements HttpFetcherImpl.parseRetryAfterSeconds
(ref: code/processes/crawling-process/java/nu/marginalia/crawl/fetcher/
HttpFetcherImpl.java:710-728): numeric seconds (rounded, Java
Math.round = half-up) or an RFC-1123 HTTP-date (GMT or numeric offset)
relative to *now*; -1 on failure, past dates clamp to 0.
"""

from __future__ import annotations

import math
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime
from typing import Optional


def parse_retry_after_seconds(
    retry_after: Optional[str], now: Optional[datetime] = None
) -> int:
    if retry_after is None:
        return -1

    try:
        v = float(retry_after)
        if math.isfinite(v):
            return int(math.floor(v + 0.5))  # Java Math.round semantics
    except ValueError:
        pass

    try:
        target = parsedate_to_datetime(retry_after)
        if target.tzinfo is None:
            target = target.replace(tzinfo=timezone.utc)
        if now is None:
            now = datetime.now(timezone.utc)
        seconds = int((target - now).total_seconds())
        return max(seconds, 0)
    except (ValueError, TypeError):
        pass

    return -1


def clamp_retry_delay_seconds(seconds: int) -> int:
    """CrawlDelayTimer.waitRetryDelay clamp: [1, 5] seconds
    (ref: CrawlDelayTimer.java:33-48)."""
    return max(1, min(seconds, 5))
