"""Error classification, retry budgets, exponential backoff
(SURVEY.md §2.8 F11-F13).

Reference parity:
  - classify_error: message → class ladder (video_processor.py:194-235)
  - retry budget per class (video_processor.py:94-112)
  - backoff = base[class] * 2^attempt, capped 300 s
    (video_processor.py:237-255; file_downloader.py:318-321)

All column expressions; the backoff becomes a *scheduling delay*
(next_attempt_ts column) instead of a sleep — the crawl loop simply filters
``next_attempt_ts <= logical_now`` when building the next micro-batch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: error class → max attempts (reference video_processor.py:94-112)
RETRY_BUDGET = {
    "network": 8,
    "rate_limit": 6,
    "temporary": 4,
    "validation": 3,
    "permanent": 2,
}

#: error class → backoff base seconds (reference video_processor.py:237-255)
BACKOFF_BASE_S = {
    "network": 5.0,
    "rate_limit": 30.0,
    "temporary": 10.0,
    "validation": 15.0,
    "permanent": 60.0,
}

BACKOFF_CAP_S = 300.0  # reference cap (video_processor.py:251)


def classify_error(msg: Column | str) -> Column:
    """Error message → {network, rate_limit, permanent, validation, temporary}.

    Ladder order matters and mirrors the reference: rate-limit markers are
    checked before generic network ones (video_processor.py:194-235).
    """
    c = F.lower(F.coalesce(F.col(msg) if isinstance(msg, str) else msg, F.lit("")))
    return (
        F.when(c.rlike(r"429|rate.?limit|too many requests|throttl"), "rate_limit")
        .when(c.rlike(r"404|410|not found|gone|forbidden|403|unauthorized|401"), "permanent")
        .when(c.rlike(r"timeout|timed out|connection|dns|refused|reset|unreachable|network|ssl"), "network")
        .when(c.rlike(r"invalid|corrupt|truncat|too small|magic|signature|validation|psnr|checksum"), "validation")
        .otherwise("temporary")
    )


def retry_budget(error_class: Column | str) -> Column:
    c = F.col(error_class) if isinstance(error_class, str) else error_class
    expr = None
    for cls, budget in RETRY_BUDGET.items():
        cond = c == cls
        expr = F.when(cond, budget) if expr is None else expr.when(cond, budget)
    return expr.otherwise(RETRY_BUDGET["temporary"])


def should_retry(error_class: Column | str, attempts: Column | str) -> Column:
    """attempts so far < class budget (reference video_processor.py:94-112)."""
    a = F.col(attempts) if isinstance(attempts, str) else attempts
    return a < retry_budget(error_class)


def backoff_seconds(error_class: Column | str, attempts: Column | str) -> Column:
    """least(cap, base[class] * 2^attempts) — reference
    video_processor.py:237-255."""
    c = F.col(error_class) if isinstance(error_class, str) else error_class
    a = F.col(attempts) if isinstance(attempts, str) else attempts
    base = None
    for cls, b in BACKOFF_BASE_S.items():
        cond = c == cls
        base = F.when(cond, b) if base is None else base.when(cond, b)
    base = base.otherwise(BACKOFF_BASE_S["temporary"])
    return F.least(F.lit(BACKOFF_CAP_S), base * F.pow(F.lit(2.0), a.cast("double")))
