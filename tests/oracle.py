"""Single-threaded pure-Python oracle for the crawl engine (SURVEY.md §5).

Replays the reference's semantics — page N → N-1 → … → 1, listing order
within a page, skip-seen, robots exclusion, per-class retry budgets with
exponential backoff as a logical clock (reference main_scraper.py:547-614,
video_processor.py:94-255) — using the *same* batch slicing and logical
clock as the engine, so the full schedule trace (including retry
re-schedules) is predictable row for row.

URL hashes are an input (computed once via Spark's xxhash64 and passed in):
the oracle checks ordering/state semantics, not the hash function.
"""

from __future__ import annotations

from dataclasses import dataclass, field

TICK_SECONDS = 60

RETRY_BUDGET = {"network": 8, "rate_limit": 6, "temporary": 4, "validation": 3, "permanent": 2}
BACKOFF_BASE_S = {"network": 5.0, "rate_limit": 30.0, "temporary": 10.0, "validation": 15.0, "permanent": 60.0}
BACKOFF_CAP_S = 300.0

FAULT_CLASS = {
    "network": "network",
    "rate_limit": "rate_limit",
    "permanent": "permanent",
    "temporary": "temporary",
    "validation": "validation",  # truncated body → validator error
}


@dataclass
class Item:
    url: str
    url_hash: int
    host: str
    image_id: str
    priority: int
    position: int
    status: str = "pending"
    attempts: int = 0
    error_class: str | None = None
    next_attempt_s: float | None = None


@dataclass
class OracleResult:
    schedule: list[tuple[int, str, str]] = field(default_factory=list)  # (seq, url, image_id)
    seen: dict[int, tuple[str, int]] = field(default_factory=dict)  # url_hash -> (image_id, seq)
    final_status: dict[int, Item] = field(default_factory=dict)
    batches: list[dict] = field(default_factory=list)


def path_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    slash = rest.find("/")
    return rest[slash:] if slash >= 0 else ""


def robots_blocked(url: str, host: str, robots: dict[str, dict]) -> bool:
    rule = robots.get(host)
    if not rule:
        return False
    p = path_of(url)
    return any(p.startswith(pref) for pref in rule["disallow_prefixes"])


def run_oracle(
    items: list[Item],
    robots: dict[str, dict],
    faults: dict[str, tuple[str, int]],
    batch_size: int,
    max_batches: int = 10_000,
) -> OracleResult:
    """Replay the crawl. ``faults``: image_id → (mode, fail_count);
    fail_count == -1 → always fails."""
    res = OracleResult()
    logical_s = 0.0
    next_seq = 1
    by_hash = {it.url_hash: it for it in items}

    for _ in range(max_batches):
        logical_s += TICK_SECONDS
        eligible = [
            it
            for it in by_hash.values()
            if it.status == "pending"
            or (
                it.status == "failed"
                and (it.next_attempt_s is None or it.next_attempt_s <= logical_s)
            )
        ]
        eligible.sort(key=lambda it: (-it.priority, it.position, it.url_hash))
        batch = eligible[:batch_size]
        if not batch:
            future = [
                it.next_attempt_s
                for it in by_hash.values()
                if it.status == "failed" and it.next_attempt_s is not None
            ]
            if not future:
                break
            logical_s = min(future)  # engine's clock jump
            res.batches.append({"scheduled": 0, "clock_jump": True})
            continue

        stats = {"scheduled": 0, "ok": 0, "failed": 0, "blocked": 0, "skipped": 0}
        allowed: list[Item] = []
        for it in batch:
            if it.url_hash in res.seen:
                it.status = "skipped_seen"
                stats["skipped"] += 1
                continue
            if robots_blocked(it.url, it.host, robots):
                it.status = "robots_blocked"
                it.error_class = "robots"
                stats["blocked"] += 1
                continue
            allowed.append(it)

        # seq assignment over the allowed slice, in crawl order
        for it in allowed:
            seq = next_seq
            next_seq += 1
            res.schedule.append((seq, it.url, it.image_id))
            stats["scheduled"] += 1
            fault = faults.get(it.image_id)
            fails_now = fault is not None and (
                fault[1] == -1 or it.attempts < fault[1]
            )
            if not fails_now:
                it.status = "done"
                res.seen[it.url_hash] = (it.image_id, seq)
                stats["ok"] += 1
            else:
                cls = FAULT_CLASS[fault[0]]
                it.attempts += 1
                it.error_class = cls
                if it.attempts < RETRY_BUDGET[cls]:
                    it.status = "failed"
                    backoff = min(BACKOFF_CAP_S, BACKOFF_BASE_S[cls] * 2 ** it.attempts)
                    it.next_attempt_s = logical_s + backoff
                else:
                    it.status = "permanent"
                stats["failed"] += 1
        res.batches.append(stats)

    res.final_status = by_hash
    return res
