"""osmupdate's changefile-cascade planning (non-network core).

Reimplements the pure decision logic of osmupdate.c main
(osmupdate.c:1388-1540) — which minutely/hourly/daily/sporadic
.osc files to fetch and merge to update a file stamped
`old_timestamp` to "now" — with the network lookups injected as
callables (the reference shells out to wget; fetching is out of
scope here, the PLAN is the testable part):

  - update range guard: newest minutely ts - old ts must be within
    max_days (default 250, osmupdate.c:1455-1463);
  - cadence clamps: hourly is skipped entirely when the file is
    newer than newest_hourly - 30 min (minutely will cover it);
    daily is skipped when newer than newest_daily - 16 h
    (osmupdate.c:1466-1475);
  - the three backward walks chained through one running timestamp:
    minutely files newest-first down to the hourly boundary (or the
    file timestamp), then hourly down to the daily boundary, then
    daily down to the file timestamp — each walk seeded with the
    previous walk's final timestamp, so a cadence contributes
    nothing when the finer cadence already reached back far enough
    (osmupdate.c:1483-1530);
  - sporadic mode: when the repository publishes state at its root,
    ONLY sporadic files are processed (osmupdate.c:1404-1416).

Returns the files newest-first — the reference's processing order
(it merges backward, then applies the merged change once)."""

from __future__ import annotations

from collections.abc import Callable

MINUTELY = "minutely"
HOURLY = "hourly"
DAILY = "daily"
SPORADIC = "sporadic"


class UpdateRangeError(ValueError):
    """update range too large (osmupdate.c:1455-1463)"""


def plan_updates(
    old_timestamp: int,
    newest: dict[str, tuple[int, int]],
    get_timestamp: Callable[[str, int], int],
    max_days: int = 250,
    no_minutely: bool = False,
    no_hourly: bool = False,
    no_daily: bool = False,
) -> list[tuple[str, int, int]]:
    """-> [(cadence, sequence_number, timestamp)], newest first.

    old_timestamp: unix seconds of the file to update.
    newest: cadence -> (sequence_number, timestamp) of the NEWEST
        available changefile (omit a cadence if unavailable;
        SPORADIC present means root-level state was found and all
        calendar cadences are ignored, as the reference does).
    get_timestamp(cadence, seq): timestamp of an older changefile;
        return 0 when unavailable (stops that walk)."""
    if SPORADIC in newest:
        seq, ts = newest[SPORADIC]
        out = []
        next_ts = ts
        while next_ts > old_timestamp and next_ts != 0:
            ts_cur = next_ts
            out.append((SPORADIC, seq, ts_cur))
            seq -= 1
            next_ts = get_timestamp(SPORADIC, seq)
        return out

    minutely_seq, minutely_ts = (
        newest.get(MINUTELY, (0, 0)) if not no_minutely else (0, 0)
    )
    hourly_seq, hourly_ts = (
        newest.get(HOURLY, (0, 0)) if not no_hourly else (0, 0)
    )
    daily_seq, daily_ts = (
        newest.get(DAILY, (0, 0)) if not no_daily else (0, 0)
    )

    if minutely_ts - old_timestamp > max_days * 86400:
        days = (minutely_ts - old_timestamp + 86399) // 86400
        raise UpdateRangeError(
            f"Update range too large: {days} days."
        )

    # cadence clamps (osmupdate.c:1466-1475)
    if old_timestamp > hourly_ts - 30 * 60 and not no_minutely:
        hourly_ts = 0
    if old_timestamp > daily_ts - 16 * 3600 and not (
        no_hourly and no_minutely
    ):
        daily_ts = 0

    timestamp = max(0, minutely_ts, hourly_ts, daily_ts)
    out: list[tuple[str, int, int]] = []

    if minutely_ts != 0:
        next_ts = timestamp
        seq = minutely_seq
        while next_ts > hourly_ts and next_ts > old_timestamp and next_ts != 0:
            timestamp = next_ts
            out.append((MINUTELY, seq, timestamp))
            seq -= 1
            next_ts = get_timestamp(MINUTELY, seq)

    if hourly_ts != 0:
        next_ts = timestamp
        seq = hourly_seq
        while next_ts > daily_ts and next_ts > old_timestamp and next_ts != 0:
            timestamp = next_ts
            out.append((HOURLY, seq, timestamp))
            seq -= 1
            next_ts = get_timestamp(HOURLY, seq)

    if daily_ts != 0:
        next_ts = timestamp
        seq = daily_seq
        while next_ts > old_timestamp and next_ts != 0:
            timestamp = next_ts
            out.append((DAILY, seq, timestamp))
            seq -= 1
            next_ts = get_timestamp(DAILY, seq)

    return out
