"""osmupdate cascade-planning unit tests (osmupdate.c:1388-1540)
over synthetic timestamp fixtures: minutely files every minute,
hourly every hour, daily every day, all aligned to epoch-day
boundaries so the boundary arithmetic is easy to eyeball."""

from __future__ import annotations

import pytest

from osmgraft.updateplan import (
    DAILY,
    HOURLY,
    MINUTELY,
    SPORADIC,
    UpdateRangeError,
    plan_updates,
)

DAY = 86400
H = 3600

# "now": newest minutely at day 10 + 05:07, hourly at day 10 + 05:00,
# daily at day 10 + 00:00. Sequence numbers count files of that
# cadence since epoch.
NOW_MIN = 400 * DAY + 5 * H + 7 * 60
NOW_HOUR = 400 * DAY + 5 * H
NOW_DAY = 400 * DAY

NEWEST = {
    MINUTELY: (NOW_MIN // 60, NOW_MIN),
    HOURLY: (NOW_HOUR // H, NOW_HOUR),
    DAILY: (NOW_DAY // DAY, NOW_DAY),
}


def get_ts(cadence, seq):
    if seq <= 0:
        return 0
    return {MINUTELY: 60, HOURLY: H, DAILY: DAY, SPORADIC: 500}[
        cadence
    ] * seq


def test_cascade_covers_range_with_three_cadences():
    # file is 3.5 days old -> dailies back to the file ts, hourlies
    # for the partial day, minutelies for the partial hour
    old = NOW_MIN - 3 * DAY - 12 * H
    plan = plan_updates(old, NEWEST, get_ts)
    cadences = [c for c, _s, _t in plan]
    # newest-first: minutely block, then hourly, then daily
    assert cadences == sorted(
        cadences,
        key=[MINUTELY, HOURLY, DAILY].index,
    )
    mins = [(s, t) for c, s, t in plan if c == MINUTELY]
    hours = [(s, t) for c, s, t in plan if c == HOURLY]
    days = [(s, t) for c, s, t in plan if c == DAILY]
    # minutelies walk back until the hourly boundary
    assert mins[0] == (NOW_MIN // 60, NOW_MIN)
    assert all(t > NOW_HOUR for _s, t in mins)
    assert mins[-1][1] == NOW_HOUR + 60
    # hourlies until the daily boundary. NB the reference seeds each
    # walk's first reported timestamp from the PREVIOUS walk's last
    # one (osmupdate.c:1502-1506: next_timestamp= timestamp) — the
    # file set is what matters and it is exact.
    assert hours[0] == (NOW_HOUR // H, NOW_HOUR + 60)
    assert [s for s, _t in hours] == list(
        range(NOW_HOUR // H, NOW_DAY // H, -1)
    )
    assert hours[-1][1] == NOW_DAY + H
    # dailies until the file timestamp
    assert days[0] == (NOW_DAY // DAY, NOW_DAY + H)
    assert all(t > old for _s, t in days[1:])
    # coverage: the oldest selected file's PREDECESSOR is <= old
    assert get_ts(DAILY, days[-1][0] - 1) <= old

    # selected minutely timestamps are contiguous
    assert [t for _s, t in mins] == list(
        range(NOW_MIN, NOW_HOUR, -60)
    )


def test_recent_file_uses_minutely_only():
    # 10 minutes old and newer than newest_hourly - 30 min
    # -> hourly cleared, only minutelies
    old = NOW_MIN - 10 * 60
    plan = plan_updates(old, NEWEST, get_ts)
    assert {c for c, _s, _t in plan} == {MINUTELY}
    assert len(plan) == 10


def test_hourly_clamp_30min_boundary():
    # file older than newest_hourly - 30 min -> hourly participates
    old = NOW_HOUR - 31 * 60
    plan = plan_updates(old, NEWEST, get_ts)
    assert HOURLY in {c for c, _s, _t in plan}


def test_daily_clamp_16h_boundary():
    # 10 hours before newest daily: within 16h -> daily cleared
    old = NOW_DAY - 10 * H
    plan = plan_updates(old, NEWEST, get_ts)
    assert DAILY not in {c for c, _s, _t in plan}
    # 20 hours before newest daily: daily used
    old2 = NOW_DAY - 20 * H
    plan2 = plan_updates(old2, NEWEST, get_ts)
    assert DAILY in {c for c, _s, _t in plan2}


def test_no_minutely_keeps_hourly_despite_clamp():
    # the 30-min clamp only applies when minutely is allowed
    old = NOW_HOUR - 10 * 60
    plan = plan_updates(old, NEWEST, get_ts, no_minutely=True)
    assert plan == [(HOURLY, NOW_HOUR // H, NOW_HOUR)]


def test_up_to_date_file_yields_empty_plan():
    assert plan_updates(NOW_MIN, NEWEST, get_ts) == []


def test_update_range_guard():
    old = NOW_MIN - 251 * DAY
    with pytest.raises(UpdateRangeError):
        plan_updates(old, NEWEST, get_ts)
    # explicit --max-days widens it
    assert plan_updates(old, NEWEST, get_ts, max_days=300)


def test_sporadic_mode_ignores_calendar_cadences():
    newest = dict(NEWEST)
    newest[SPORADIC] = (7, 3500)
    plan = plan_updates(1200, newest, get_ts)
    assert plan == [
        (SPORADIC, 7, 3500),
        (SPORADIC, 6, 3000),
        (SPORADIC, 5, 2500),
        (SPORADIC, 4, 2000),
        (SPORADIC, 3, 1500),
    ]
