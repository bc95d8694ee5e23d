"""Mechanical guard for the driver's 50-slot verification window.

The driver hash-checks only the FIRST 50 ``queries()`` entries per
round.  Ordering (``plans/catalog._ordered_names``) puts ``_PRIORITY``
first, then everything else by staleness, so the window rotates across
rounds — but ONLY if the catalog stays small enough and ``_PRIORITY``
is rewritten each round.  Before this test existed, that accounting was
a convention checked by hand (ADVICE r5 asked for exactly this test:
re-simulate the ordering against the latest round's results so a stale
``_PRIORITY`` is caught mechanically).

Invariant: every entry OUTSIDE the first 50 must carry a hash-green
row from the LATEST driver round on disk.  Then latest∪current rounds
cover the whole catalog regardless of what the current round verifies.
No SparkSession needed — this is pure catalog/JSON arithmetic.
"""

import glob
import json
import os
import re

from big_data_processing_spark.plans import catalog as cat_mod
from big_data_processing_spark.plans.catalog import (
    CATALOG,
    _last_green_rounds,
    _ordered_names,
)

WINDOW = 50
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_round() -> int:
    rounds = []
    for path in glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) if rounds else -1


def test_catalog_size_leaves_rotation_headroom():
    # Two-round coverage needs |catalog| <= 2 * WINDOW; we keep a
    # safety margin so a round that adds entries can't silently tip it.
    assert len(CATALOG) <= 100, (
        f"catalog has {len(CATALOG)} entries; the 50-slot two-round "
        "rotation needs <= 100 with margin — merge twins before adding"
    )


def test_priority_names_are_registered():
    unknown = [n for n in cat_mod._PRIORITY if n not in CATALOG]
    assert not unknown, (
        f"_PRIORITY names not in CATALOG (typo?): {unknown}"
    )


def test_every_entry_outside_window_is_green_in_latest_round():
    latest = _latest_round()
    if latest < 0:
        return  # fresh clone without driver artifacts — nothing to check
    last = _last_green_rounds()
    outside = _ordered_names()[WINDOW:]
    stale = [n for n in outside if last.get(n, -1) < latest]
    assert not stale, (
        f"{len(stale)} entries sit outside the driver's {WINDOW}-slot "
        f"window WITHOUT a hash-green row from the latest round r{latest}; "
        "two-round coverage is broken. Rewrite _PRIORITY (drop last "
        f"round's names) or merge entries. Stale: {stale}"
    )


def test_window_has_room_for_all_never_green_entries():
    # A never-green entry MUST be inside the window or it can never
    # earn evidence.
    last = _last_green_rounds()
    ordered = _ordered_names()
    never_green_outside = [
        n for n in ordered[WINDOW:] if last.get(n, -1) < 0
    ]
    assert not never_green_outside, (
        f"never-verified entries pushed outside the window: "
        f"{never_green_outside}"
    )
