"""Per-query code+oracle fingerprints — the "changed => re-window" guard.

The driver's correctness harness only re-checks the first
``registry.DRIVER_WINDOW`` queries each round, so a query whose code
changes AFTER its last green CORRECTNESS row would otherwise coast on
stale evidence (r3 VERDICT next-round #2, the dedup_minhash_lsh case).
This module pins each query's fingerprint — sha256 over the query
function's source plus its oracle SQL — in ``query_fingerprints.json``
at the moment the query last sat in the driver window.  The test
``tests/test_registry_window.py::test_changed_queries_are_in_window``
fails whenever a query's current fingerprint differs from the recorded
one and the query is NOT in the current window.

Known limitation (documented, accepted): the fingerprint covers the
registered function's own source, not helpers it calls, so a
helper-only change can slip through.  The backstops are (a) builder
discipline — shared-helper rewrites rotate every caller in (see the
r4 rotation comment in registry.py) — and (b) the coverage-ratchet
test, which keeps every operator family within two rounds of a green
driver row.

Regenerate at the END of a round, after the window is final::

    python -m tools.fingerprints            # refresh in-window entries
    python -m tools.fingerprints --all      # first run / full rebuild
    python -m tools.fingerprints --check    # read-only drift report

Unknown arguments are rejected (argparse strict): an accidental
``--help``/typo invocation must never silently rewrite the file and
bless stale pins (r4 ADVICE).
"""

from __future__ import annotations

import argparse
import hashlib
import inspect
import json
import os
import sys

FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "query_fingerprints.json")


def fingerprint(name: str) -> str:
    from velib_lakehouse_spark import registry

    src = inspect.getsource(registry.QUERIES[name])
    oracle = registry.ORACLE.get(name) or ""
    return hashlib.sha256(
        (src + "\n--oracle--\n" + oracle).encode()
    ).hexdigest()[:16]


def load() -> dict[str, str]:
    if not os.path.exists(FILE):
        return {}
    with open(FILE) as f:
        return json.load(f)


def main(argv: list[str]) -> int:
    parser = argparse.ArgumentParser(
        prog="tools.fingerprints",
        description="Refresh or check the changed=>re-window fingerprints.",
    )
    group = parser.add_mutually_exclusive_group()
    group.add_argument(
        "--all", action="store_true", help="rebuild every query's fingerprint"
    )
    group.add_argument(
        "--check",
        action="store_true",
        help="read-only: diff recorded vs current, exit 1 on drift",
    )
    opts = parser.parse_args(argv)  # strict: unknown args exit 2, no write

    from velib_lakehouse_spark import registry

    recorded = load()
    if opts.check:
        drifted = sorted(
            n
            for n in registry.QUERIES
            if recorded.get(n) != fingerprint(n)
        )
        stale = sorted(n for n in recorded if n not in registry.QUERIES)
        for n in drifted:
            state = "missing" if n not in recorded else "changed"
            print(f"DRIFT {n}: {state}")
        for n in stale:
            print(f"STALE {n}: recorded but no longer registered")
        print(f"checked {len(registry.QUERIES)} queries: {len(drifted)} drifted")
        return 1 if (drifted or stale) else 0

    names = list(registry.QUERIES) if opts.all else list(registry.PRIORITY)
    for n in names:
        recorded[n] = fingerprint(n)
    # drop entries for queries that no longer exist
    recorded = {n: h for n, h in recorded.items() if n in registry.QUERIES}
    with open(FILE, "w") as f:
        json.dump(dict(sorted(recorded.items())), f, indent=1)
    print(f"wrote {len(recorded)} fingerprints ({len(names)} refreshed) to {FILE}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
