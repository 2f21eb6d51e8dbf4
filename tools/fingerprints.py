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
"""

from __future__ import annotations

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


def main(argv: list[str]) -> None:
    from velib_lakehouse_spark import registry

    recorded = load()
    window = list(registry.PRIORITY)
    names = list(registry.QUERIES) if "--all" in argv else window
    for n in names:
        recorded[n] = fingerprint(n)
    # drop entries for queries that no longer exist
    recorded = {n: h for n, h in recorded.items() if n in registry.QUERIES}
    with open(FILE, "w") as f:
        json.dump(dict(sorted(recorded.items())), f, indent=1)
    print(f"wrote {len(recorded)} fingerprints ({len(names)} refreshed) to {FILE}")


if __name__ == "__main__":
    main(sys.argv[1:])
