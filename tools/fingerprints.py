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

Since round 11 the fingerprint is TRANSITIVE (r10 ADVICE #1): it
hashes the registered function's own source, its oracle SQL, and —
recursively — the source of every package-local function the body
references plus the repr of every simple module-level constant it
reads (ints, floats, strings, bools, tuples).  A rewrite of a shared
helper (``_wmh_rep_pairs``, ``_propagate_labels``, ``_bpe_train``...)
or a constant bump (``WMH_K``) now drifts every consumer's
fingerprint, so ``test_changed_queries_are_in_window`` forces the
whole consumer set back into the window instead of letting it coast
on pre-change driver evidence.  Residual blind spots: helpers reached
only through getattr/dispatch tables, and closures built at call time
— none are used by registered queries today.

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


_PKG = "velib_lakehouse_spark"
_CONST_TYPES = (str, int, float, bool, tuple, frozenset)


def _closure_sources(fn) -> list[tuple[str, str]]:
    """(qualified-name, source-or-repr) for every package-local function
    the body transitively references, plus simple module constants."""
    import types

    seen: dict[str, str] = {}
    stack = [fn]
    visited: set[str] = set()
    while stack:
        f = stack.pop()
        key = f"{f.__module__}.{f.__qualname__}"
        if key in visited:
            continue
        visited.add(key)
        for name in f.__code__.co_names:
            g = f.__globals__.get(name)
            if isinstance(g, types.FunctionType) and getattr(
                g, "__module__", ""
            ).startswith(_PKG):
                gkey = f"{g.__module__}.{g.__qualname__}"
                if gkey not in seen:
                    try:
                        seen[gkey] = inspect.getsource(g)
                    except (OSError, TypeError):  # pragma: no cover
                        seen[gkey] = repr(g)
                    stack.append(g)
            elif isinstance(g, _CONST_TYPES) and not isinstance(g, type):
                seen.setdefault(f"{f.__module__}:{name}", repr(g))
    return sorted(seen.items())


def fingerprint(name: str) -> str:
    from velib_lakehouse_spark import registry

    fn = registry.QUERIES[name]
    src = inspect.getsource(fn)
    oracle = registry.ORACLE.get(name) or ""
    parts = [src, "\n--oracle--\n", oracle]
    for key, text in _closure_sources(fn):
        parts.append(f"\n--helper:{key}--\n")
        parts.append(text)
    return hashlib.sha256("".join(parts).encode()).hexdigest()[:16]


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
