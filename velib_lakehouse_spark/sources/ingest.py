"""Bronze ingestion utilities (reference bronze path, network-free core).

The reference's bronze tier is (a) an HTTP fetch of the full station
export with server-side field selection (reference
src/assets/bronze.py:29-46) and (b) a keyed JSON message per station
pushed to Kafka so all messages for one station land in one partition
(reference src/assets/bronze.py:16-23,49-58).  The testable core —
field selection, keyed serialization, partition-affinity — is pure
Python here; the network edges (requests / kafka-python) are optional
imports injected by the deployment.
"""

from __future__ import annotations

import json
from collections.abc import Iterable

# The reference producer ships exactly these fields (bronze.py:34).
STATUS_FIELDS = [
    "stationcode",
    "name",
    "numdocksavailable",
    "numbikesavailable",
    "mechanical",
    "ebike",
    "duedate",
]


def select_fields(records: Iterable[dict], fields: list[str] | None = None) -> list[dict]:
    """Server-side ``select=`` projection done client-side: keep only the
    contract fields, in contract order (P10's column-pruning analogue)."""
    fields = fields or STATUS_FIELDS
    return [{f: r.get(f) for f in fields} for r in records]


def to_keyed_messages(
    records: Iterable[dict], key_field: str = "stationcode"
) -> list[tuple[bytes, bytes]]:
    """(key, value) message pairs: key = station code (per-partition
    ordering per station, bronze.py:52-54), value = compact JSON."""
    out = []
    for r in records:
        key = str(r[key_field]).encode("utf-8")
        val = json.dumps(r, separators=(",", ":"), sort_keys=True).encode("utf-8")
        out.append((key, val))
    return out


def partition_for_key(key: bytes, n_partitions: int) -> int:
    """Deterministic key -> partition assignment (stable across runs, so
    one station's messages always co-locate)."""
    import hashlib

    return int.from_bytes(hashlib.md5(key).digest()[:4], "big") % n_partitions


def fetch_station_status(url: str, timeout: int = 15) -> list[dict]:
    """HTTP export fetch (reference bronze.py:29-46); network edge —
    injected ``requests`` kept at the boundary."""
    import requests

    resp = requests.get(url, timeout=timeout)
    resp.raise_for_status()
    payload = resp.json()
    return payload.get("results", payload if isinstance(payload, list) else [])
