"""Confluent-style Schema Registry client (S2 companion).

Reference consumption path (imtu/InMemoryTableUpdaterManager.scala:43-53):
the CDC consumers deserialize Avro GenericRecords via the registry — the
5-byte wire prefix is magic byte 0x0 + a big-endian int32 schema id, and
the writer schema is fetched from the registry by that id.

Spark-first mapping: `from_avro` wants ONE reader schema per query plan,
so the stream builder fetches the subject's LATEST registered schema at
plan-build time and uses it as the reader schema for every record —
registry compatibility rules (BACKWARD/FULL) are exactly the contract
that makes old writer-schema records decodable with the newest reader.
Per-record schema-id dispatch (mixed incompatible schemas on one topic)
is out of scope, as it is for the reference.

The REST shapes used are the public Confluent Schema Registry API:
GET /schemas/ids/{id} -> {"schema": "..."} and
GET /subjects/{subject}/versions/latest -> {"id":., "schema": "..."}.
Only stdlib urllib is used; tests inject a canned `fetcher`.
"""

from __future__ import annotations

import json
import struct
from typing import Callable


def _http_fetcher(url: str) -> dict:  # pragma: no cover - needs live registry
    import urllib.request

    with urllib.request.urlopen(url, timeout=10) as resp:
        return json.loads(resp.read().decode("utf-8"))


class SchemaRegistryClient:
    """Minimal read-only registry client. `fetcher(url) -> dict` is
    injectable so tests run against canned responses (no live registry
    in the sandbox)."""

    def __init__(self, base_url: str, fetcher: Callable[[str], dict] | None = None):
        self.base_url = base_url.rstrip("/")
        self._fetch = fetcher or _http_fetcher
        self._by_id: dict[int, str] = {}

    def schema_by_id(self, schema_id: int) -> str:
        """Writer schema JSON for a wire-header schema id (cached)."""
        if schema_id not in self._by_id:
            doc = self._fetch(f"{self.base_url}/schemas/ids/{schema_id}")
            self._by_id[schema_id] = doc["schema"]
        return self._by_id[schema_id]

    def latest_schema(self, subject: str) -> tuple[int, str]:
        """(id, schema JSON) of the subject's latest registered version —
        the reader schema for a streaming plan."""
        doc = self._fetch(f"{self.base_url}/subjects/{subject}/versions/latest")
        return int(doc["id"]), doc["schema"]


def parse_wire_header(payload: bytes) -> tuple[int, bytes]:
    """Split a Confluent wire-format message into (schema_id, avro_bytes).
    Raises on a bad magic byte — a plain-Avro topic should use the
    no-registry path instead of silently mis-slicing."""
    if len(payload) < 5 or payload[0] != 0:
        raise ValueError("not Confluent wire format (magic byte != 0)")
    (schema_id,) = struct.unpack(">I", payload[1:5])
    return schema_id, payload[5:]
