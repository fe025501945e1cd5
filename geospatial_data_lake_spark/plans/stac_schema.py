"""Full STAC JSON-Schema validation (draft-7) with strict RFC 3339 checks.

The reference validates every traversed document against the vendored
STAC 1.0.0-rc.3 + GeoJSON draft-7 schema trees with a ``Draft7Validator``
and a ``FormatChecker`` (ref:
backend/check_stac_metadata/stac_validators.py:11,26 and the stac-spec /
geojson-spec submodules, .gitmodules:1-8). Those submodules are not
checked out here, so the schema tree under ``stac_schemas/`` is
re-authored from the published STAC 1.0.0-rc.3 and GeoJSON specs — same
$ids, same required sets, same cross-file $ref structure.

Design notes:

- One schema *store* holds every document keyed by its canonical ``$id``;
  cross-file refs (item -> geojson Feature, item -> datetime, collection
  -> provider) resolve through a ``referencing.Registry``, never the
  network.
- ``FormatChecker`` alone treats every ``format: date-time`` as valid
  unless a checker is registered; the stock ecosystem plugs in
  ``rfc3339-validator``, which this container lacks, so an equivalent
  strict RFC 3339 checker is registered explicitly (regex shape + real
  calendar parse, 'Z' or numeric offset required).
- Validators are built lazily and memoized per process: the traversal's
  mapInPandas kernel validates on executors, where each worker pays the
  schema load exactly once.
"""

from __future__ import annotations

import json
import re
from datetime import datetime
from functools import lru_cache
from pathlib import Path

_SCHEMA_DIR = Path(__file__).parent / "stac_schemas"

_STAC_BASE = "https://schemas.stacspec.org/v1.0.0-rc.3"

#: root schema $id per STAC document type
ROOT_SCHEMA_IDS = {
    "Feature": f"{_STAC_BASE}/item-spec/json-schema/item.json",
    "Catalog": f"{_STAC_BASE}/catalog-spec/json-schema/catalog.json",
    "Collection": f"{_STAC_BASE}/collection-spec/json-schema/collection.json",
}

# RFC 3339 date-time: full date, 'T', full time with optional fraction,
# 'Z' or a numeric offset. Calendar validity is checked by a real parse.
_RFC3339_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}[Tt]\d{2}:\d{2}:\d{2}(\.\d+)?([Zz]|[+-]\d{2}:\d{2})$"
)


def is_rfc3339_datetime(value: object) -> bool:
    """Strict RFC 3339 date-time check; raises ValueError on violation
    (the contract jsonschema's FormatChecker expects from checkers)."""
    if not isinstance(value, str):
        return True  # non-strings are the type keyword's problem
    if not _RFC3339_RE.match(value):
        raise ValueError(f"not an RFC 3339 date-time: {value!r}")
    # calendar validity (month 13, day 32, hour 25 ...)
    datetime.fromisoformat(value.replace("Z", "+00:00").replace("z", "+00:00"))
    return True


def _load_schema_store() -> dict[str, dict]:
    store = {}
    for path in sorted(_SCHEMA_DIR.rglob("*.json")):
        doc = json.loads(path.read_text(encoding="utf-8"))
        store[doc["$id"]] = doc
    return store


@lru_cache(maxsize=None)
def _validator_for(stac_type: str):
    from jsonschema import Draft7Validator, FormatChecker
    from referencing import Registry, Resource

    store = _load_schema_store()
    registry = Registry().with_resources(
        (schema_id, Resource.from_contents(doc)) for schema_id, doc in store.items()
    )
    checker = FormatChecker()
    checker.checks("date-time", raises=ValueError)(is_rfc3339_datetime)
    return Draft7Validator(
        store[ROOT_SCHEMA_IDS[stac_type]],
        registry=registry,
        format_checker=checker,
    )


def validate_stac_document(doc: dict) -> str | None:
    """Validate ``doc`` against the full schema for its STAC type.

    Returns None when valid, else a single human-oriented message (the
    most relevant violation, per jsonschema's best_match heuristic).
    """
    from jsonschema.exceptions import best_match

    doc_type = doc.get("type")
    if doc_type not in ROOT_SCHEMA_IDS:
        return f"unknown STAC type: {doc_type!r}"
    error = best_match(_validator_for(doc_type).iter_errors(doc))
    if error is None:
        return None
    path = "$" + "".join(f"[{p!r}]" for p in error.absolute_path)
    return f"{error.message} (at {path})"
