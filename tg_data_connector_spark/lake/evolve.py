"""Transactional schema evolution.

The reference's schema surface is a config-declared column list checked only for
arity (``CommonRdbmsWriter.java:276-285``) with destination types read from the
target table's metadata (``CommonRdbmsWriter.java:266-267``); evolving it means
editing job.json and re-running. Here a schema-change event in the changelog
(`op = 'S'`, FIXTURES.md F2 ``schema_change`` JSON) is applied as its own
snapshot commit *before* the batch of data events that follows it — mirroring
Iceberg's transactional ``ALTER TABLE`` and the north rule's "schema evolution
applied transactionally before the corresponding batch commit".

Supported changes (Iceberg-safe set):
  * ``{"add_column": {"name": ..., "type": ...}}``  — old files read as null;
  * ``{"widen": {"name": ..., "to": ...}}``         — old files cast up on read
    (int -> bigint, float -> double); narrowing is rejected.

Old data files are never rewritten: each file records the schema_id it was
written under, and ``LakeTable.read`` aligns every file group up to the current
schema (cast + null-fill) — exactly Iceberg's lazy evolution.
"""

from __future__ import annotations

import json

from .table import LakeTable, Snapshot, TableSchema

_WIDENINGS = {
    ("int", "bigint"),
    ("int", "long"),
    ("smallint", "int"),
    ("smallint", "bigint"),
    ("float", "double"),
    ("array<int>", "array<bigint>"),
}


class SchemaEvolutionError(ValueError):
    pass


def evolved_schema(current: TableSchema, change_json: str) -> TableSchema:
    """Pure function: current schema + change event -> new schema. Raises on
    unknown/unsafe changes (those become dirty records upstream)."""
    change = json.loads(change_json)
    fields = list(current.fields)
    names = {n for n, _ in fields}
    if "add_column" in change:
        spec = change["add_column"]
        name, typ = spec["name"], spec["type"]
        if name in names:
            raise SchemaEvolutionError(f"column {name!r} already exists")
        fields.append((name, typ))
    elif "widen" in change:
        spec = change["widen"]
        name, to = spec["name"], spec["to"]
        hit = [i for i, (n, _) in enumerate(fields) if n == name]
        if not hit:
            raise SchemaEvolutionError(f"column {name!r} not found")
        frm = fields[hit[0]][1]
        if (frm.lower(), to.lower()) not in _WIDENINGS:
            raise SchemaEvolutionError(f"unsafe type change {frm} -> {to}")
        fields[hit[0]] = (name, to)
    else:
        raise SchemaEvolutionError(f"unknown schema change: {change_json}")
    return TableSchema(fields)


def _already_applied(current: TableSchema, change_json: str) -> bool:
    change = json.loads(change_json)
    fields = dict(current.fields)
    if "add_column" in change:
        spec = change["add_column"]
        return fields.get(spec["name"]) == spec["type"]
    if "widen" in change:
        spec = change["widen"]
        return fields.get(spec["name"]) == spec["to"]
    return False


def apply_schema_change(table: LakeTable, change_json: str) -> Snapshot | None:
    """Commit the evolved schema as a snapshot (no data files touched).
    Idempotent: re-applying a change the schema already reflects (crash/replay
    path) is a no-op, same as re-running Iceberg ``ADD COLUMN IF NOT EXISTS``."""
    current = table.snapshot().schema()
    if _already_applied(current, change_json):
        return None
    new_schema = evolved_schema(current, change_json)
    return table.commit(
        [],
        replace_buckets=None,
        summary_update={"schema_change": change_json},
        schema_update=new_schema,
    )
