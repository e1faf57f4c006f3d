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
  * ``{"rename_column": {"name": ..., "to": ...}}`` — metadata-only; old
    files resolve the new name back through the per-version rename log
    (``TableSchema.renames``; chained renames compose). The table key
    cannot be renamed (its name is load-bearing in ``_meta.json``).
  * ``{"drop_column": {"name": ...}}``              — metadata-only; old
    files' column is simply not selected. Re-ADDING a name that any
    HISTORICAL schema carried is rejected (``apply_schema_change``): with
    name-based resolution the old files' bytes would silently resurrect
    under the new column — Iceberg prevents this with field ids, we
    prevent it by construction.

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


def evolved_schema(
    current: TableSchema, change_json: str, key: str | None = None
) -> TableSchema:
    """Pure function: current schema + change event -> new schema. Raises on
    unknown/unsafe changes (those become dirty records upstream). ``key``:
    the table key column, protected from rename/drop when given."""
    change = json.loads(change_json)
    fields = list(current.fields)
    names = {n for n, _ in fields}
    if "rename_column" in change:
        spec = change["rename_column"]
        name, to = spec["name"], spec["to"]
        if name not in names:
            raise SchemaEvolutionError(f"column {name!r} not found")
        if to in names:
            raise SchemaEvolutionError(f"column {to!r} already exists")
        if key is not None and name == key:
            raise SchemaEvolutionError("cannot rename the table key column")
        return TableSchema(
            [(to if n == name else n, t) for n, t in fields],
            renames={to: name},  # only THIS version's rename is recorded here
        )
    if "drop_column" in change:
        name = change["drop_column"]["name"]
        if name not in names:
            raise SchemaEvolutionError(f"column {name!r} not found")
        if key is not None and name == key:
            raise SchemaEvolutionError("cannot drop the table key column")
        return TableSchema([(n, t) for n, t in fields if n != name])
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
    if "rename_column" in change:
        spec = change["rename_column"]
        return spec["to"] in fields and spec["name"] not in fields
    if "drop_column" in change:
        return change["drop_column"]["name"] not in fields
    return False


def apply_schema_change(table: LakeTable, change_json: str) -> Snapshot | None:
    """Commit the evolved schema as a snapshot (no data files touched).
    Idempotent: re-applying a change the schema already reflects (crash/replay
    path) is a no-op, same as re-running Iceberg ``ADD COLUMN IF NOT EXISTS``."""
    snap = table.snapshot()
    current = snap.schema()
    if _already_applied(current, change_json):
        return None
    new_schema = evolved_schema(current, change_json, key=table.meta()["key"])
    # resurrect guard: a NEW name (add_column target or rename target) that
    # any HISTORICAL schema carried would, under name-based resolution, pull
    # the old files' bytes into the new column. Iceberg prevents this with
    # field ids; we reject the collision outright.
    change = json.loads(change_json)
    fresh = (
        change.get("add_column", {}).get("name")
        or change.get("rename_column", {}).get("to")
    )
    if fresh is not None:
        for sid, sch_json in snap.schemas.items():
            if any(f["name"] == fresh for f in sch_json):
                raise SchemaEvolutionError(
                    f"column name {fresh!r} existed in historical schema "
                    f"{sid}; reusing it would resurrect old file data — "
                    "pick a fresh name"
                )
    return table.commit(
        [],
        replace_buckets=None,
        summary_update={"schema_change": change_json},
        schema_update=new_schema,
    )
