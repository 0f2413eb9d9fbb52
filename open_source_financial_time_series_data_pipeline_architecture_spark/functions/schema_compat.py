"""F8 — schema compatibility checker (backward / forward).

Re-implements the reference's Avro compat gate
(/root/reference/src/kafka/schema_compatibility.py:22-151, 185-222) over
Spark ``StructType`` schemas, pure Python (no session needed):

- **backward** (new reader, old data): every field added by the new
  schema must be nullable or carry a default; type changes must be
  widening promotions.
- **forward** (old reader, new data): the new schema may not remove
  fields the old one requires, nor change their types beyond promotion.

Promotion lattice (same as Avro's): int → long → float → double;
string ↔ binary.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

_PROMOTIONS: dict[str, set[str]] = {
    "integer": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"binary"},
    "binary": {"string"},
    "short": {"integer", "long", "float", "double"},
    "byte": {"short", "integer", "long", "float", "double"},
}


def _can_promote(old: T.DataType, new: T.DataType) -> bool:
    if old == new:
        return True
    return new.typeName() in _PROMOTIONS.get(old.typeName(), set())


@dataclass
class CompatReport:
    compatible: bool
    errors: list[str] = field(default_factory=list)


def check_backward(old: T.StructType, new: T.StructType) -> CompatReport:
    """Can a reader of `new` read data written with `old`?"""
    errors: list[str] = []
    old_fields = {f.name: f for f in old.fields}
    for nf in new.fields:
        of = old_fields.get(nf.name)
        if of is None:
            if not nf.nullable and "default" not in (nf.metadata or {}):
                errors.append(
                    f"added field '{nf.name}' is non-nullable and has no default"
                )
        elif not _can_promote(of.dataType, nf.dataType):
            errors.append(
                f"field '{nf.name}': {of.dataType.simpleString()} cannot be read as "
                f"{nf.dataType.simpleString()}"
            )
    return CompatReport(not errors, errors)


def check_forward(old: T.StructType, new: T.StructType) -> CompatReport:
    """Can a reader of `old` read data written with `new`?"""
    errors: list[str] = []
    new_fields = {f.name: f for f in new.fields}
    for of in old.fields:
        nf = new_fields.get(of.name)
        if nf is None:
            if not of.nullable and "default" not in (of.metadata or {}):
                errors.append(
                    f"removed field '{of.name}' is required by the old schema"
                )
        elif not _can_promote(nf.dataType, of.dataType):
            errors.append(
                f"field '{of.name}': {nf.dataType.simpleString()} cannot be read as "
                f"{of.dataType.simpleString()}"
            )
    return CompatReport(not errors, errors)


def check_full(old: T.StructType, new: T.StructType) -> CompatReport:
    b = check_backward(old, new)
    f = check_forward(old, new)
    return CompatReport(b.compatible and f.compatible, b.errors + f.errors)
