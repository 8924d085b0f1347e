"""Table definitions — the reference's table-management surface
(``POST /v1/table/{t}`` create, ``GET /v1/table/{t}`` describe,
``PUT/DELETE .../property/{p}``; docs/rest/README.md:28-158).

A table declares: ``id_type`` (numeric/textual customer ids), typed
properties (``text|int|double|bool``, optional ``is_set`` multi-value,
optional ``is_customer`` profile fact), and ``event_order`` (z-order
priority for same-stamp events, test/test_zorder.h).

Spark-first: the definition compiles to StructType schemas — an event
schema (built-in ``stamp/event/id`` plus non-customer properties;
``is_set`` becomes ``array<T>``) and a customer-profile schema
(``is_customer`` properties keyed by id). No server state: "create"
IS the schema object, "describe" round-trips it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_TYPE_MAP: dict[str, DataType] = {
    "text": StringType(),
    "int": LongType(),
    "double": DoubleType(),
    "bool": BooleanType(),
}

_NAME_RE = re.compile(r"^[a-z_][a-z0-9_]*$")


@dataclass(frozen=True)
class PropertyDef:
    """One table property (docs/rest/README.md:36-45)."""

    name: str
    type: str  # text | int | double | bool
    is_set: bool = False
    is_customer: bool = False

    def __post_init__(self) -> None:
        if not _NAME_RE.match(self.name):
            raise ValueError(
                f"invalid property name {self.name!r}: lowercase "
                "alphanumeric/underscore, not starting with a digit"
            )
        if self.type not in _TYPE_MAP:
            raise ValueError(
                f"invalid type {self.type!r}: one of {sorted(_TYPE_MAP)}"
            )

    def spark_type(self) -> DataType:
        base = _TYPE_MAP[self.type]
        return ArrayType(base) if self.is_set else base


@dataclass(frozen=True)
class TableDef:
    """A table: id type, properties, same-stamp event order, and the
    row-retention settings the reference keeps per table
    (src/table.h:122-124 ``eventMax``/``eventTtl``, serialized as
    ``event_max``/``event_ttl`` in table settings, src/table.cpp:151).
    ``sources.tables.apply_retention`` / ``retention_filter`` consume
    these to run the oloop_cleaner maintenance pass."""

    name: str
    id_type: str = "numeric"  # numeric | textual
    properties: tuple[PropertyDef, ...] = ()
    event_order: tuple[str, ...] = ()
    event_ttl_ms: int = 86_400_000 * 365 * 5  # ref default: 5 years
    event_max: int = 5000  # ref default: newest 5000 rows/person

    def __post_init__(self) -> None:
        if self.id_type not in ("numeric", "textual"):
            raise ValueError("id_type must be 'numeric' or 'textual'")
        if self.event_ttl_ms <= 0 or self.event_max <= 0:
            raise ValueError("event_ttl_ms and event_max must be positive")
        names = [p.name for p in self.properties]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise ValueError(f"duplicate properties: {sorted(dupes)}")

    # -- schema compilation ------------------------------------------
    def id_spark_type(self) -> DataType:
        return LongType() if self.id_type == "numeric" else StringType()

    def event_schema(self) -> StructType:
        """Built-ins (user_id, ts, event_type) + event-level props."""
        fields = [
            StructField("user_id", self.id_spark_type()),
            StructField("ts", TimestampType()),
            StructField("event_type", StringType()),
        ]
        fields += [
            StructField(p.name, p.spark_type())
            for p in self.properties
            if not p.is_customer
        ]
        return StructType(fields)

    def customer_schema(self) -> StructType:
        """Profile facts: one row per customer (broadcast-dim shape)."""
        fields = [StructField("user_id", self.id_spark_type())]
        fields += [
            StructField(p.name, p.spark_type())
            for p in self.properties
            if p.is_customer
        ]
        return StructType(fields)

    # -- property management (PUT/DELETE .../property/{p}) ----------
    def with_property(self, prop: PropertyDef) -> "TableDef":
        others = tuple(p for p in self.properties if p.name != prop.name)
        return replace(self, properties=others + (prop,))

    def drop_property(self, name: str) -> "TableDef":
        return replace(
            self,
            properties=tuple(p for p in self.properties if p.name != name),
        )

    # -- describe (GET /v1/table/{t}) --------------------------------
    def describe(self) -> dict:
        props = []
        for p in self.properties:
            d: dict = {"name": p.name, "type": p.type}
            if p.is_set:
                d["is_set"] = True
            if p.is_customer:
                d["is_customer"] = True
            props.append(d)
        out: dict = {
            "table": self.name,
            "id_type": self.id_type,
            "properties": props,
            # reference settings-key names (src/table.cpp:151-152)
            "event_ttl": self.event_ttl_ms,
            "event_max": self.event_max,
        }
        if self.event_order:
            out["event_order"] = list(self.event_order)
        return out

    @classmethod
    def from_describe(cls, d: dict) -> "TableDef":
        return cls(
            name=d["table"],
            id_type=d.get("id_type", "numeric"),
            properties=tuple(
                PropertyDef(
                    p["name"],
                    p["type"],
                    p.get("is_set", False),
                    p.get("is_customer", False),
                )
                for p in d.get("properties", ())
            ),
            event_order=tuple(d.get("event_order", ())),
            event_ttl_ms=d.get("event_ttl", 86_400_000 * 365 * 5),
            event_max=d.get("event_max", 5000),
        )


# The schema of the driver's events.parquet testdata, as a TableDef.
EVENTS_TABLE = TableDef(
    name="events",
    id_type="numeric",
    properties=(
        PropertyDef("event_id", "int"),
        PropertyDef("value", "double"),
        PropertyDef("props", "text"),
    ),
)
