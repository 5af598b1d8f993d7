"""UserDefinedType support (SURVEY §1.2 — reference
sql/catalyst/.../types/dataTypes.scala:1185 + SQLUserDefinedType.java,
used there for MLlib vectors).

PySpark's ``UserDefinedType`` is the same contract: a Python class maps
to a catalyst ``sqlType`` via serialize/deserialize, rides through any
DataFrame operator as its underlying SQL value, and comes back as the
Python object on collect.  ``Point2D`` is the canonical example (the
reference's test UDT is an MLlib vector — same shape: a typed wrapper
over array<double>).

Scale note: the serialized form IS the columnar value — UDT columns
shuffle/spill/cache as plain arrays, no Python round-trip except at
the createDataFrame/collect boundary and inside explicit UDFs.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, DoubleType, UserDefinedType


class Point2DUDT(UserDefinedType):
    """UDT for :class:`Point2D` — stored as array<double> [x, y]."""

    @classmethod
    def sqlType(cls) -> ArrayType:
        return ArrayType(DoubleType(), False)

    @classmethod
    def module(cls) -> str:
        return "spark_monotasks_spark.functions.udt"

    def serialize(self, obj: "Point2D") -> list[float]:
        return [float(obj.x), float(obj.y)]

    def deserialize(self, datum) -> "Point2D":
        return Point2D(datum[0], datum[1])

    def simpleString(self) -> str:
        return "point2d"


class Point2D:
    """A 2-d point; usable as a DataFrame column value via its UDT."""

    __UDT__ = Point2DUDT()

    def __init__(self, x: float, y: float) -> None:
        self.x = float(x)
        self.y = float(y)

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, Point2D) and other.x == self.x and other.y == self.y
        )

    def __hash__(self) -> int:
        return hash((self.x, self.y))

    def __repr__(self) -> str:
        return f"Point2D({self.x}, {self.y})"
