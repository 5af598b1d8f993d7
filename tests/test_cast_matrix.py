"""Cast.scala:28 matrix (SURVEY §7.4.8): the reference's lenient
(pre-ANSI) cast semantics, table-driven.  session.py pins
spark.sql.ansi.enabled=false precisely so these hold — every row here is
a place ANSI mode would instead throw or differ.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

#: (source literal, source type, target type, expected value)
CASES = [
    # string → numeric: invalid input is NULL, not an error
    ("'42'", "string", "int", 42),
    ("'42.9'", "string", "int", 42),          # truncation via double path
    ("'abc'", "string", "int", None),
    ("'abc'", "string", "double", None),
    ("'1e3'", "string", "double", 1000.0),
    ("' 7 '", "string", "int", 7),            # trimmed
    # double → integral truncates toward zero (DuckDB rounds — §verify)
    ("2.9", "double", "int", 2),
    ("-2.9", "double", "int", -2),
    # numeric → boolean: nonzero is true
    ("0", "int", "boolean", False),
    ("5", "int", "boolean", True),
    # boolean → numeric
    ("true", "boolean", "int", 1),
    ("false", "boolean", "int", 0),
    # string → boolean: t/f/y/n/1/0 forms; junk → NULL
    ("'true'", "string", "boolean", True),
    ("'FALSE'", "string", "boolean", False),
    ("'maybe'", "string", "boolean", None),
    # decimal round-trips
    ("'12.345'", "string", "decimal(6,2)", 12.35),  # rounds half-up
    # timestamp ⇄ double seconds (Cast.scala timestamp⇄double)
    ("timestamp'1970-01-01 00:01:00Z'", "timestamp", "double", 60.0),
    ("90.5", "double", "timestamp",
     datetime.datetime(1970, 1, 1, 0, 1, 30, 500000)),
    # string → date/timestamp; invalid → NULL
    ("'2024-03-05'", "string", "date", datetime.date(2024, 3, 5)),
    ("'not-a-date'", "string", "date", None),
]


@pytest.mark.parametrize("src,src_t,tgt,expected", CASES)
def test_cast_case(spark, src, src_t, tgt, expected):
    row = spark.sql(f"SELECT CAST(CAST({src} AS {src_t}) AS {tgt}) AS v").first()
    got = row.v
    if tgt.startswith("decimal"):
        assert float(got) == pytest.approx(expected)
    elif isinstance(expected, float):
        assert got == pytest.approx(expected)
    else:
        assert got == expected


def test_division_coerces_to_double(spark):
    """HiveTypeCoercion.Division (:530): integer / integer is DOUBLE
    division (1/2 = 0.5), unlike ANSI integer division."""
    r = spark.sql("SELECT 1/2 AS d, 7/2 AS e").first()
    assert r.d == 0.5 and r.e == 3.5


def test_string_number_promotion_arithmetic(spark):
    """PromoteStrings (:230): '1' + 1 works and is double."""
    r = spark.sql("SELECT '1' + 1 AS v").first()
    assert r.v == 2.0 and isinstance(r.v, float)
