"""Function-name registry: reference function surface → pyspark.sql.functions.

The reference's *native* Catalyst expression library is small (SURVEY
§2.8: arithmetic.scala, stringOperations.scala, nullFunctions.scala,
predicates.scala, Cast.scala, complexTypes.scala, generators.scala,
Rand.scala).  Everything else — dates, math, concat/trim, JSON — reached
users through the Hive builtin registry (hive/hiveUdfs.scala:60-69),
which dispatched any Hive UDF by name.  This module maps that *effective*
function surface onto modern, JVM-side `pyspark.sql.functions`, so no
query needs a Python UDF for any reference-reachable function.

All returned callables are Column→Column builders that stay inside
whole-stage codegen — the scale-critical property (no Python round trip).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


#: name → pyspark builder.  Keys are the names a reference user would call
#: (SqlParser.scala:51-113 keywords + the Hive builtins the golden corpus
#: uses, hiveUdfs.scala dispatch).  Values are pyspark.sql.functions
#: callables (JVM expressions, codegen'd).
HIVE_BUILTIN_MAP: dict[str, Callable[..., Column]] = {
    # aggregates (aggregates.scala:93-451)
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "count_distinct": F.count_distinct,
    "approx_count_distinct": F.approx_count_distinct,
    "avg": F.avg,
    "mean": F.avg,
    "sum": F.sum,
    "sum_distinct": F.sum_distinct,
    "first": F.first,
    "last": F.last,
    # arithmetic (arithmetic.scala)
    "abs": F.abs,
    "sqrt": F.sqrt,
    "negative": lambda c: -c,
    "greatest": F.greatest,
    "least": F.least,
    "pmod": F.pmod,
    # strings (stringOperations.scala + Hive builtins)
    "upper": F.upper,
    "ucase": F.upper,
    "lower": F.lower,
    "lcase": F.lower,
    # Hive substr supports the 2-arg to-end form the 3-arg pyspark
    # builder doesn't
    "substr": lambda col, pos, length=None: (
        F.substring(col, pos, length)
        if length is not None
        else F.substring(col, pos, 2147483647)
    ),
    "substring": lambda col, pos, length=None: (
        F.substring(col, pos, length)
        if length is not None
        else F.substring(col, pos, 2147483647)
    ),
    "length": F.length,
    "concat": F.concat,
    "concat_ws": F.concat_ws,
    "trim": F.trim,
    "ltrim": F.ltrim,
    "rtrim": F.rtrim,
    "lpad": F.lpad,
    "rpad": F.rpad,
    "reverse": F.reverse,
    "instr": F.instr,
    "locate": F.locate,
    "repeat": F.repeat,
    "split": F.split,
    "regexp_extract": F.regexp_extract,
    "regexp_replace": F.regexp_replace,
    "translate": F.translate,
    "initcap": F.initcap,
    "format_number": F.format_number,
    # null handling (nullFunctions.scala)
    "coalesce": F.coalesce,
    "isnull": F.isnull,
    "isnotnull": lambda c: c.isNotNull(),
    "nvl": lambda a, b: F.coalesce(a, b),
    "nullif": F.nullif,
    # conditional (predicates.scala:322,:366)
    "if": lambda cond, t, f_: F.when(cond, t).otherwise(f_),
    "when": F.when,
    # complex types (complexTypes.scala)
    "array": F.array,
    "map": F.create_map,
    "struct": F.struct,
    "named_struct": F.named_struct,
    "size": F.size,
    "array_contains": F.array_contains,
    "sort_array": F.sort_array,
    "element_at": F.element_at,
    "get_json_object": F.get_json_object,
    "json_tuple": F.json_tuple,
    "from_json": F.from_json,
    # generators (generators.scala:98)
    "explode": F.explode,
    "posexplode": F.posexplode,
    "explode_outer": F.explode_outer,
    "inline": F.inline,
    # random (Rand.scala)
    "rand": F.rand,
    "randn": F.randn,
    # dates (Hive builtins; no native impl in reference — SURVEY §2.8)
    "year": F.year,
    "quarter": F.quarter,
    "month": F.month,
    "day": F.dayofmonth,
    "dayofmonth": F.dayofmonth,
    "dayofweek": F.dayofweek,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
    "to_date": F.to_date,
    "to_timestamp": F.to_timestamp,
    "date_add": F.date_add,
    "date_sub": F.date_sub,
    "datediff": F.datediff,
    "add_months": F.add_months,
    "last_day": F.last_day,
    "trunc": F.trunc,
    "date_trunc": F.date_trunc,
    "date_format": F.date_format,
    "unix_timestamp": F.unix_timestamp,
    "from_unixtime": F.from_unixtime,
    "current_date": F.current_date,
    "current_timestamp": F.current_timestamp,
    # math (Hive builtins)
    "round": F.round,
    "floor": F.floor,
    "ceil": F.ceil,
    "ceiling": F.ceil,
    "exp": F.exp,
    "ln": F.log,
    "log": F.log,
    "log2": F.log2,
    "log10": F.log10,
    "pow": F.pow,
    "power": F.pow,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "asin": F.asin,
    "acos": F.acos,
    "atan": F.atan,
    "degrees": F.degrees,
    "radians": F.radians,
    "sign": F.signum,
    "signum": F.signum,
    "e": lambda: F.lit(2.718281828459045),
    "pi": lambda: F.lit(3.141592653589793),
    "bin": F.bin,
    "hex": F.hex,
    "unhex": F.unhex,
    "conv": F.conv,
    # hashes / misc
    "hash": F.hash,
    "xxhash64": F.xxhash64,
    "md5": F.md5,
    "sha1": F.sha1,
    "sha2": F.sha2,
    "crc32": F.crc32,
    "base64": F.base64,
    "unbase64": F.unbase64,
    "ascii": F.ascii,
    "monotonically_increasing_id": F.monotonically_increasing_id,
    # URL / XML / map-string builtins (Hive GenericUDFParseUrl,
    # UDFXPath* family, GenericUDFStringToMap, GenericUDFSentences —
    # exercised by the reference's HiveCompatibilitySuite.scala:888
    # udf_parse_url, :938-945 udf_xpath*)
    "parse_url": F.parse_url,
    "xpath": F.xpath,
    "xpath_string": F.xpath_string,
    "xpath_boolean": F.xpath_boolean,
    "xpath_int": F.xpath_int,
    "xpath_long": F.xpath_long,
    "xpath_short": F.xpath_short,
    "xpath_float": F.xpath_float,
    "xpath_double": F.xpath_double,
    "str_to_map": F.str_to_map,
    "sentences": F.sentences,
}


def resolve_function(name: str) -> Callable[..., Any]:
    """Look up a function by (case-insensitive) reference-era name."""
    key = name.lower()
    try:
        return HIVE_BUILTIN_MAP[key]
    except KeyError:
        raise KeyError(
            f"function {name!r} not in the reference-parity registry; "
            f"use pyspark.sql.functions directly for beyond-reference fns"
        ) from None
