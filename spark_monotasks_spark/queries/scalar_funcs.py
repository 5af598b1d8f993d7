"""Scalar-function-surface catalog entries (SURVEY §2.8 tail).

The reference's effective function surface was the Hive builtin registry
(hiveUdfs.scala:60-69); functions/registry.py maps those names to
pyspark.sql.functions.  These entries execute the breadth of that map —
math, bitwise, string manipulation, array/map builtins — against DuckDB
oracles, so the registry isn't just a name table but an executed,
value-checked surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_monotasks_spark.queries.registry import register
from spark_monotasks_spark.tables import load_tables


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir)


@register(
    "math_funcs",
    oracle="""
    SELECT o_orderkey,
           round(exp(o_totalprice / 500000.0), 6)   AS e_x,
           round(ln(o_totalprice), 6)               AS ln_x,
           round(log10(o_totalprice), 6)            AS log10_x,
           round(pow(o_totalprice, 0.5), 6)         AS sqrt_x,
           round(sin(o_orderkey % 7), 6)            AS sin_k,
           round(atan(o_orderkey % 7), 6)           AS atan_k,
           CAST(sign(o_totalprice - 150000.0) AS INT) AS sgn,
           round(degrees(1.0), 6)                   AS deg1
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math builtins (Hive-registry reached; SURVEY §2.8 notes the fork
    has no native trig/log — users got them via Hive)."""
    t = _t(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.round(F.exp(F.col("o_totalprice") / 500000.0), 6).alias("e_x"),
        F.round(F.log(F.col("o_totalprice")), 6).alias("ln_x"),
        F.round(F.log10("o_totalprice"), 6).alias("log10_x"),
        F.round(F.pow("o_totalprice", F.lit(0.5)), 6).alias("sqrt_x"),
        F.round(F.sin(F.col("o_orderkey") % 7), 6).alias("sin_k"),
        F.round(F.atan(F.col("o_orderkey") % 7), 6).alias("atan_k"),
        F.signum(F.col("o_totalprice") - 150000.0).cast("int").alias("sgn"),
        F.round(F.degrees(F.lit(1.0)), 6).alias("deg1"),
    )


@register(
    "bitwise_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255                          AS band,
           l_orderkey | 4096                         AS bor,
           xor(l_orderkey, l_linenumber)             AS bxor,
           ~l_orderkey                               AS bnot,
           l_orderkey << 2                           AS shl,
           l_orderkey >> 1                           AS shr
    FROM lineitem WHERE l_orderkey <= 500
    """,
)
def bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expressions (arithmetic.scala: BitwiseAnd :234, BitwiseOr
    :255, BitwiseXor :276, BitwiseNot :297) + shifts."""
    t = _t(spark, sf_dir)
    l = t["lineitem"].filter(F.col("l_orderkey") <= 500)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").bitwiseAND(255).alias("band"),
        F.col("l_orderkey").bitwiseOR(4096).alias("bor"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_linenumber").cast("long")).alias("bxor"),
        F.bitwise_not(F.col("l_orderkey")).alias("bnot"),
        F.shiftleft(F.col("l_orderkey"), 2).alias("shl"),
        F.shiftright(F.col("l_orderkey"), 1).alias("shr"),
    )


@register(
    "string_funcs2",
    oracle="""
    SELECT c_custkey,
           lpad(c_name, 30, '*')                      AS padded,
           rpad(c_mktsegment, 12, '.')                AS rpadded,
           reverse(c_mktsegment)                      AS rev,
           instr(c_name, '1')                         AS pos1,
           repeat(substring(c_mktsegment, 1, 2), 3)   AS rep,
           translate(c_mktsegment, 'AEIOU', 'aeiou')  AS xlat,
           concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS joined
    FROM customer WHERE c_custkey <= 300
    """,
)
def string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-builtin tail (Hive registry: lpad/rpad/reverse/instr/
    repeat/translate/concat_ws — none native in the fork)."""
    t = _t(spark, sf_dir)
    c = t["customer"].filter(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        F.lpad("c_name", 30, "*").alias("padded"),
        F.rpad("c_mktsegment", 12, ".").alias("rpadded"),
        F.reverse("c_mktsegment").alias("rev"),
        F.instr("c_name", "1").cast("long").alias("pos1"),
        F.repeat(F.substring("c_mktsegment", 1, 2), 3).alias("rep"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("xlat"),
        F.concat_ws("-", "c_mktsegment", F.col("c_custkey").cast("string")).alias(
            "joined"
        ),
    )


@register(
    "hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text)                           AS h_md5,
           sha256(text)                        AS h_sha256,
           to_base64(encode(substring(text, 1, 12))) AS b64,
           ascii(text)                         AS first_cp,
           hex(doc_id)                         AS k_hex
    FROM documents WHERE doc_id < 100
    """,
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/encoding builtins (Hive registry: md5/sha2/base64/ascii/hex).
    DuckDB's hex(long) matches Spark's unpadded uppercase form."""
    t = _t(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("h_md5"),
        F.sha2(F.col("text").cast("binary"), 256).alias("h_sha256"),
        F.base64(F.substring("text", 1, 12).cast("binary")).alias("b64"),
        F.ascii("text").alias("first_cp"),
        F.hex(F.col("doc_id")).alias("k_hex"),
    )


@register(
    "array_map_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           array_to_string(list_sort([l_quantity, l_discount, l_tax]), ',')
                                                            AS arr_sorted,
           list_contains([l_returnflag, l_linestatus], 'N') AS has_n,
           len([l_quantity, l_discount])                    AS arr_len,
           [l_quantity, l_discount][2]                      AS second,
           array_to_string(list_slice([l_quantity, l_discount, l_tax], 1, 2), ',')
                                                            AS sliced,
           map_keys(map(['q'], [l_quantity]))[1]            AS mkey,
           map_values(map(['q'], [l_quantity]))[1]          AS mval
    FROM lineitem WHERE l_orderkey <= 200
    """,
)
def array_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/map builtin tail (complexTypes.scala + Hive registry:
    sort_array, array_contains, size, element_at, slice, map_keys,
    map_values)."""
    t = _t(spark, sf_dir)
    l = t["lineitem"].filter(F.col("l_orderkey") <= 200)
    arr3 = F.array("l_quantity", "l_discount", "l_tax")
    arr2 = F.array("l_quantity", "l_discount")
    mp = F.create_map(F.lit("q"), F.col("l_quantity"))
    return l.select(
        "l_orderkey",
        "l_linenumber",
        # array outputs serialized to comma strings (scalar-only catalog
        # schema contract — see test_catalog_schemas_scalar_only)
        F.array_join(F.sort_array(arr3), ",").alias("arr_sorted"),
        F.array_contains(F.array("l_returnflag", "l_linestatus"), "N").alias("has_n"),
        F.size(arr2).cast("long").alias("arr_len"),
        F.element_at(arr2, 2).alias("second"),
        F.array_join(F.slice(arr3, 1, 2), ",").alias("sliced"),
        F.element_at(F.map_keys(mp), 1).alias("mkey"),
        F.element_at(F.map_values(mp), 1).alias("mval"),
    )


@register(
    "conditional_funcs",
    oracle="""
    SELECT c_custkey,
           greatest(c_acctbal, 0.0)                          AS bal_floor,
           least(c_acctbal, 5000.0)                          AS bal_cap,
           nullif(c_mktsegment, 'MACHINERY')                 AS seg_nz,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'M?') AS seg_nvl,
           CASE WHEN c_acctbal >= 0 THEN 'ok' ELSE 'neg' END AS flag
    FROM customer WHERE c_custkey <= 400
    """,
)
def conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """greatest/least (MaxOf arithmetic.scala:327 family), nullif/nvl
    (nullFunctions.scala), if/case (predicates.scala:322,:366)."""
    t = _t(spark, sf_dir)
    c = t["customer"].filter(F.col("c_custkey") <= 400)
    seg_nz = F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))
    return c.select(
        "c_custkey",
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor"),
        F.least("c_acctbal", F.lit(5000.0)).alias("bal_cap"),
        seg_nz.alias("seg_nz"),
        F.coalesce(seg_nz, F.lit("M?")).alias("seg_nvl"),
        F.when(F.col("c_acctbal") >= 0, "ok").otherwise("neg").alias("flag"),
    )


@register(
    "regexp_funcs",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([1-9][0-9]*)$', 1)          AS name_num,
           CAST(regexp_matches(c_name, '[02468]$') AS INTEGER)  AS even_end,
           regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g')    AS seg_scrub
    FROM customer WHERE c_custkey <= 500
    """,
)
def regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp builtins (Hive registry: regexp_extract / regexp_replace /
    rlike — hiveUdfs.scala registry rows).  RE2-compatible patterns so
    Spark's java.util.regex and the oracle's re2 agree; note Spark
    regexp_replace is replace-ALL (DuckDB needs the 'g' flag)."""
    t = _t(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_custkey") <= 500)
        .select(
            "c_custkey",
            F.regexp_extract("c_name", r"([1-9][0-9]*)$", 1).alias("name_num"),
            F.col("c_name").rlike("[02468]$").cast("int").alias("even_end"),
            F.regexp_replace("c_mktsegment", "[AEIOU]", "_").alias("seg_scrub"),
        )
    )


@register(
    "string_distance_funcs",
    oracle="""
    SELECT c_custkey,
           levenshtein(c_name, 'Customer#000000001') AS lev_to_first,
           CAST(length(c_name) - length(replace(c_name, '0', '')) AS INT)
             AS n_zeros,
           upper(substring(c_mktsegment, 1, 1))
             || lower(substring(c_mktsegment, 2)) AS seg_title,
           split_part(c_name, '#', 2) AS cust_num
    FROM customer WHERE c_custkey <= 300
    """,
)
def string_distance_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-distance + casing tail (Hive registry: levenshtein,
    initcap; stringOperations.scala family): edit distance to a fixed
    key — the fuzzy-match primitive record linkage uses — plus
    occurrence counting via replace-length and delimiter extraction
    (split_part/element_at parity)."""
    t = _t(spark, sf_dir)
    c = t["customer"].filter(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        F.levenshtein("c_name", F.lit("Customer#000000001")).alias("lev_to_first"),
        (F.length("c_name") - F.length(F.replace(F.col("c_name"), F.lit("0"))))
        .cast("int")
        .alias("n_zeros"),
        F.initcap(F.lower("c_mktsegment")).alias("seg_title"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("cust_num"),
    )


@register(
    "url_parse_funcs",
    oracle="""
    WITH u AS (
      SELECT o_orderkey,
             'https://shop.example.com/orders/' || o_orderkey
               || '/items?status=' || o_orderstatus
               || '&prio=' || replace(o_orderpriority, ' ', '_') AS url
      FROM orders WHERE o_orderkey <= 2000
    )
    SELECT o_orderkey,
           'https'                                        AS protocol,
           'shop.example.com'                             AS host,
           '/orders/' || o_orderkey || '/items'           AS path,
           'status=' || (SELECT o_orderstatus FROM orders oo
                         WHERE oo.o_orderkey = u.o_orderkey)
             || '&prio=' || (SELECT replace(o_orderpriority, ' ', '_')
                             FROM orders oo
                             WHERE oo.o_orderkey = u.o_orderkey) AS query,
           (SELECT replace(o_orderpriority, ' ', '_') FROM orders oo
            WHERE oo.o_orderkey = u.o_orderkey)           AS prio
    FROM u
    """,
)
def url_parse_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url (Hive GenericUDFParseUrl; reference
    HiveCompatibilitySuite.scala:888 udf_parse_url): PROTOCOL / HOST /
    PATH / QUERY / QUERY:key extraction.  The URL is constructed from
    order columns, so the oracle states the expected parts
    independently — the parser must give back exactly what was
    assembled."""
    t = _t(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") <= 2000)
    url = F.concat(
        F.lit("https://shop.example.com/orders/"),
        F.col("o_orderkey").cast("string"),
        F.lit("/items?status="),
        F.col("o_orderstatus"),
        F.lit("&prio="),
        # space in '4-NOT SPECIFIED' makes the whole URI invalid ->
        # parse_url returns NULL for every part; sanitize it first
        F.translate(F.col("o_orderpriority"), " ", "_"),
    )
    return o.select(
        "o_orderkey",
        F.parse_url(url, F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("prio")).alias("prio"),
    )


@register(
    "xpath_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderkey                                   AS xp_key,
           o_orderpriority                              AS xp_prio,
           round(CAST(o_totalprice AS DOUBLE), 2)       AS xp_price,
           o_orderkey || ',' || o_orderstatus           AS xp_texts,
           o_orderstatus = 'O'                          AS xp_is_open
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def xpath_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath extraction family (Hive UDFXPath*; reference
    HiveCompatibilitySuite.scala:938-945 udf_xpath..udf_xpath_string):
    xpath_int / xpath_string / xpath_double / node-list xpath /
    xpath_boolean over an XML document assembled from order columns —
    the oracle states the expected values straight from the source
    columns, so the XML build+parse roundtrip is fully value-checked."""
    t = _t(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") <= 2000)
    xml = F.concat(
        F.lit("<order><key>"),
        F.col("o_orderkey").cast("string"),
        F.lit("</key><status>"),
        F.col("o_orderstatus"),
        F.lit("</status><prio>"),
        F.col("o_orderpriority"),
        F.lit("</prio><price>"),
        F.round(F.col("o_totalprice").cast("double"), 2).cast("string"),
        F.lit("</price></order>"),
    )
    return o.select(
        "o_orderkey",
        F.xpath_int(xml, F.lit("/order/key")).alias("xp_key"),
        F.xpath_string(xml, F.lit("/order/prio")).alias("xp_prio"),
        F.round(F.xpath_double(xml, F.lit("/order/price")), 2).alias("xp_price"),
        F.array_join(
            F.xpath(xml, F.lit("/order/key/text()|/order/status/text()")), ","
        ).alias("xp_texts"),
        F.xpath_boolean(xml, F.lit("/order/status='O'")).alias("xp_is_open"),
    )


@register(
    "str_to_map_funcs",
    oracle="""
    SELECT c_custkey,
           c_mktsegment                   AS seg,
           CAST(c_nationkey AS VARCHAR)   AS nat,
           'nat,seg'                      AS keys_sorted,
           2                              AS n_entries
    FROM customer WHERE c_custkey <= 300
    """,
)
def str_to_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str_to_map (Hive GenericUDFStringToMap, reached by name through
    the reference's Hive registry): parse 'k:v,k:v' strings into a map,
    then typed value access + key enumeration + cardinality — the
    round-trip from columns through a serialized kv-string back to the
    same values, stated independently by the oracle.  Output stays
    scalar-only (map values extracted, keys joined)."""
    t = _t(spark, sf_dir)
    c = t["customer"].filter(F.col("c_custkey") <= 300)
    kv = F.concat(
        F.lit("seg:"),
        F.col("c_mktsegment"),
        F.lit(",nat:"),
        F.col("c_nationkey").cast("string"),
    )
    m = F.str_to_map(kv, F.lit(","), F.lit(":"))
    return c.select(
        "c_custkey",
        m.getItem("seg").alias("seg"),
        m.getItem("nat").alias("nat"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.size(m).alias("n_entries"),
    )


@register(
    "sentences_split",
    oracle="""
    SELECT o_orderkey,
           2                                            AS n_sentences,
           'Order ' || o_orderkey || ' is ' || o_orderstatus AS first_tokens,
           'Priority ' || replace(replace(o_orderpriority, ' ', ''), '-', ' ')
             AS second_tokens
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def sentences_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sentences (Hive GenericUDFSentences, reached by name through the
    reference's Hive registry; HiveCompatibilitySuite udf_sentences):
    locale-aware sentence/word segmentation.  The text is assembled
    from order columns with unambiguous '.'-terminated sentences, so
    the expected segmentation is stated independently by the oracle —
    BreakIterator must find exactly the two sentences that were
    assembled and tokenize them back to the source words (hyphens are
    word boundaries: '1-URGENT' → '1 URGENT', which the oracle states).
    Output is scalar-only (token arrays re-joined with spaces)."""
    t = _t(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") <= 1000)
    txt = F.concat(
        F.lit("Order "),
        F.col("o_orderkey").cast("string"),
        F.lit(" is "),
        F.col("o_orderstatus"),
        F.lit(". Priority "),
        # '4-NOT SPECIFIED' would split into two words; collapse spaces
        # so each sentence's token list is closed-form
        F.translate(F.col("o_orderpriority"), " ", ""),
        F.lit("."),
    )
    s = F.sentences(txt)
    return o.select(
        "o_orderkey",
        F.size(s).alias("n_sentences"),
        F.array_join(s.getItem(0), " ").alias("first_tokens"),
        F.array_join(s.getItem(1), " ").alias("second_tokens"),
    )


@register(
    "map_higher_order_funcs",
    oracle="""
    SELECT c_custkey,
           round(CAST(c_acctbal AS DOUBLE) * 2, 2)       AS bal_scaled,
           'BAL,KEY'                                     AS upper_keys,
           (CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)
             + (CASE WHEN c_custkey > 0 THEN 1 ELSE 0 END) AS n_positive,
           round(CAST(c_acctbal AS DOUBLE) + c_custkey, 2) AS zipped_sum
    FROM customer WHERE c_custkey <= 300
    """,
)
def map_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order lambdas (transform_values / transform_keys /
    map_filter / map_zip_with — the map side of the array lambda family
    in `higher_order_funcs`): each step's expected effect is stated
    closed-form from the source columns.  Output stays scalar-only
    (values extracted by key, key sets joined)."""
    t = _t(spark, sf_dir)
    c = t["customer"].filter(F.col("c_custkey") <= 300)
    m = F.create_map(
        F.lit("bal"),
        F.col("c_acctbal").cast("double"),
        F.lit("key"),
        F.col("c_custkey").cast("double"),
    )
    # *2 is exact in binary floating point — *1.1 lands round() on a
    # half-ulp boundary where Spark and DuckDB tie-break differently
    scaled = F.transform_values(m, lambda k, v: v * 2)
    upperk = F.transform_keys(m, lambda k, v: F.upper(k))
    positive = F.map_filter(m, lambda k, v: v > 0)
    zipped = F.map_zip_with(m, m, lambda k, v1, v2: v1 + v2)
    return c.select(
        "c_custkey",
        F.round(scaled.getItem("bal"), 2).alias("bal_scaled"),
        F.array_join(F.array_sort(F.map_keys(upperk)), ",").alias("upper_keys"),
        F.size(positive).alias("n_positive"),
        # map_zip_with(m, m, +) doubles... state via bal+key instead:
        F.round(
            F.map_zip_with(
                m,
                F.create_map(
                    F.lit("bal"), F.col("c_custkey").cast("double"),
                    F.lit("key"), F.col("c_acctbal").cast("double"),
                ),
                lambda k, v1, v2: v1 + v2,
            ).getItem("bal"),
            2,
        ).alias("zipped_sum"),
    )


@register(
    "from_xml_typed",
    oracle="""
    SELECT o_orderkey,
           o_orderkey        AS x_key,
           o_orderstatus     AS x_status,
           round(CAST(o_totalprice AS DOUBLE), 2) AS x_price
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def from_xml_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_xml typed struct parsing (Spark 4 native XML — the schema-
    ful successor of the xpath extraction family in `xpath_funcs`): an
    XML document assembled from order columns parses back into a typed
    struct whose fields must equal the source columns (stated by the
    oracle).  Scalar-only output (struct fields projected)."""
    t = _t(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") <= 1000)
    xml = F.concat(
        F.lit("<o><key>"),
        F.col("o_orderkey").cast("string"),
        F.lit("</key><status>"),
        F.col("o_orderstatus"),
        F.lit("</status><price>"),
        F.round(F.col("o_totalprice").cast("double"), 2).cast("string"),
        F.lit("</price></o>"),
    )
    parsed = F.from_xml(
        xml, "STRUCT<key: BIGINT, status: STRING, price: DOUBLE>"
    )
    return o.select(
        "o_orderkey",
        parsed.getField("key").alias("x_key"),
        parsed.getField("status").alias("x_status"),
        F.round(parsed.getField("price"), 2).alias("x_price"),
    )
