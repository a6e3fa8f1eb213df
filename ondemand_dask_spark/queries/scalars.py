"""§2.H — scalar function surface (string / date / math / array / map / json).

The reference applies all of these element-wise from pandas accessors
(`.str`, `.dt`, NumPy ufuncs) blockwise per partition.  Spark has a
native `pyspark.sql.functions` battery for every one of them — each
query here stays entirely inside WholeStageCodegen (no Python UDFs),
so at 100 TB these are pure scan+project pipelines: no shuffle, full
predicate pushdown, and column pruning down to the referenced columns.

Oracle notes (verified against DuckDB 1.0.0 on this machine):
- no `initcap` → emulated with upper(substr..)||substr.. on
  single-word columns where we exercise Spark's initcap;
- no `width_bucket` → binning emulated identically on both sides;
- map extraction `m[k]` yields a LIST → oracle uses `m[k][1]`;
- `dayofweek` is Sunday=0 (Spark Sunday=1) and `isodow` is Monday=1
  (Spark `weekday` Monday=0) → normalized explicitly;
- list_sum over FLOAT[] promotes via explicit CAST to DOUBLE so both
  engines do double arithmetic; results rounded tie-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ondemand_dask_spark.io import load_table
from ondemand_dask_spark.registry import register

_R = 4


def _round(col, r: int = _R):
    # Tie-proof rounding (same trick as the oracle side): nudge off
    # the .5 boundary before rounding so both engines round alike.
    return F.round(col - F.lit(1e-9), r)


# ---------------------------------------------------------------------------
# Strings
# ---------------------------------------------------------------------------


@register(
    "str_case_len",
    oracle="""
    SELECT p_partkey,
           lower(p_type)  AS type_lower,
           upper(p_name)  AS name_upper,
           length(p_name) AS name_len,
           trim(concat('  ', p_brand, ' ')) AS brand_trim,
           upper(substr(p_type, 1, 1)) || lower(substr(p_type, 2)) AS type_initcap
    FROM part
    """,
)
def str_case_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str.lower/upper/len/strip/title — case mapping and length."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_type").alias("type_lower"),
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
        # single-word column: Spark initcap == first-letter capitalization
        F.initcap(F.lower("p_type")).alias("type_initcap"),
    )


@register(
    "str_predicates",
    oracle="""
    SELECT doc_id,
           (text LIKE '%join%')                  AS has_join,
           regexp_matches(text, 'qu[ae]ry')      AS rx_query,
           starts_with(text, 'the')              AS starts_the,
           ends_with(text, 'scan')               AS ends_scan,
           (lang IN ('en', 'fr'))                AS lang_enfr
    FROM documents
    """,
)
def str_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str.contains(regex=False/True) / startswith / endswith / isin."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        t.contains("join").alias("has_join"),
        t.rlike("qu[ae]ry").alias("rx_query"),
        F.startswith(t, F.lit("the")).alias("starts_the"),
        F.endswith(t, F.lit("scan")).alias("ends_scan"),
        F.col("lang").isin("en", "fr").alias("lang_enfr"),
    )


@register(
    "str_replace_extract",
    oracle="""
    SELECT p_partkey,
           replace(p_name, 'widget', 'gadget')            AS renamed,
           regexp_replace(p_name, '[aeiou]', '_', 'g')    AS devoweled,
           regexp_extract(p_brand, 'Brand#([0-9]+)', 1)   AS brand_num,
           translate(p_type, 'AEO', 'aeo')                AS translated
    FROM part
    """,
)
def str_replace_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str.replace (literal + regex), str.extract, translate."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.replace(F.col("p_name"), F.lit("widget"), F.lit("gadget")).alias("renamed"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).alias("brand_num"),
        F.translate("p_type", "AEO", "aeo").alias("translated"),
    )


@register(
    "str_edit_distance",
    oracle="""
    SELECT p_partkey,
           levenshtein(p_name, 'small widget') AS dist_to_probe,
           (levenshtein(p_name, 'small widget') <= 3) AS near_probe
    FROM part
    """,
)
def str_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance — fuzzy string matching for joins /
    dedup blocking on short keys (names, codes)."""
    p = load_table(spark, sf_dir, "part")
    d = F.levenshtein("p_name", F.lit("small widget"))
    return p.select(
        "p_partkey",
        d.alias("dist_to_probe"),
        (d <= 3).alias("near_probe"),
    )


@register(
    "str_pad_concat",
    oracle="""
    SELECT c_custkey,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0')           AS nation_padded,
           rpad(c_mktsegment, 12, '.')                          AS seg_padded,
           concat_ws('|', c_name, c_mktsegment)                 AS joined,
           substr(c_name, 1, 8)                                 AS name_prefix,
           repeat('-', 3) || c_mktsegment                       AS dashed
    FROM customer
    """,
)
def str_pad_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str.pad/zfill, str.cat, str.slice (1-based substring!), repeat."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_padded"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_padded"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.repeat(F.lit("-"), 3), F.col("c_mktsegment")).alias("dashed"),
    )


@register(
    "str_split_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 50
    """,
)
def str_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str.split + explode — string → array → rows.  At scale this is
    the standard tokenization fan-out: narrow op, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") < 50)
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    )


# ---------------------------------------------------------------------------
# Date / time
# ---------------------------------------------------------------------------


@register(
    "array_explode_outer",
    oracle="""
    SELECT doc_id,
           unnest(CASE WHEN len(arr) = 0 THEN [NULL] ELSE arr END) AS token
    FROM (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN []
                  ELSE string_split(text, ' ')[1:3] END AS arr
      FROM documents WHERE doc_id < 100
    )
    """,
)
def array_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer — rows with empty/NULL arrays survive with a
    NULL element (plain explode drops them: the silent row-loss bug
    in fan-out pipelines).  Every 5th doc gets an empty array so the
    two semantics actually differ on this fixture; DuckDB emulates
    with a [NULL] substitution."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    arr = F.when(
        F.col("doc_id") % 5 == 0, F.array().cast("array<string>")
    ).otherwise(F.slice(F.split("text", " "), 1, 3))
    return d.select("doc_id", F.explode_outer(arr).alias("token"))


@register(
    "dt_parts",
    oracle="""
    SELECT event_id,
           year(ts) AS y, month(ts) AS mo, day(ts) AS d,
           hour(ts) AS h, minute(ts) AS mi, second(ts) AS s,
           quarter(ts) AS q, dayofyear(ts) AS doy,
           isodow(ts) - 1 AS weekday_mon0,
           weekofyear(ts) AS iso_week
    FROM events
    """,
)
def dt_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dt.year/month/day/…/dayofweek — component extraction.

    Trap normalized here (SURVEY §2.H): pandas/Spark/DuckDB disagree
    on week-start; we expose Monday=0 (pandas convention) on both
    sides via Spark `weekday` and DuckDB `isodow - 1`.
    """
    e = load_table(spark, sf_dir, "events")
    ts = F.col("ts")
    return e.select(
        "event_id",
        F.year(ts).alias("y"),
        F.month(ts).alias("mo"),
        F.dayofmonth(ts).alias("d"),
        F.hour(ts).alias("h"),
        F.minute(ts).alias("mi"),
        F.second(ts).alias("s"),
        F.quarter(ts).alias("q"),
        F.dayofyear(ts).alias("doy"),
        F.weekday(ts).alias("weekday_mon0"),
        F.weekofyear(ts).alias("iso_week"),
    )


@register(
    "dt_trunc_format",
    oracle="""
    SELECT event_id,
           date_trunc('day', ts)  AS day_bucket,
           date_trunc('hour', ts) AS hour_bucket,
           strftime(ts, '%Y-%m-%d %H:%M') AS formatted,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS just_date
    FROM events
    """,
)
def dt_trunc_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dt.floor / dt.strftime / dt.date — truncation and formatting
    (Java patterns on the Spark side ↔ %-codes in DuckDB)."""
    e = load_table(spark, sf_dir, "events")
    ts = F.col("ts")
    return e.select(
        "event_id",
        F.date_trunc("day", ts).alias("day_bucket"),
        F.date_trunc("hour", ts).alias("hour_bucket"),
        F.date_format(ts, "yyyy-MM-dd HH:mm").alias("formatted"),
        # stringified: pandas renders DuckDB DATE as midnight datetime,
        # so a raw date column would hash-mismatch despite equality.
        F.to_date(ts).cast("string").alias("just_date"),
    )


@register(
    "dt_arith",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 3 DAY              AS plus_3d,
           o_orderdate + INTERVAL 90 MINUTE          AS plus_90min,
           date_diff('day', o_orderdate, TIMESTAMP '2024-07-01') AS days_until_jul,
           CAST(epoch(o_orderdate) AS BIGINT)        AS epoch_s
    FROM orders
    """,
)
def dt_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp arithmetic — Timedelta add, diffs, epoch seconds."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        (d + F.expr("INTERVAL 3 DAY")).alias("plus_3d"),
        (d + F.expr("INTERVAL 90 MINUTE")).alias("plus_90min"),
        F.datediff(F.lit("2024-07-01").cast("date"), F.to_date(d)).alias(
            "days_until_jul"
        ),
        # ntz → tz-aware (session is UTC) → epoch seconds; matches
        # DuckDB epoch() which also treats naive timestamps as UTC.
        d.cast("timestamp").cast("long").alias("epoch_s"),
    )


# ---------------------------------------------------------------------------
# Math
# ---------------------------------------------------------------------------


@register(
    "math_basic",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05)                       AS abs_off,
           round(l_extendedprice - 1e-9, 2)             AS price_r2,
           CAST(floor(l_quantity) AS BIGINT)            AS qty_floor,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_kceil,
           CAST(l_orderkey % 7 AS BIGINT)               AS key_mod7,
           round(power(1 + l_tax, 2) - 1e-9, {_R}) + 0.0      AS tax_sq,
           greatest(least(l_quantity, 40.0), 10.0)      AS qty_clipped
    FROM lineitem
    """,
)
def math_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/round/floor/ceil/mod/power + clip(lo,hi) via greatest∘least."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_off"),
        _round(F.col("l_extendedprice"), 2).alias("price_r2"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_kceil"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        _round(F.pow(F.lit(1) + F.col("l_tax"), 2)).alias("tax_sq"),
        F.greatest(F.least(F.col("l_quantity"), F.lit(40.0)), F.lit(10.0)).alias(
            "qty_clipped"
        ),
    )


@register(
    "math_transcendental",
    oracle=f"""
    SELECT event_id,
           round(exp(value / 100)  - 1e-9, {_R}) + 0.0 AS e_x,
           round(ln(value + 1)     - 1e-9, {_R}) + 0.0 AS ln_x,
           round(log10(value + 1)  - 1e-9, {_R}) + 0.0 AS log10_x,
           round(log2(value + 1)   - 1e-9, {_R}) + 0.0 AS log2_x,
           round(sqrt(abs(value))  - 1e-9, {_R}) + 0.0 AS sqrt_x,
           round(sin(value)        - 1e-9, {_R}) + 0.0 AS sin_x,
           round(cos(value)        - 1e-9, {_R}) + 0.0 AS cos_x
    FROM events
    """,
)
def math_transcendental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NumPy ufunc family — exp/ln/log10/log2/sqrt/sin/cos (IEEE754
    doubles on both engines; rounded tie-proof)."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return e.select(
        "event_id",
        _round(F.exp(v / 100)).alias("e_x"),
        _round(F.log(v + 1)).alias("ln_x"),
        _round(F.log10(v + 1)).alias("log10_x"),
        _round(F.log2(v + 1)).alias("log2_x"),
        _round(F.sqrt(F.abs(v))).alias("sqrt_x"),
        _round(F.sin(v)).alias("sin_x"),
        _round(F.cos(v)).alias("cos_x"),
    )


@register(
    "math_hash",
    oracle="""
    SELECT doc_id,
           md5(text)          AS text_md5,
           sha256(text)       AS text_sha256
    FROM documents
    """,
)
def math_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic cryptographic hashing — md5 / sha2-256 agree
    across engines (xxhash64 / hash do NOT and stay engine-local)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
    )


@register(
    "math_binning",
    oracle="""
    SELECT CAST(CASE WHEN value < 0 THEN -1
                     WHEN value >= 1000 THEN 10
                     ELSE floor(value / 100) END AS BIGINT) AS bucket,
           count(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def math_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.cut — fixed-width binning (width_bucket emulated identically
    on both engines: DuckDB 1.0.0 lacks the builtin)."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    bucket = (
        F.when(v < 0, F.lit(-1))
        .when(v >= 1000, F.lit(10))
        .otherwise(F.floor(v / 100))
        .cast("long")
    )
    return e.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Arrays (split-text and embedding vectors)
# ---------------------------------------------------------------------------


@register(
    "array_basic",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                      AS n_tokens,
           string_split(text, ' ')[1]                        AS first_token,
           string_split(text, ' ')[-1]                       AS last_token,
           list_contains(string_split(text, ' '), 'join')    AS has_join,
           coalesce(array_to_string(string_split(text, ' ')[2:4], ','), '') AS tokens_2_to_4
    FROM documents
    """,
)
def array_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array accessors — size / element_at (1-based, -1 = last) /
    array_contains / slice.  Array outputs are comma-joined at the
    final select: the driver hashes results through pandas, where raw
    array cells are unhashable."""
    d = load_table(spark, sf_dir, "documents")
    arr = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(arr).alias("n_tokens"),
        F.element_at(arr, 1).alias("first_token"),
        F.element_at(arr, -1).alias("last_token"),
        F.array_contains(arr, "join").alias("has_join"),
        F.array_join(F.slice(arr, 2, 3), ",").alias("tokens_2_to_4"),
    )


@register(
    "array_sort_distinct",
    oracle="""
    SELECT doc_id,
           coalesce(array_to_string(
             list_sort(list_distinct(string_split(text, ' '))), ','), '') AS vocab,
           len(list_distinct(string_split(text, ' ')))       AS n_distinct
    FROM documents
    WHERE doc_id < 100
    """,
)
def array_sort_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort_array + array_distinct — per-row set semantics (sorted for
    deterministic hashing, comma-joined for driver hashability)."""
    d = load_table(spark, sf_dir, "documents")
    arr = F.split("text", " ")
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.array_join(F.sort_array(F.array_distinct(arr)), ",").alias("vocab"),
        F.size(F.array_distinct(arr)).alias("n_distinct"),
    )


@register(
    "array_hof",
    oracle=f"""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) - 1e-9, {_R}) + 0.0 AS l2_norm,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))) - 1e-9, {_R}) + 0.0        AS vec_sum
    FROM embeddings
    """,
)
def array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions over array<float> — transform / filter /
    aggregate.  This is the embedding hot path: L2 norm computed
    entirely JVM-side (no Python), the building block for the cosine
    similarity queries in §2.K."""
    e = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vec_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        _round(F.sqrt(sq_sum)).alias("l2_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        _round(vec_sum).alias("vec_sum"),
    )


# ---------------------------------------------------------------------------
# JSON / map / struct / null handling
# ---------------------------------------------------------------------------


@register(
    "json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER)  AS k_int,
           json_extract_string(props, '$.k')            AS k_str,
           (CAST(json_extract(props, '$.k') AS INTEGER) > 50) AS k_big
    FROM events
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar surface — get_json_object / from_json over the
    `props` JSON-string column (types cast explicitly on both sides)."""
    e = load_table(spark, sf_dir, "events")
    k_int = F.get_json_object("props", "$.k").cast("int")
    parsed = F.from_json("props", "k INT")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k_int"),
        F.get_json_object("props", "$.k").alias("k_str"),
        (k_int > 50).alias("k_big"),
    )


@register(
    "map_struct",
    oracle="""
    SELECT event_id,
           (MAP(['type', 'user'], [event_type, CAST(user_id AS VARCHAR)])['type'])[1]
             AS from_map,
           (struct_pack(et := event_type, uid := user_id)).et AS from_struct,
           (struct_pack(et := event_type, uid := user_id)).uid AS struct_uid
    FROM events
    """,
)
def map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType / StructType construction + field access (dict- and
    namedtuple-valued object columns in the reference).  Fields are
    projected back to scalars so the comparison is type-stable."""
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    s = F.struct(F.col("event_type").alias("et"), F.col("user_id").alias("uid"))
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("from_map"),
        s.getField("et").alias("from_struct"),
        s.getField("uid").alias("struct_uid"),
    )


@register(
    "try_ops",
    oracle=f"""
    SELECT event_id,
           round(value / nullif(CAST(floor(value) AS BIGINT) % 3, 0) - 1e-9, {_R}) + 0.0
             AS safe_div,
           TRY_CAST(substr(event_type, 1, 1) AS INTEGER) AS bad_cast,
           TRY_CAST(CAST(user_id AS VARCHAR) AS BIGINT)  AS good_cast
    FROM events
    """,
)
def try_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic — try_divide / try_cast return NULL where
    ANSI mode would raise (÷0, bad casts).  The right default inside
    100 TB pipelines: one malformed row must not kill a 6-hour job."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        # floor, not cast: DuckDB's double→int cast rounds to nearest
        # while Spark truncates — floor is the portable semantics
        F.round(
            F.try_divide("value", F.floor("value") % 3) - 1e-9, _R
        ).alias("safe_div"),
        F.try_to_number(F.substring("event_type", 1, 1), F.lit("9")).cast(
            "int"
        ).alias("bad_cast"),
        F.col("user_id").cast("string").try_cast("bigint").alias("good_cast"),
    )


@register(
    "map_functions",
    oracle="""
    SELECT event_id,
           coalesce(array_to_string(list_sort(map_keys(map_concat(
             MAP(['type', 'val'], [event_type, CAST(value AS VARCHAR)]),
             MAP(['uid'], [CAST(user_id AS VARCHAR)])))), ','), '') AS all_keys,
           cardinality(map_concat(
             MAP(['type', 'val'], [event_type, CAST(value AS VARCHAR)]),
             MAP(['uid'], [CAST(user_id AS VARCHAR)]))) AS n_entries,
           (MAP(['type', 'val'], [event_type, CAST(value AS VARCHAR)])['type'])[1]
             AS type_val
    FROM events
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map accessor family — map_keys / map_concat / size / lookup
    (dict-valued object columns in the reference).  Keys sorted for
    deterministic comparison (map iteration order is unspecified)."""
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("val"), F.col("value").cast("string"),
    )
    m2 = F.map_concat(m, F.create_map(F.lit("uid"), F.col("user_id").cast("string")))
    return e.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m2)), ",").alias("all_keys"),
        F.size(m2).alias("n_entries"),
        F.element_at(m, "type").alias("type_val"),
    )


@register(
    "null_funcs",
    oracle="""
    SELECT event_id,
           nullif(event_type, 'error')                       AS et_nullable,
           coalesce(nullif(event_type, 'error'), '(errored)') AS et_filled,
           (nullif(event_type, 'error') IS NULL)             AS was_error,
           ifnull(nullif(value, 0.0), -1.0)                  AS v_nonzero
    FROM events
    """,
)
def null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isna/notna/fillna/combine_first — SQL NULL semantics (the
    engine's decided convention; never pandas NaN quirks)."""
    e = load_table(spark, sf_dir, "events")
    et_nullable = F.nullif(F.col("event_type"), F.lit("error"))
    return e.select(
        "event_id",
        et_nullable.alias("et_nullable"),
        F.coalesce(et_nullable, F.lit("(errored)")).alias("et_filled"),
        et_nullable.isNull().alias("was_error"),
        F.ifnull(F.nullif(F.col("value"), F.lit(0.0)), F.lit(-1.0)).alias("v_nonzero"),
    )


@register(
    "dt_calendar",
    oracle="""
    SELECT o_orderkey,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR)          AS month_end,
           CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE)
                AS VARCHAR)                                              AS plus_2m,
           date_diff('day',  DATE '1995-01-01',
                     CAST(o_orderdate AS DATE))                          AS days_since_epoch0,
           date_diff('month', DATE '1995-01-01',
                     CAST(o_orderdate AS DATE))                          AS months_since_epoch0
    FROM orders
    """,
)
def dt_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic — dt.is_month_end/last_day, DateOffset
    months (with end-of-month clamping, identical in both engines),
    and boundary-counting day/month diffs.  Month diff is computed as
    (year*12+month) deltas — the same boundary-crossing count DuckDB's
    date_diff('month') uses (Spark's months_between has different,
    fractional semantics).  Dates are cast to string on both sides
    (pandas widens DuckDB DATE to midnight timestamps otherwise)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    months = (F.year(d) - F.lit(1995)) * 12 + (F.month(d) - F.lit(1))
    return o.select(
        "o_orderkey",
        F.last_day(d).cast("string").alias("month_end"),
        F.add_months(d, 2).cast("string").alias("plus_2m"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_epoch0"),
        months.alias("months_since_epoch0"),
    )


@register(
    "agg_mode",
    oracle="""
    WITH c AS (
      SELECT l_returnflag AS v, count(*) AS n FROM lineitem GROUP BY 1
    )
    SELECT v AS mode_returnflag, n AS n_rows
    FROM (SELECT v, n, row_number() OVER (ORDER BY n DESC, v) AS rn FROM c)
    WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ser.mode() — most frequent value.  Built-in `mode()` breaks
    ties arbitrarily in BOTH engines, so the implementation is the
    deterministic count + rank composition (ties → smallest value),
    which is also the shape that scales: a 1-key groupBy plus a
    1-row top-k, never a value collection."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_returnflag").alias("v")).agg(F.count("*").alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("v"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("v").alias("mode_returnflag"), F.col("n").alias("n_rows"))
    )


@register(
    "str_count_occurrences",
    oracle="""
    SELECT doc_id,
           len(string_split(text, 'data')) - 1       AS n_data,
           len(string_split(text, ' ')) - 1          AS n_spaces
    FROM documents
    """,
)
def str_count_occurrences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str.count(pat) — substring occurrence counting.  Spark ≥ 3.5
    has regexp_count but DuckDB 1.0.0 does not, so both sides use the
    engine-portable split-length identity |split(s, pat)| - 1 (exact
    for literal patterns; split with limit -1 keeps trailing empty
    strings, which the identity requires)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        (F.size(F.split(F.col("text"), "data", -1)) - 1).alias("n_data"),
        (F.size(F.split(F.col("text"), " ", -1)) - 1).alias("n_spaces"),
    )


@register(
    "str_char_classes",
    oracle="""
    SELECT p_partkey,
           regexp_matches(p_name,  '^[A-Za-z]+$')  AS name_alpha,
           regexp_matches(p_brand, '[0-9]')        AS brand_has_digit,
           regexp_matches(p_name,  '^[A-Z]')       AS name_starts_upper,
           regexp_matches(p_type,  '^[A-Z ]+$')    AS type_upper
    FROM part
    """,
)
def str_char_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str.isalpha/isdigit/isupper-style character-class predicates —
    anchored regex on both engines (DuckDB regexp_matches is
    unanchored search, so the full-string classes carry explicit
    ^...$ anchors; Spark rlike is identical semantics)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_name").rlike("^[A-Za-z]+$").alias("name_alpha"),
        F.col("p_brand").rlike("[0-9]").alias("brand_has_digit"),
        F.col("p_name").rlike("^[A-Z]").alias("name_starts_upper"),
        F.col("p_type").rlike("^[A-Z ]+$").alias("type_upper"),
    )


_STOPWORDS_SQL = "['the', 'a', 'of', 'and', 'to']"


@register(
    "array_set_ops",
    oracle=f"""
    SELECT doc_id,
           coalesce(array_to_string(list_sort(list_distinct(list_filter(t,
             x -> list_contains({_STOPWORDS_SQL}, x)))), ','), '')     AS stop_hits,
           coalesce(array_to_string(list_sort(list_distinct(list_filter(t,
             x -> NOT list_contains({_STOPWORDS_SQL}, x)))), ','), '') AS content_terms,
           len(list_distinct(list_concat(t, {_STOPWORDS_SQL}))) AS n_union,
           list_has_any(t, {_STOPWORDS_SQL})                 AS has_stopword
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    """,
)
def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra — intersect / except / union-cardinality /
    overlap of each document's token array against a constant
    vocabulary.  Both engines sort + distinct the set results before
    comparison (Spark preserves left-operand order, DuckDB does not —
    set semantics are the contract, order is not)."""
    stop = F.array(*[F.lit(w) for w in ["the", "a", "of", "and", "to"]])
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.array_join(
            F.sort_array(F.array_distinct(F.array_intersect(t, stop))), ","
        ).alias("stop_hits"),
        F.array_join(
            F.sort_array(F.array_distinct(F.array_except(t, stop))), ","
        ).alias("content_terms"),
        F.size(F.array_distinct(F.array_union(t, stop))).alias("n_union"),
        F.arrays_overlap(t, stop).alias("has_stopword"),
    )


@register(
    "str_format",
    oracle="""
    SELECT o_orderkey,
           printf('%s-%05d', o_orderstatus, o_orderkey) AS order_tag,
           printf('%.2f', o_totalprice)                 AS price_str
    FROM orders
    """,
)
def str_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-style string formatting (the str.format / % idiom) —
    format_string on Spark, printf on DuckDB; both delegate to the
    same printf conventions, including %.2f rounding of doubles."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.format_string("%s-%05d", F.col("o_orderstatus"), F.col("o_orderkey")).alias(
            "order_tag"
        ),
        F.format_string("%.2f", F.col("o_totalprice")).alias("price_str"),
    )


@register(
    "math_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255            AS low_byte,
           event_id | 4096           AS with_flag,
           xor(event_id, 21845)      AS xored,
           (event_id & 7) << 4       AS shifted_l,
           event_id >> 8             AS shifted_r,
           CAST(bit_count(CAST(event_id AS BIGINT)) AS INTEGER) AS popcount
    FROM events
    """,
)
def math_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer bitwise algebra (pandas &, |, ^, shifts on int series)
    — the primitive layer under SimHash banding, bloom-filter
    membership, and flag columns.  All JVM-side int64 ops; popcount
    via bit_count on both engines."""
    e = load_table(spark, sf_dir, "events")
    i = F.col("event_id")
    return e.select(
        "event_id",
        i.bitwiseAND(F.lit(255)).alias("low_byte"),
        i.bitwiseOR(F.lit(4096)).alias("with_flag"),
        i.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(i.bitwiseAND(F.lit(7)), 4).alias("shifted_l"),
        F.shiftright(i, 8).alias("shifted_r"),
        F.bit_count(i).alias("popcount"),
    )


@register(
    "json_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract(props, '$.k') AS DOUBLE)  AS k_dbl,
           json_valid(props)                           AS ok
    FROM events
    """,
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json → binary
    variant, typed reads via variant_get.  Unlike get_json_object
    (string re-parse per access), variant parses ONCE at ingest and
    every downstream access is a binary field lookup — the scale
    answer for JSON-heavy event tables (pairs with shredded parquet
    storage as that lands in OSS)."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "double").alias("k_dbl"),
        F.try_parse_json("props").isNotNull().alias("ok"),
    )


@register(
    "str_slice_parse",
    oracle="""
    SELECT event_id,
           substr(event_type, 1, 3)                  AS type3,
           substr(event_type, 2)                     AS type_tail,
           substr(event_type, length(event_type), 1) AS last_char,
           CAST(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
                         '%Y-%m-%d %H:%M:%S') AS VARCHAR) AS ts_roundtrip
    FROM events
    """,
)
def str_slice_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """str.slice / str[i] (1-based substring incl. negative-index
    tail) and pd.to_datetime — format→parse round-trip through
    to_timestamp, the string-ingest path for timestamps."""
    e = load_table(spark, sf_dir, "events")
    t = F.col("event_type")
    return e.select(
        "event_id",
        F.substring(t, 1, 3).alias("type3"),
        F.expr("substring(event_type, 2)").alias("type_tail"),
        F.substring(t, -1, 1).alias("last_char"),
        F.to_timestamp(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss"
        )
        .cast("string")
        .alias("ts_roundtrip"),
    )


@register(
    "array_mutation",
    oracle="""
    SELECT doc_id,
           coalesce(array_to_string(
             list_append(string_split(text, ' '), '<eos>'), ','), '')  AS with_eos,
           coalesce(array_to_string(
             list_prepend('<bos>', string_split(text, ' ')), ','), '') AS with_bos,
           list_position(string_split(text, ' '), 'join')     AS join_pos,
           coalesce(array_to_string(
             list_filter(string_split(text, ' '), t -> t != 'the'), ','), '') AS no_the
    FROM documents WHERE doc_id < 100
    """,
)
def array_mutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array mutation — append/prepend (the BOS/EOS tokenizer idiom),
    1-based position (0 = absent on both engines), remove-all-equal.
    All narrow codegen'd ops; arrays comma-joined at the final select
    for driver hashability."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    arr = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_join(F.array_append(arr, "<eos>"), ",").alias("with_eos"),
        F.array_join(F.array_prepend(arr, "<bos>"), ",").alias("with_bos"),
        F.array_position(arr, "join").cast("int").alias("join_pos"),
        F.array_join(F.array_remove(arr, "the"), ",").alias("no_the"),
    )


@register(
    "dt_boundaries",
    oracle="""
    SELECT event_id,
           CAST(last_day(CAST(ts AS DATE)) AS VARCHAR)           AS month_end,
           CAST(date_trunc('week', CAST(ts AS DATE)) AS VARCHAR) AS week_start,
           CAST(date_trunc('quarter', CAST(ts AS DATE)) AS VARCHAR) AS quarter_start,
           CAST(date_trunc('year', CAST(ts AS DATE)) AS VARCHAR) AS year_start
    FROM events
    """,
)
def dt_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar boundaries — last_day + week/quarter/year truncation
    (pandas Period/offset idioms).  Dates stringified for the
    cross-engine compare; both engines start ISO weeks on Monday."""
    e = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    return e.select(
        "event_id",
        F.last_day(d).cast("string").alias("month_end"),
        F.date_trunc("week", d).cast("date").cast("string").alias("week_start"),
        F.date_trunc("quarter", d).cast("date").cast("string").alias("quarter_start"),
        F.date_trunc("year", d).cast("date").cast("string").alias("year_start"),
    )


@register(
    "json_corrupt_tolerant",
    oracle="""
    WITH synth AS (
      SELECT event_type,
             CASE WHEN event_id % 3 = 0
                  THEN substr(props, 1, len(props) - 1)  -- strip '}' → invalid
                  ELSE props END AS s
      FROM events
    )
    SELECT event_type,
           count(*) AS n_total,
           CAST(sum(CASE WHEN json_valid(s) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_valid,
           CAST(sum(CASE WHEN json_valid(s) THEN 0 ELSE 1 END) AS BIGINT)
             AS n_invalid,
           CAST(sum(CASE WHEN json_valid(s)
                    THEN CAST(json_extract(s, '$.k') AS BIGINT) END) AS BIGINT)
             AS sum_k
    FROM synth GROUP BY event_type
    """,
)
def json_corrupt_tolerant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-JSON tolerance (the PERMISSIVE-mode contract): a
    third of the props payloads are corrupted (truncated brace), and
    the pipeline must classify + skip them without failing the job —
    `get_json_object` returns NULL on unparseable input where DuckDB
    needs an explicit json_valid guard (its extract THROWS — exactly
    the engine difference this query pins down).  Corruption never
    reaches an exception path on either engine; bad rows are counted,
    good rows aggregate."""
    e = load_table(spark, sf_dir, "events")
    s = F.when(
        F.col("event_id") % 3 == 0,
        F.expr("substring(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    k = F.get_json_object(s, "$.k").cast("bigint")
    return e.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0)).alias("n_valid"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_invalid"),
        F.sum("k").alias("sum_k"),
    )


@register(
    "json_normalize_nested",
    oracle="""
    WITH nested AS (
      SELECT event_id,
             '{"meta": {"type": "' || event_type || '", "k": '
               || CAST(json_extract(props, '$.k') AS VARCHAR)
               || '}, "vals": [' || CAST(event_id % 7 AS VARCHAR) || ', '
               || CAST(event_id % 3 AS VARCHAR) || ']}' AS payload
      FROM events
    )
    SELECT event_id,
           json_extract_string(payload, '$.meta.type') AS meta_type,
           CAST(json_extract(payload, '$.meta.k') AS BIGINT) AS meta_k,
           CAST(json_extract(payload, '$.vals[0]') AS BIGINT) AS val0,
           len(CAST(json_extract(payload, '$.vals') AS BIGINT[])) AS n_vals
    FROM nested
    """,
)
def json_normalize_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.json_normalize — nested JSON (object-in-object + array)
    flattened to typed columns.  A nested payload is synthesized from
    the fixture identically on both engines, then parsed ONCE with
    from_json against an explicit nested schema and field-accessed —
    the schema-on-read path (get_json_object per field would re-parse
    the document per column; from_json parses once per row).  All
    codegen, no shuffle."""
    e = load_table(spark, sf_dir, "events")
    payload = F.concat(
        F.lit('{"meta": {"type": "'),
        F.col("event_type"),
        F.lit('", "k": '),
        F.get_json_object("props", "$.k"),
        F.lit('}, "vals": ['),
        (F.col("event_id") % 7).cast("string"),
        F.lit(", "),
        (F.col("event_id") % 3).cast("string"),
        F.lit("]}"),
    )
    schema = "meta STRUCT<type: STRING, k: BIGINT>, vals ARRAY<BIGINT>"
    parsed = e.select(
        "event_id", F.from_json(payload, schema).alias("j")
    )
    return parsed.select(
        "event_id",
        F.col("j.meta.type").alias("meta_type"),
        F.col("j.meta.k").alias("meta_k"),
        F.element_at("j.vals", 1).alias("val0"),
        F.size("j.vals").cast("long").alias("n_vals"),
    )


@register(
    "str_collation_distinct",
    oracle="""
    WITH toks AS (
      SELECT CASE WHEN doc_id % 2 = 0
                  THEN upper(string_split(text, ' ')[1])
                  ELSE string_split(text, ' ')[1] END AS tok
      FROM documents
    )
    SELECT count(DISTINCT tok) AS n_binary_distinct,
           count(DISTINCT lower(tok)) AS n_lcase_distinct,
           count(DISTINCT tok) - count(DISTINCT lower(tok))
             AS n_case_only_variants
    FROM toks
    """,
)
def str_collation_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware distinct (Spark 4 collations): the lead token
    of each document — upper-cased for half the corpus to synthesize
    case variants — counted distinct under BINARY (UTF8_BINARY)
    vs case-insensitive (UTF8_LCASE) collation.  The gap is the
    case-only-variant vocabulary, the quantity a dedup or join-key
    normalization decision needs BEFORE choosing whether keys must
    be case-folded.  Spark's native collated comparison replaces the
    lower() rewrite the oracle uses as its independent spec (DuckDB
    1.x collations don't compose with count DISTINCT, so the oracle
    folds explicitly — same semantics for ASCII tokens).

    Scale shape: one distinct-aggregate over the token projection —
    the collated distinct runs entirely JVM-side with collation-
    aware hashing, no UDF, no second scan for the folded count
    (both distincts share one Expand)."""
    d = load_table(spark, sf_dir, "documents")
    lead = F.split("text", " ").getItem(0)
    tok = F.when(F.col("doc_id") % 2 == 0, F.upper(lead)).otherwise(lead)
    t = d.select(tok.alias("tok"))
    return t.agg(
        F.count_distinct("tok").alias("n_binary_distinct"),
        F.count_distinct(F.collate(F.col("tok"), "UTF8_LCASE")).alias(
            "n_lcase_distinct"
        ),
        (
            F.count_distinct("tok")
            - F.count_distinct(F.collate(F.col("tok"), "UTF8_LCASE"))
        ).alias("n_case_only_variants"),
    )


@register(
    "array_posexplode_zip",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ') AS words
      FROM documents WHERE doc_id % 50 = 0
    )
    SELECT doc_id,
           CAST(i - 1 AS INT) AS pos,
           words[i] AS word,
           CASE WHEN i < len(words) THEN words[i + 1] END AS next_word,
           CAST(length(words[i]) AS INT) AS word_len
    FROM t, unnest(generate_series(1, len(words))) u(i)
    """,
)
def array_posexplode_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode with a self-zip: each word of the document
    paired with its POSITION and its successor — the ordered-explode
    shape behind n-gram builders and positional tokenization
    (explode alone loses order; posexplode keeps the index, and the
    successor lookup is element_at on the SAME array, not a
    window or self-join).

    Scale shape: pure codegen Generate (posexplode) + element_at —
    the row multiplier is document length, no shuffle, no window;
    at 100 TB this is the scan-shaped stage every token pipeline
    starts with.  A 1-in-50 document sample keeps the differential
    result compact without changing the shape."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0
    )
    t = d.select("doc_id", F.split("text", " ").alias("words"))
    ex = t.select(
        "doc_id",
        "words",
        F.posexplode("words").alias("pos", "word"),
    )
    return ex.select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        "word",
        F.try_element_at("words", F.col("pos") + 2).alias("next_word"),
        F.length("word").cast("int").alias("word_len"),
    )


@register(
    "str_extractall",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(ms, 1) - 1 AS BIGINT) AS match_idx,
           unnest(ms) AS match
    FROM (
      SELECT doc_id, regexp_extract_all(text, '(s[a-z]+)') AS ms
      FROM documents WHERE doc_id < 100
    )
    WHERE len(ms) > 0
    """,
)
def str_extractall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ser.str.extractall(pat) — EVERY regex match per row, exploded
    to (row, match_index, match) exactly like pandas' MultiIndex
    result (Dask inherits it verbatim): here all 's…' words per
    document.  The sibling of str_replace_extract (which keeps only
    the FIRST match — the silent-data-loss trap when a migrator
    reaches for extract instead of extractall).  regexp_extract_all
    + posexplode: narrow codegen op, no shuffle, rows with zero
    matches drop exactly as pandas drops them from the MultiIndex."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.posexplode(
                F.regexp_extract_all("text", F.lit("(s[a-z]+)"), 1)
            ).alias("match_idx", "match"),
        )
        .select("doc_id", F.col("match_idx").cast("long"), "match")
    )
