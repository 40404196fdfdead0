"""Scalar function families (SURVEY.md §2-I) — one query per family.

Everything here is a built-in Catalyst expression (JVM-side, inside
whole-stage codegen) — no Python crosses the row path. Each query touches
every function in its family at least once so the oracle check covers the
family's cross-engine semantics (the subtle ones are documented inline:
dayofweek origin, regexp 'g' flag, division-by-zero → NULL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymapreduce_spark.functions.checked import trunc_ntz
from pymapreduce_spark.io import load_table
from pymapreduce_spark.registry import query


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           length(p_name) AS name_len,
           upper(p_brand) AS brand_upper,
           lower(p_type) AS type_lower,
           substring(p_name, 1, 8) AS name_prefix,
           trim(concat('  ', p_name, ' ')) AS name_trimmed,
           lpad(p_brand, 12, '0') AS brand_padded,
           concat_ws('|', p_brand, p_type) AS brand_type,
           str_split(p_name, ' ')[1] AS first_word,
           levenshtein(p_brand, 'Brand#1') AS brand_dist
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat/substr/case/trim/pad/split/length/levenshtein family."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.length("p_name").alias("name_len"),
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
        F.lpad("p_brand", 12, "0").alias("brand_padded"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#1")).alias("brand_dist"),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
           regexp_matches(p_type, '^[A-Z]+ ') AS type_has_word_prefix
    FROM part
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp extract / replace / match. Spark's regexp_replace is
    global by default — the oracle needs DuckDB's explicit 'g' flag."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
        F.col("p_type").rlike("^[A-Z]+ ").alias("type_has_word_prefix"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           dayofweek(o_orderdate) + 1 AS order_dow,
           date_trunc('month', o_orderdate)::TIMESTAMP AS order_month_start,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch0,
           (o_orderdate + INTERVAL 30 DAY) AS due_date,
           strftime(o_orderdate, '%Y-%m') AS order_ym,
           epoch(o_orderdate)::BIGINT AS order_epoch
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trunc/extract/diff/add/format/unix family. Cross-engine traps
    handled: DuckDB dayofweek is 0=Sunday vs Spark 1=Sunday (+1 in the
    oracle); interval add instead of date_add (which returns DATE)."""
    orders = load_table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(ts).alias("order_year"),
        F.month(ts).alias("order_month"),
        F.dayofweek(ts).alias("order_dow"),
        trunc_ntz("month", ts).alias("order_month_start"),
        F.datediff(ts, F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch0"
        ),
        (ts + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.date_format(ts, "yyyy-MM").alias("order_ym"),
        ts.cast("timestamp").cast("long").alias("order_epoch"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT s_suppkey,
           round(TRY_CAST(CASE WHEN isnan(s_acctbal) THEN NULL ELSE s_acctbal END AS DECIMAL(12,2)), 1)::DOUBLE AS bal_round1,
           abs(s_acctbal) AS bal_abs,
           ceil(s_acctbal)::DOUBLE AS bal_ceil,
           floor(s_acctbal)::DOUBLE AS bal_floor,
           round(ln(abs(s_acctbal) + 1), 6) AS bal_ln,
           round(pow(s_nationkey, 2), 1) AS nation_sq,
           round(sqrt(abs(s_acctbal)), 6) AS bal_sqrt,
           s_acctbal / nullif(s_nationkey, 0) AS bal_per_nation,
           mod(s_suppkey, 7) AS key_mod7
    FROM supplier
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/ln/pow/sqrt/safe-divide/mod family.
    try_divide(x, 0) → NULL matches DuckDB's x / nullif(y, 0).
    acctbal has 2 decimals → round(…,1) can tie-break differently, so
    round1 goes through exact DECIMAL."""
    supplier = load_table(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    # Spark's ceil/floor return LONG — NaN collapses to 0 and ±Inf
    # saturates to Long.MAX/MIN — while DuckDB's stay DOUBLE (NaN in,
    # NaN out). Route non-finite inputs around the integer step
    # (round-8 extreme_measures axis); ceil/floor of a non-finite is
    # the input itself under IEEE anyway.
    finite = F.abs(bal) < F.lit(float("inf"))
    return supplier.select(
        "s_suppkey",
        bal.try_cast("decimal(12,2)")
        .cast("decimal(12,1)")
        .cast("double")
        .alias("bal_round1"),
        F.abs(bal).alias("bal_abs"),
        F.when(finite, F.ceil(bal).cast("double"))
        .otherwise(bal)
        .alias("bal_ceil"),
        F.when(finite, F.floor(bal).cast("double"))
        .otherwise(bal)
        .alias("bal_floor"),
        F.round(F.log(F.abs(bal) + 1), 6).alias("bal_ln"),
        F.round(F.pow("s_nationkey", F.lit(2)), 1).alias("nation_sq"),
        F.round(F.sqrt(F.abs(bal)), 6).alias("bal_sqrt"),
        F.try_divide(bal, F.col("s_nationkey")).alias("bal_per_nation"),
        (F.col("s_suppkey") % 7).alias("key_mod7"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT doc_id,
           len(str_split(text, ' ')) AS n_words,
           list_contains(str_split(text, ' '), 'data') AS has_data,
           len(list_distinct(str_split(text, ' '))) AS n_distinct_words,
           list_sort(list_distinct(str_split(text, ' ')))[1] AS first_word_alpha,
           array_to_string(str_split(text, ' ')[1:3], '|') AS first3,
           array_to_string(list_transform(str_split(text, ' ')[1:3],
                                          x -> upper(x)), '|') AS first3_upper,
           len(list_filter(str_split(text, ' '), x -> length(x) > 5)) AS n_long_words,
           list_sum(list_transform(str_split(text, ' '), x -> length(x)))
               ::BIGINT AS total_chars_in_words
    FROM documents
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order functions (transform/filter/
    aggregate) — all JVM lambda expressions, no UDFs."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.array_contains(words, "data").alias("has_data"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        F.array_sort(F.array_distinct(words)).getItem(0).alias(
            "first_word_alpha"
        ),
        F.array_join(F.slice(words, 1, 3), "|").alias("first3"),
        F.array_join(
            F.transform(F.slice(words, 1, 3), lambda x: F.upper(x)), "|"
        ).alias("first3_upper"),
        F.size(F.filter(words, lambda x: F.length(x) > 5)).alias(
            "n_long_words"
        ),
        F.aggregate(
            words, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("total_chars_in_words"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT o_orderkey,
           o_totalprice AS price_val,
           (TRY_CAST(CASE WHEN isnan(o_totalprice) THEN NULL ELSE o_totalprice END AS DECIMAL(12,2)) * 0.1::DECIMAL(2,1))::DOUBLE AS tax_val,
           'price|tax' AS metric_keys
    FROM orders
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: build a map column, access by key, enumerate sorted
    keys. The oracle checks the *values* — DuckDB's map type round-trips
    differently, so the map is consumed Spark-side and only scalars and
    the key list cross the comparison."""
    from pymapreduce_spark.functions.checked import dec2

    orders = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("price"),
        F.col("o_totalprice"),
        F.lit("tax"),
        (dec2("o_totalprice") * F.lit(0.1).cast("decimal(2,1)")).cast(
            "double"
        ),
    )
    return orders.select(
        "o_orderkey",
        F.element_at(m, "price").alias("price_val"),
        F.element_at(m, "tax").alias("tax_val"),
        F.array_join(F.array_sort(F.map_keys(m)), "|").alias("metric_keys"),
    )


@query(
    "fn_json",
    oracle="""
    -- malformed-JSON tolerance: DuckDB's json functions ERROR on
    -- invalid JSON and ::INT errors on non-numeric tokens, while
    -- Spark's get_json_object/from_json yield NULL — json_valid +
    -- TRY_CAST align the engines (malformed-JSON audit)
    SELECT event_id,
           CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS k_str,
           TRY_CAST(CASE WHEN json_valid(props)
                          AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                     THEN json_extract(props, '$.k') END AS INT) AS k_int,
           TRY_CAST(CASE WHEN json_valid(props)
                          AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                     THEN json_extract(props, '$.k') END AS INT) * 2 AS k_doubled
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction (string + typed parse) on events.props.

    k_str is gated on RFC-strict validity: get_json_object's Jackson
    parser LENIENTLY accepts raw control characters inside strings
    (extracting "raw\\ttab" from invalid JSON) where every strict
    parser — DuckDB's json_valid, Spark's own try_parse_json — rejects
    them. try_parse_json(props) IS NOT NULL matches json_valid on all
    observed classes incl. inter-token control whitespace, which IS
    valid (round-7 control-chars axis)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    valid = F.try_parse_json(F.col("props")).isNotNull()
    # typed extraction is gated on the SAME strict validity as k_str:
    # Jackson's from_json leniently parses single-quoted JSON that
    # every strict parser rejects (round-8 hostile_json axis), and its
    # int-typed-only semantics (no string/bool/double coercion, int32
    # overflow -> NULL) is mirrored by the oracle's json_type gate
    k_int = F.when(valid, parsed.getField("k"))
    return ev.select(
        "event_id",
        F.when(valid, F.get_json_object("props", "$.k")).alias("k_str"),
        k_int.alias("k_int"),
        (k_int * 2).alias("k_doubled"),
    )


@query(
    "fn_json_agg",
    oracle="""
    SELECT TRY_CAST(CASE WHEN json_valid(props)
                          AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                     THEN json_extract(props, '$.k') END AS INT) AS k,
           count(*) AS n_events,
           sum(TRY_CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY k
    """,
)
def fn_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a JSON-extracted key (BASELINE.md row 'JSON
    extract + group').

    The validity gate makes this a DOUBLE parse per row
    (try_parse_json for strict validity + from_json for typed
    extraction). A/B'd against a single-parse variant formulation
    (to_json(variant_get(try_parse_json(props),'$.k')) + integer-regex
    gate + try_cast — same results on every fixture): interleaved
    median-of-7 at sf0.1 measured 0.349 s vs 0.347 s — statistically
    identical, because scan+shuffle dominate and Jackson's second
    parse of a ~40-byte props string is noise. The r8 bench's +63 %
    on this key reproduced on NEITHER formulation (host drift; see
    bench.py calib_sec), so the simpler double-parse form stays."""
    from pymapreduce_spark.functions.checked import cents

    ev = load_table(spark, sf_dir, "events")
    valid = F.try_parse_json(F.col("props")).isNotNull()
    return (
        ev.withColumn(
            # int-typed JSON doctrine (round-8 hostile_json axis): the
            # strict-validity gate stops Jackson's lenient single-quote
            # parse, and from_json's k INT keeps int-typed values only
            # (get_json_object + try_cast would also admit string-typed
            # "5" and round nothing — but the engines' string->int casts
            # disagree on '1.9': Spark NULLs, DuckDB rounds)
            "k", F.when(valid, F.from_json(F.col("props"), "k INT")
                        .getField("k"))
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(cents("value")) / 100.0).alias("total_value"),
        )
    )


@query(
    "fn_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256
    FROM customer
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hashes (cross-engine stable). Spark-only hashes
    (xxhash64/crc32/hash — used for dedup keys and salting at scale)
    are exercised in fn_hash_spark (rows-only)."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("c_name").cast("binary"), 256).alias("name_sha256"),
    )


@query(
    "fn_hash_spark",
    # xxhash64/crc32/murmur3 have no DuckDB twins, so the check is
    # split: (a) known-answer rows — the Spark hash of each fixed probe
    # string must equal the recorded constant (seed-fixed determinism,
    # pinned cross-version), and (b) a fixture-coupled injectivity
    # audit — distinct xxhash64 values over customer names must equal
    # distinct names (collision-free at any test scale: p ≈ n²/2⁶⁵).
    oracle="""
    SELECT t.probe, t.xxh64, t.crc32, t.murmur3,
           inj.xxh64_injective_on_names
    FROM (VALUES
        ('', -7444071767201028348, 0, 142593372),
        ('a', -8582455328737087284, 3904355907, 1485273170),
        ('hello world', 7620854247404556961, 222957957, -1528836094),
        ('café ☕ 数据', 8242977634428290703, 2351207781, 1995245951),
        ('The quick brown fox jumps over the lazy dog',
         -6152153990451020481, 1095738169, 466024576),
        ('0123456789012345678901234567890123456789012345678901234567890123456789012345678901234567890123456789',
         6379203369694145893, 2986101692, -788384601)
    ) AS t(probe, xxh64, crc32, murmur3)
    CROSS JOIN (SELECT true AS xxh64_injective_on_names) AS inj
    """,
)
def fn_hash_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native stable hashes: xxhash64 (the workhorse for dedup
    bucketing and salting at 100 TB), crc32, and Murmur3 `hash`.

    Hash-checked two ways since DuckDB cannot recompute these: fixed
    probe strings (incl. empty, unicode, 100-char) against known-answer
    constants — any seed / algorithm / encoding drift fails the value
    hash — plus an injectivity flag over the fixture's customer names
    (count-distinct of hashes == count-distinct of names; NULL names
    excluded because xxhash64(NULL) yields the seed, not NULL, which
    would skew the distinct counts one-sided)."""
    probes = spark.createDataFrame(
        [
            ("",),
            ("a",),
            ("hello world",),
            ("café ☕ 数据",),
            ("The quick brown fox jumps over the lazy dog",),
            ("0123456789" * 10,),
        ],
        "probe string",
    )
    hashed = probes.select(
        "probe",
        F.xxhash64("probe").alias("xxh64"),
        F.crc32(F.col("probe").cast("binary")).alias("crc32"),
        F.hash("probe").alias("murmur3"),
    )
    customer = load_table(spark, sf_dir, "customer")
    inj = (
        customer.where(F.col("c_name").isNotNull())
        .agg(
            (
                F.count_distinct(F.xxhash64("c_name"))
                == F.count_distinct("c_name")
            ).alias("xxh64_injective_on_names")
        )
    )
    return hashed.crossJoin(F.broadcast(inj))


@query(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_or_other,
           greatest(c_acctbal, 0.0) AS bal_floor0,
           least(c_acctbal, 1000.0) AS bal_cap1000,
           CASE WHEN c_acctbal IS NULL THEN -1.0 ELSE c_acctbal END AS bal_nvl
    FROM customer
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce/nullif/nvl/greatest/least family."""
    customer = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return customer.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("segment_or_other"),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        F.least(bal, F.lit(1000.0)).alias("bal_cap1000"),
        F.nvl(bal, F.lit(-1.0)).alias("bal_nvl"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT e_id,
           e_id & 255 AS low_byte,
           e_id | 15 AS with_low_bits,
           xor(e_id, 21845) AS xored,
           -- mask BEFORE shifting: Spark's shiftleft silently WRAPS
           -- int64 overflow while DuckDB's << raises Out of Range —
           -- at boundary ids (extreme_ids axis) the unmasked shift is
           -- an engine split by construction. Real bucketing code
           -- masks first anyway.
           (e_id & 1152921504606846975) << 2 AS shifted_left,
           e_id >> 3 AS shifted_right
    FROM (SELECT event_id AS e_id FROM events)
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: AND/OR/XOR and shifts on integer ids (the
    primitives hash-bucketing and bloom-style filters are built from).
    The left shift masks to 60 bits first (2⁶⁰−1, so the shifted value tops out at 2⁶²−4): Spark shiftleft
    wraps on int64 overflow where DuckDB << errors, so an unmasked
    shift of a ±Long.MAX id splits the engines (extreme_ids axis);
    masking is what real hash-bucketing does before shifting anyway."""
    ev = load_table(spark, sf_dir, "events")
    e = F.col("event_id")
    return ev.select(
        e.alias("e_id"),
        e.bitwiseAND(F.lit(255)).alias("low_byte"),
        e.bitwiseOR(F.lit(15)).alias("with_low_bits"),
        e.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(
            e.bitwiseAND(F.lit(1152921504606846975)), 2
        ).alias("shifted_left"),
        F.shiftright(e, 3).alias("shifted_right"),
    )


@query(
    "fn_try_cast",
    oracle="""
    SELECT p_partkey,
           try_cast(p_type AS INT) AS type_as_int,
           try_cast(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INT)
               AS brand_num,
           try_cast(p_name AS TIMESTAMP) AS name_as_ts,
           p_retailprice / nullif(p_size - p_size, 0) AS div_by_zero
    FROM part
    """,
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fault-tolerant casts: try_cast yields NULL instead of failing the
    job on malformed values — with ANSI off Spark's plain cast also
    NULLs, but try_* keeps that behavior under ANSI mode, which is what
    a production 100 TB pipeline should run with."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.try_to_number(F.col("p_type"), F.lit("999999")).cast("int").alias(
            "type_as_int"
        ),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1)
        .try_cast("int")
        .alias("brand_num"),
        F.col("p_name").try_cast("timestamp_ntz").alias("name_as_ts"),
        F.try_divide(
            F.col("p_retailprice"), F.col("p_size") - F.col("p_size")
        ).alias("div_by_zero"),
    )


@query(
    "fn_stat_crosstab",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_linestatus = 'F') AS status_f,
           count(*) FILTER (WHERE l_linestatus = 'O') AS status_o
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def fn_stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.stat.crosstab contingency table (flag × status), normalized
    to stable column names."""
    li = load_table(spark, sf_dir, "lineitem")
    ct = li.stat.crosstab("l_returnflag", "l_linestatus")
    # crosstab only materializes columns for OBSERVED values: an empty
    # (or single-status) input would drop F/O and crash the projection
    for missing in ("F", "O"):
        if missing not in ct.columns:
            ct = ct.withColumn(missing, F.lit(0).cast("long"))
    return ct.select(
        F.col("l_returnflag_l_linestatus").alias("l_returnflag"),
        F.col("F").alias("status_f"),
        F.col("O").alias("status_o"),
    )


@query(
    "fn_ids",
    oracle="""
    SELECT count(*) AS n_rows, count(*) AS n_distinct_ids FROM events
    """,
)
def fn_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated-id semantics: monotonically_increasing_id must be
    unique across the whole DataFrame (the invariant IS the contract —
    the concrete values are partition-layout-dependent by design, which
    is also why generated ids never appear in other checked outputs)."""
    ev = load_table(spark, sf_dir, "events")
    with_ids = ev.withColumn("gen_id", F.monotonically_increasing_id())
    return with_ids.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("gen_id").alias("n_distinct_ids"),
    )


@query(
    "fn_binary",
    oracle="""
    SELECT p_partkey,
           to_base64(p_name::BLOB) AS name_b64,
           hex(p_name) AS name_hex,
           bit_length(p_name) AS name_bits,
           octet_length(p_name::BLOB) AS name_bytes
    FROM part WHERE p_partkey <= 100
    """,
)
def fn_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/encoding family: base64, hex, bit/octet length — the
    string↔bytes bridge (UTF-8 via encode; both engines emit uppercase
    hex and padded standard base64, verified)."""
    part = load_table(spark, sf_dir, "part")
    return part.where(F.col("p_partkey") <= 100).select(
        "p_partkey",
        F.base64(F.encode("p_name", "UTF-8")).alias("name_b64"),
        F.hex(F.col("p_name")).alias("name_hex"),
        F.bit_length("p_name").alias("name_bits"),
        F.octet_length("p_name").alias("name_bytes"),
    )


@query(
    "fn_struct",
    oracle="""
    SELECT s_nationkey, rn AS rank_pos,
           TRY_CAST(round(s_acctbal * 100) AS BIGINT) / 100.0 AS bal, s_name
    FROM (SELECT *, row_number() OVER (
              PARTITION BY s_nationkey
              ORDER BY TRY_CAST(round(s_acctbal * 100) AS BIGINT) DESC, s_name DESC
          ) AS rn FROM supplier)
    WHERE rn <= 3
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct family: named_struct build → collect → array_sort on
    structs (lexicographic over fields — the sort key IS the field
    order) → reverse+slice top-3 → posexplode → field access. The
    oracle states the same semantics as a window top-k; comparing the
    two proves the struct pipeline preserves (order, fields) exactly.
    Final output is flattened to scalars — struct columns never cross
    the engine-comparison boundary."""
    from pymapreduce_spark.functions.checked import cents

    supplier = load_table(spark, sf_dir, "supplier")
    st = F.struct(
        cents("s_acctbal").alias("bal"), F.col("s_name").alias("name")
    )
    agg = supplier.groupBy("s_nationkey").agg(
        F.slice(F.reverse(F.array_sort(F.collect_list(st))), 1, 3).alias("arr")
    )
    return agg.select(
        "s_nationkey", F.posexplode("arr").alias("pos", "st")
    ).select(
        "s_nationkey",
        (F.col("pos") + 1).alias("rank_pos"),
        (F.col("st.bal") / 100.0).alias("bal"),
        F.col("st.name").alias("s_name"),
    )


@query(
    "fn_variant",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           sum(TRY_CAST(CASE WHEN json_valid(props)
                          AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                     THEN json_extract(props, '$.k') END AS BIGINT))::BIGINT AS k_total,
           min(TRY_CAST(CASE WHEN json_valid(props)
                          AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                     THEN json_extract(props, '$.k') END AS BIGINT))::BIGINT AS k_min,
           max(TRY_CAST(CASE WHEN json_valid(props)
                          AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                     THEN json_extract(props, '$.k') END AS BIGINT))::BIGINT AS k_max,
           count(*) FILTER (
               CASE WHEN json_valid(props)
                    THEN json_extract(props, '$.missing') END IS NULL)
               ::BIGINT AS n_missing_path
    FROM events
    GROUP BY event_type
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion of semi-structured data: parse_json →
    a binary-encoded variant column, typed access via variant_get —
    the open-format answer to schema-on-read JSON that avoids both
    per-query string re-parsing (get_json_object) and a rigid
    from_json schema. At 100 TB the variant encodes once at ingest and
    every downstream path access is a binary field probe; this query
    aggregates typed extractions per event type, with a missing-path
    probe proving NULL semantics match JSON semantics (DuckDB's native
    JSON extraction is the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    # try_parse_json: malformed props → NULL variant (plain parse_json
    # throws; malformed-JSON audit), downstream try_variant_get then
    # yields NULLs that match the oracle's json_valid guards
    v = F.try_parse_json(F.col("props"))
    # int-typed doctrine (round-8 hostile_json axis): try_variant_get
    # 'bigint' COERCES string/bool/double variants ("5" -> 5, true -> 1,
    # 1.9 -> 2) while the oracle's TRY_CAST-from-JSON differs per class;
    # gating on the variant's own type keeps both engines on the one
    # defined surface (ints), same as fn_json's from_json semantics
    kv = F.try_variant_get(v, "$.k", "variant")
    k = F.when(
        F.schema_of_variant(kv) == "BIGINT",
        F.try_variant_get(kv, "$", "bigint"),
    )
    missing = F.try_variant_get(v, "$.missing", "bigint")
    return ev.select(
        "event_type", k.alias("k"), missing.alias("m")
    ).groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k").alias("k_total"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.count(F.when(F.col("m").isNull(), 1)).alias("n_missing_path"),
    )


@query(
    "fn_mask",
    oracle="""
    SELECT c_custkey,
           regexp_replace(
               regexp_replace(
                   regexp_replace(c_name, '\\p{Lu}', 'X', 'g'),
                   '\\p{Ll}', 'x', 'g'),
               '\\p{Nd}', 'n', 'g') AS masked_name,
           'XXX-' || substr(c_name, length(c_name) - 2, 3)
               AS last3_visible
    FROM customer
    """,
)
def fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data masking for PII-safe exports: Spark's built-in mask()
    (upper→X, lower→x, digit→n — a single JVM intrinsic, no regex per
    class) plus a keep-last-3 partial reveal. The oracle rebuilds the
    same masking from regexp_replace chains — proving mask() is
    exactly the class substitution it claims. The classes are UNICODE
    (mask() uses Character.isUpperCase & co.): a name carrying ß or İ
    masks as a letter, not a pass-through — so the oracle regexes say
    \\p{Lu}/\\p{Ll}/\\p{Nd}, not [A-Z]/[a-z]/[0-9] (round-7
    unicode-keys axis; combining marks are Mn and survive unmasked in
    both engines). At 100 TB this is the map-only projection an
    egress pipeline runs; pair with llm_pii_mask for pattern-level
    (email/phone) redaction."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.mask(F.col("c_name")).alias("masked_name"),
        F.concat(
            F.lit("XXX-"),
            F.substring(
                F.col("c_name"), F.length("c_name") - 2, 3
            ),
        ).alias("last3_visible"),
    )


@query(
    "fn_array_quantifiers",
    oracle="""
    WITH w AS (
        SELECT doc_id, list_distinct(str_split(text, ' ')) AS ws
        FROM documents
    )
    SELECT doc_id,
           (len(list_filter(ws, x -> length(x) > 8)) > 0) AS any_long,
           (len(list_filter(ws, x -> length(x) < 2)) = 0) AS all_multichar,
           len(flatten(list_transform(ws,
               x -> str_split(x, '-'))))::BIGINT AS n_dash_parts
    FROM w
    """,
)
def fn_array_quantifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array quantifier & restructuring HOFs: exists / forall over a
    predicate lambda and flatten over a nested transform — the
    remaining higher-order surface beyond fn_array's
    transform/filter/aggregate/zip_with. DuckDB lacks exists/forall,
    so the oracle states them as filter-count identities (∃ ⇔ filtered
    length > 0; ∀ ⇔ counterexample count = 0) — the same truth table,
    proving the semantics rather than the keyword."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.array_distinct(F.split("text", " "))
    return docs.select(
        "doc_id",
        F.exists(ws, lambda x: F.length(x) > 8).alias("any_long"),
        F.forall(ws, lambda x: F.length(x) >= 2).alias("all_multichar"),
        F.size(
            F.flatten(F.transform(ws, lambda x: F.split(x, "-")))
        ).cast("long").alias("n_dash_parts"),
    )


@query(
    "fn_url",
    oracle="""
    WITH u AS (
        SELECT doc_id, source,
               'https://' || source || '.example.com/docs/' ||
                   doc_id::VARCHAR || '?lang=' || lang AS url
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN regexp_matches(url, '\\s') THEN NULL
                WHEN NOT regexp_matches(source, '^[A-Za-z0-9.-]+$')
                    THEN NULL
                ELSE regexp_extract(url, '^https://([^/]+)/', 1)
           END AS host,
           CASE WHEN regexp_matches(url, '\\s') THEN NULL
                ELSE regexp_extract(url, '^https://[^/]+(/[^?]*)', 1)
           END AS path,
           CASE WHEN regexp_matches(url, '\\s') THEN NULL
                ELSE regexp_extract(url, '\\?lang=([^&#]*)', 1)
           END AS lang_param
    FROM u
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with the built-in try_parse_url (HOST / PATH /
    QUERY-param extraction) over deterministic synthesized URLs — the
    crawl-metadata parsing every web-corpus pipeline needs (domain
    grouping, path dedup, parameter stripping). try_parse_url, not
    parse_url: crawl metadata is never all well-formed, and ONE
    whitespace-bearing source crashes parse_url's java.net.URI parse
    (round-7 unicode-keys axis) — degraded fields must be NULL, not a
    job abort. The oracle mirrors the URI parser's observable rules:
    whitespace anywhere voids every component; a host label outside
    [A-Za-z0-9.-] (non-ASCII, '_', empty) yields NULL host while PATH
    and QUERY still extract; the lang capture is separator-aware
    ([^&#]*) because try_parse_url's QUERY extraction stops at '&'/'#'
    while a greedy (.*)$ would swallow trailing parameters whole;
    parse_url itself remains the preferred
    surface because it handles ports/userinfo/fragments that ad-hoc
    regexes miss. Map-only projection at scan speed."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return docs.select(
        "doc_id",
        F.try_parse_url(url, F.lit("HOST")).alias("host"),
        F.try_parse_url(url, F.lit("PATH")).alias("path"),
        F.try_parse_url(url, F.lit("QUERY"), F.lit("lang")).alias(
            "lang_param"
        ),
    )


@query(
    "fn_char_classes",
    oracle="""
    SELECT doc_id,
           (length(text) - length(regexp_replace(text, '[a-z]', '', 'g')))
               ::BIGINT AS n_lower,
           (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
               ::BIGINT AS n_digits,
           (length(text) - length(regexp_replace(text, ' ', '', 'g')))
               ::BIGINT AS n_spaces,
           (length(text) - length(
               regexp_replace(text, '[^a-z0-9 ]', '', 'g')))::BIGINT
               AS n_other
    FROM documents WHERE doc_id < 200
    """,
)
def fn_char_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class census per document (lowercase / digits /
    spaces / other) — the raw features behind symbol-ratio and
    code-vs-prose quality heuristics. Counted by the length-delta
    idiom (strip the class, subtract) so both engines count with the
    SAME regex semantics instead of comparing char-type predicates
    that differ on Unicode classes; the four counts partition the
    string, so they also self-check (sums equal length). Map-only."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )

    def cnt(pattern: str):
        return (
            F.length("text")
            - F.length(F.regexp_replace("text", pattern, ""))
        ).cast("long")

    return docs.select(
        "doc_id",
        cnt("[a-z]").alias("n_lower"),
        cnt("[0-9]").alias("n_digits"),
        cnt(" ").alias("n_spaces"),
        cnt("[^a-z0-9 ]").alias("n_other"),
    )


@query(
    "fn_date_boundaries",
    oracle="""
    SELECT o_orderkey,
           date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
           last_day(o_orderdate::DATE)::TIMESTAMP AS month_end,
           quarter(o_orderdate)::INTEGER AS qtr,
           dayofyear(o_orderdate)::INTEGER AS doy
    FROM orders WHERE o_orderkey < 500
    """,
)
def fn_date_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-boundary functions: month start/end, quarter, and
    day-of-year — the alignment primitives every fiscal or cohort
    report leans on (month_end in particular is the classic
    off-by-one trap hand-rolled date math gets wrong on 28/29/30/31-
    day months; last_day is the built-in answer). DuckDB's last_day
    returns DATE, cast ::TIMESTAMP for the shared schema. Map-only."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") < 500
    )
    return orders.select(
        "o_orderkey",
        trunc_ntz("month", F.col("o_orderdate")).alias("month_start"),
        F.last_day("o_orderdate").cast("timestamp_ntz").alias("month_end"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
    )


@query(
    "fn_split_regex",
    oracle="""
    SELECT doc_id,
           len(regexp_split_to_array(text, '[ .,]+'))::BIGINT
               AS n_tokens_multi,
           len(str_split(text, ' '))::BIGINT AS n_tokens_space
    FROM documents WHERE doc_id < 300
    """,
)
def fn_split_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-delimited tokenization ([ .,]+ — whitespace AND
    punctuation as one delimiter class) next to the plain space split
    — the difference IS the punctuation-handling gap between naive
    and regex tokenizers, made visible as two counts per document.
    Spark's split() takes a Java regex and DuckDB's
    regexp_split_to_array takes RE2; the character class used here
    sits in the dialect intersection (the llm_token_count rule)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    return docs.select(
        "doc_id",
        F.size(F.split("text", "[ .,]+")).cast("long").alias(
            "n_tokens_multi"
        ),
        F.size(F.split("text", " ")).cast("long").alias(
            "n_tokens_space"
        ),
    )


@query(
    "fn_timezone",
    oracle="""
    SELECT event_id,
           timezone('Asia/Kathmandu',
                    timezone('UTC', ts::TIMESTAMP))::TIMESTAMP
               AS ktm_wall,
           timezone('UTC',
                    timezone('Asia/Kolkata', ts::TIMESTAMP))::TIMESTAMP
               AS utc_from_kolkata,
           hour(timezone('Asia/Kathmandu',
                         timezone('UTC', ts::TIMESTAMP))) AS ktm_hour,
           ((epoch_us(timezone('Asia/Kathmandu',
                               timezone('UTC', ts::TIMESTAMP))::TIMESTAMP)
             - epoch_us(ts::TIMESTAMP)) // 60000000)::BIGINT
               AS ktm_offset_min
    FROM events
    """,
)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLICIT-zone timestamp conversion (convert_timezone) — the
    conformance surface for real tzdata math under the naive-wall-clock
    doctrine: inputs and outputs are both TimestampNTZType, the zones
    are ARGUMENTS, never ambient session/OS state, so results are
    bit-stable on any host (the round-8 clock axis requirement).

    Zones are deliberately DST-FREE (Asia/Kathmandu +05:45,
    Asia/Kolkata +05:30 — sub-hour offsets that also catch any
    whole-hour shortcut): for an AMBIGUOUS fall-back wall-clock the
    engines genuinely split — measured on 2024-11-03 01:30
    America/New_York, Spark's convert_timezone resolves to the EARLIER
    offset (05:30 UTC) while DuckDB's timezone() picks the LATER
    (06:30 UTC) — so zones with DST are unsafe in any hash-checked
    output (documented engine split, same class as mode()'s arbitrary
    tie). Both directions covered; the +05:45 offset is additionally
    self-evidenced as ktm_offset_min = 345. Map-only, scan speed.

    DuckDB oracle shape: timezone(z, TIMESTAMP) interprets a naive
    wall-clock IN z → instant; timezone(z, TIMESTAMPTZ) renders an
    instant as z's wall-clock — composing the two is convert_timezone
    with every step explicit, independent of DuckDB's session
    TimeZone."""
    ev = load_table(spark, sf_dir, "events")
    ktm = F.convert_timezone(F.lit("UTC"), F.lit("Asia/Kathmandu"), F.col("ts"))
    from pymapreduce_spark.functions.checked import epoch_micros

    return ev.select(
        "event_id",
        ktm.alias("ktm_wall"),
        F.convert_timezone(
            F.lit("Asia/Kolkata"), F.lit("UTC"), F.col("ts")
        ).alias("utc_from_kolkata"),
        F.hour(ktm).alias("ktm_hour"),
        (
            (epoch_micros(ktm) - epoch_micros(F.col("ts"))) / 60_000_000
        ).cast("bigint").alias("ktm_offset_min"),
    )


@query(
    "fn_collation",
    oracle="""
    WITH m AS (
        SELECT CASE
                 WHEN source IS NULL THEN NULL
                 WHEN NOT regexp_matches(source, '^[ -~]*$')
                     THEN '<non-ascii>'
                 WHEN doc_id % 3 = 0 THEN upper(source)
                 WHEN doc_id % 3 = 1 THEN source
                 ELSE lower(source) END AS mixed,
               n_chars
        FROM documents
    )
    SELECT lower(min(mixed)) AS key_ci,
           min(mixed) AS display,
           count(*) AS n_docs,
           sum(n_chars)::BIGINT AS chars_total
    FROM m GROUP BY lower(mixed)
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string COLLATION (SPARK-46830): grouping under the
    session-independent ``UTF8_LCASE`` collation — the engine-level
    answer to case-insensitive keys that otherwise force lower()
    normalization into every query (and, at 100 TB, break partition
    pruning on the raw column). Case diversity is synthesized
    deterministically (doc_id % 3 picks upper/as-is/lower of source),
    then grouped via ``F.collate(mixed, 'UTF8_LCASE')``.

    Determinism doctrine: the collated GROUP KEY is an arbitrary
    representative of the equivalence class (first-seen — partition
    dependent) and carries a collated string type, so it never reaches
    the output; the emitted keys are ``min(mixed)`` (BINARY min —
    deterministic) and its lower() form, both plain strings. The
    oracle is the classic lower()-normalized GROUP BY, proving
    UTF8_LCASE ≡ lowercase equivalence on this key domain.

    The key domain is gated to printable ASCII (tested on the RAW
    source, BEFORE case mixing; non-ASCII pools under a literal, NULL
    stays NULL): case mapping itself is a measured engine split on
    hostile text — Spark/Java upper('ß') expands to 'SS' while DuckDB
    keeps 'ß', and Turkish 'İ' lowercases to 'i̇' (combining dot) vs
    DuckDB's 'i' — so case-insensitive cross-engine checks are only
    honest on ASCII (unicode_keys axis finding, r11)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    mixed = (
        F.when(F.col("source").isNull(), F.lit(None).cast("string"))
        .when(~F.col("source").rlike("^[ -~]*$"), F.lit("<non-ascii>"))
        .when(F.col("doc_id") % 3 == 0, F.upper("source"))
        .when(F.col("doc_id") % 3 == 1, F.col("source"))
        .otherwise(F.lower("source"))
    )
    m = docs.select(mixed.alias("mixed"), "n_chars")
    return (
        m.groupBy(F.collate("mixed", "UTF8_LCASE").alias("k"))
        .agg(
            F.min("mixed").alias("display"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
        )
        .select(
            F.lower("display").alias("key_ci"),
            "display",
            "n_docs",
            "chars_total",
        )
    )
