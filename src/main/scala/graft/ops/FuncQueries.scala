package graft.ops

import org.apache.spark.sql.functions._

/** Scalar-function surface: string, date, null-handling, conditional,
  * JSON, and pivot shapes — the everyday SQL layer a user of the engine
  * expects, each oracle-matched function-for-function against DuckDB.
  * (Functions with divergent cross-engine semantics — e.g. round's
  * HALF_UP vs HALF_EVEN, dayofweek origins — are deliberately excluded
  * from oracle outputs.)
  */
object FuncQueries {
  import Tables.load

  val all: Seq[Q] = Seq(

    Q("func_strings", (spark, dir) =>
      load(spark, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lpad(col("p_size").cast("string"), 5, "0").as("size_padded"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        regexp_replace(col("p_name"), "a", "@").as("name_subst"),
        translate(col("p_brand"), "#", "-").as("brand_dash"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len")),
      oracle = Some("""
      SELECT p_partkey, upper(p_name) AS name_upper,
             lpad(CAST(p_size AS VARCHAR), 5, '0') AS size_padded,
             substring(p_type, 1, 5) AS type_prefix,
             regexp_replace(p_name, 'a', '@', 'g') AS name_subst,
             translate(p_brand, '#', '-') AS brand_dash,
             concat_ws('|', p_brand, p_type) AS brand_type,
             CAST(length(p_name) AS INT) AS name_len
      FROM part""")),

    Q("func_dates", (spark, dir) =>
      load(spark, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .as("days_since_95"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date")),
      oracle = Some("""
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS INT) AS y,
             CAST(month(o_orderdate) AS INT) AS m,
             CAST(day(o_orderdate) AS INT) AS d,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
               AS days_since_95,
             CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date
      FROM orders""")),

    Q("func_nulls", (spark, dir) =>
      load(spark, dir, "customer").select(
        col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(default)"))
          .as("seg_defaulted"),
        (nullif(col("c_mktsegment"), lit("BUILDING")) <=> lit("MACHINERY"))
          .as("nullsafe_eq"),
        isnull(nullif(col("c_mktsegment"), lit("BUILDING"))).as("is_building")),
      oracle = Some("""
      SELECT c_custkey,
             nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
             coalesce(nullif(c_mktsegment, 'BUILDING'), '(default)') AS seg_defaulted,
             nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM 'MACHINERY'
               AS nullsafe_eq,
             nullif(c_mktsegment, 'BUILDING') IS NULL AS is_building
      FROM customer""")),

    Q("func_conditional", (spark, dir) =>
      load(spark, dir, "supplier").select(
        col("s_suppkey"),
        when(col("s_acctbal") < 0, lit("debt"))
          .when(col("s_acctbal") < 5000, lit("low"))
          .otherwise(lit("high")).as("bal_band"),
        greatest(col("s_acctbal"), lit(0.0)).as("bal_floor"),
        least(col("s_nationkey"), lit(10)).as("nat_capped"),
        abs(col("s_acctbal")).as("bal_abs")),
      oracle = Some("""
      SELECT s_suppkey,
             CASE WHEN s_acctbal < 0 THEN 'debt'
                  WHEN s_acctbal < 5000 THEN 'low'
                  ELSE 'high' END AS bal_band,
             greatest(s_acctbal, 0.0) AS bal_floor,
             least(s_nationkey, 10) AS nat_capped,
             abs(s_acctbal) AS bal_abs
      FROM supplier""")),

    // JSON extraction from the events props column + aggregate over the
    // extracted value.
    Q("func_json", (spark, dir) =>
      Tables.loadEvents(spark, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"),
          sum(col("k")).as("k_total"),
          max(col("k")).as("k_max")),
      oracle = Some("""
      SELECT event_type,
             count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
             max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
      FROM events GROUP BY event_type""")),

    // VARIANT — Spark 4's semi-structured type: props parses ONCE into
    // the shredded binary encoding (parse_json), then typed paths read
    // via variant_get without string re-parsing — the open-schema
    // ingestion shape (vs func_json's per-path get_json_object). A
    // missing path reads as a typed NULL, counted per type group; the
    // oracle reproduces both paths over DuckDB's JSON type.
    Q("func_variant", (spark, dir) =>
      Tables.loadEvents(spark, dir)
        .withColumn("v", parse_json(col("props")))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'long')").as("k"),
          expr("variant_get(v, '$.missing', 'long')").as("miss"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_k"),
          sum(col("k")).as("k_total"),
          min(col("k")).as("k_min"),
          sum(when(col("miss").isNull, 1L).otherwise(0L)).as("n_missing")),
      oracle = Some("""
      SELECT event_type,
             count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
             min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
             CAST(sum(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
      FROM events GROUP BY event_type""")),

    // Pivot: documents per (source, lang) spread wide — Spark's pivot
    // relational operator; the oracle uses equivalent FILTER aggregates
    // (explicit pivot values keep both schemas static).
    Q("agg_pivot_langs", (spark, dir) =>
      load(spark, dir, "documents")
        .groupBy(col("source"))
        .pivot("lang", Seq("en", "de", "es", "fr", "zh"))
        .agg(count(lit(1)))
        .na.fill(0L),
      oracle = Some("""
      SELECT source,
             count(*) FILTER (lang = 'en') AS en,
             count(*) FILTER (lang = 'de') AS de,
             count(*) FILTER (lang = 'es') AS es,
             count(*) FILTER (lang = 'fr') AS fr,
             count(*) FILTER (lang = 'zh') AS zh
      FROM documents GROUP BY source""")),

    // Higher-order array functions — transform / filter / aggregate /
    // zip_with over the tokenized text, entirely inside whole-stage
    // codegen (the API family Catalyst evaluates without UDFs; DuckDB
    // list lambdas are the oracle twins). Integer-only arithmetic so
    // the fold is exact on both engines.
    Q("func_arrays", (spark, dir) =>
      load(spark, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(filter(col("toks"), t => length(t) > 4)).as("n_long"),
          aggregate(transform(col("toks"), t => length(t).cast("long")),
            lit(0L), (acc, n) => acc + n).as("total_chars"),
          aggregate(
            zip_with(col("toks"), slice(col("toks"), 2, 1000000),
              (a, b) => when(a === b, 1L).otherwise(0L)),
            lit(0L), (acc, x) => acc + x).as("n_repeats"),
          array_max(transform(col("toks"), t => length(t))).as("max_len")),
      oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      SELECT doc_id,
             CAST(len(list_filter(toks, x -> length(x) > 4)) AS INT) AS n_long,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(toks, x -> CAST(length(x) AS BIGINT))),
               (acc, n) -> acc + n) AS total_chars,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, len(toks)),
                 i -> CASE WHEN toks[i] = toks[i + 1]
                           THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
               (acc, x) -> acc + x) AS n_repeats,
             CAST(list_max(list_transform(toks, x -> length(x))) AS INT) AS max_len
      FROM t""")),

    // UNPIVOT (melt): wide per-nation metrics → long (metric, value)
    // rows via the native Dataset.unpivot — the inverse of
    // agg_pivot_langs. Both measures are cast to double first (unpivot
    // requires a common value type).
    Q("func_unpivot", (spark, dir) => {
      val m = load(spark, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).cast("double").as("n_cust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("bal_sum"))
      m.unpivot(Array(col("c_nationkey")),
        Array(col("n_cust"), col("bal_sum")), "metric", "value")
    }, oracle = Some("""
      WITH m AS (
        SELECT c_nationkey, CAST(count(*) AS DOUBLE) AS n_cust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
        FROM customer GROUP BY c_nationkey)
      SELECT c_nationkey, 'n_cust' AS metric, n_cust AS value FROM m
      UNION ALL
      SELECT c_nationkey, 'bal_sum' AS metric, bal_sum AS value FROM m""")),

    // ANSI-safe try_* arithmetic — Spark 4 runs ANSI mode by default,
    // where a stray zero divisor or malformed cast KILLS the job; the
    // try_ family is the production idiom for null-instead-of-error.
    // The oracle spells the same semantics in portable SQL (nullif
    // divisor; TRY_CAST).
    Q("func_try_arithmetic", (spark, dir) => {
      Tables.registerAll(spark, dir)
      spark.sql("""
        SELECT o_orderkey,
               try_divide(o_totalprice, o_orderkey % 3) AS div3,
               try_cast(CASE WHEN o_orderkey % 2 = 0
                             THEN CAST(o_orderkey AS STRING)
                             ELSE concat('x', o_orderkey) END AS BIGINT) AS parsed
        FROM orders""")
    }, oracle = Some("""
      SELECT o_orderkey,
             o_totalprice / nullif(o_orderkey % 3, 0) AS div3,
             TRY_CAST(CASE WHEN o_orderkey % 2 = 0
                           THEN CAST(o_orderkey AS VARCHAR)
                           ELSE 'x' || o_orderkey END AS BIGINT) AS parsed
      FROM orders""")),
  )
}
