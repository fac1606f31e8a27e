package graft.ops

import graft.dedup.ExactJaccard
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-pattern pack: the shapes a 100 TB deployment actually runs —
  * salted two-phase aggregation, salted skew joins, sketch-accuracy
  * contracts, stratified per-group sampling, and exact integer
  * PageRank over the duplicate graph. Each query's RESULT is
  * deliberately equal to a plain declarative form (salting and
  * two-phase execution must never change answers), so the DuckDB
  * oracle both checks correctness and PROVES the rewrite is
  * semantics-preserving.
  */
object ScaleQueries {
  import Tables.load

  val all: Seq[Q] = Seq(

    // Two-phase salted aggregation: groupBy(key, salt) partial → final
    // groupBy(key). On a skewed key distribution the hot key fans out
    // across `salt` tasks in phase 1 instead of melting one reducer.
    // Decimal partial sums keep the total EXACTLY equal to the plain
    // single-phase aggregate (decimal addition is associative), which
    // is what the plain-GROUP-BY oracle asserts.
    Q("agg_salted_twophase", (spark, dir) => {
      val ev = Tables.loadEvents(spark, dir)
      val partial = ev
        .withColumn("salt", pmod(xxhash64(col("event_id")), lit(16L)))
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("pn"),
          sum(col("value").cast("decimal(18,2)")).as("pv"))
      partial.groupBy(col("event_type"))
        .agg(sum(col("pn")).as("n_events"),
          sum(col("pv")).cast("double").as("total_value"))
    }, oracle = Some("""
      SELECT event_type, count(*) AS n_events,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
               AS total_value
      FROM events GROUP BY event_type""")),

    // Salted skew join (Scale.saltedLeftJoin): the left side spreads a
    // hot key over 16 sub-keys, the small side replicates per salt.
    // Row-identical to the plain join — asserted by the plain-SQL
    // oracle over the aggregated result.
    Q("join_salted_skew", (spark, dir) => {
      val li = load(spark, dir, "lineitem")
        .select(col("l_suppkey"), col("l_extendedprice"))
      val s = load(spark, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      Scale.saltedLeftJoin(li, s, Seq("l_suppkey"), col("l_extendedprice"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"))
    }, oracle = Some("""
      SELECT s_nationkey, count(*) AS n_lines,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE)
               AS revenue
      FROM lineitem LEFT JOIN supplier ON s_suppkey = l_suppkey
      GROUP BY s_nationkey""")),

    // Sketch-accuracy contract for approximate quantiles: the
    // percentile_approx estimate must land between the exact 45th and
    // 55th percentiles (rank-error bound of the KLL/GK-style sketch at
    // the chosen accuracy). Output = exact median + the bound check;
    // the oracle pins the exact values and expects the check true.
    Q("agg_approx_quantile_bound", (spark, dir) => {
      val li = load(spark, dir, "lineitem")
      li.agg(
          expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
          expr("percentile(l_extendedprice, 0.45)").as("lo"),
          expr("percentile(l_extendedprice, 0.55)").as("hi"),
          expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("ap"))
        .select(col("exact_p50"),
          col("ap").between(col("lo"), col("hi")).as("approx_within_decile"))
    }, oracle = Some("""
      SELECT quantile_cont(l_extendedprice, 0.5) AS exact_p50,
             true AS approx_within_decile
      FROM lineitem""")),

    // Stratified fixed-size sampling: 20 docs per language, selected by
    // content-hash order — deterministic reservoir-equivalent sampling
    // (same members on any cluster size / run), one window per stratum.
    Q("sample_stratified_topk", (spark, dir) =>
      graft.functions.Md5Draw.capConstant(load(spark, dir, "documents"),
          Seq(col("lang")), md5(col("text")), col("doc_id"), 20)
        .select(col("lang"), col("doc_id")),
      oracle = Some("""
      SELECT lang, doc_id FROM (
        SELECT lang, doc_id,
               row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rk
        FROM documents) WHERE rk <= 20""")),

    // Heavy-hitter sketch contract: freqItems (Karp-style streaming
    // sketch, one pass, no shuffle of the full stream) guarantees NO
    // FALSE NEGATIVES above the support threshold. The query outputs
    // every exactly-frequent token with a boolean "the sketch caught
    // it"; the oracle pins the exact frequent set and expects every
    // boolean true — the same driver-enforced accuracy-contract shape
    // as the approx-distinct/quantile queries.
    Q("agg_freq_items_contract", (spark, dir) => {
      val tok = load(spark, dir, "documents")
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      val support = 0.01
      val sketch = broadcast(tok.stat.freqItems(Seq("t"), support))
      val total = broadcast(tok.agg(count(lit(1)).as("n_total")))
      tok.groupBy(col("t")).agg(count(lit(1)).as("cnt"))
        .crossJoin(total)
        .filter(col("cnt") > col("n_total") * support)
        .crossJoin(sketch)
        .select(col("t"), col("cnt"),
          array_contains(col("t_freqItems"), col("t")).as("in_sketch"))
    }, oracle = Some("""
      WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS t FROM documents),
      n AS (SELECT count(*) AS n_total FROM tok)
      SELECT t, count(*) AS cnt, true AS in_sketch
      FROM tok, n GROUP BY t, n.n_total
      HAVING count(*) > n_total * 0.01""")),

    // Incremental materialized-view maintenance: a gold aggregate is
    // kept current by COMBINING partial aggregates from the base view
    // and the new batch (full-outer join + coalesced sums) instead of
    // recomputing over all history — the self-maintainable-aggregate
    // algebra (count/sum merge; avg derives from them). Decimal sums
    // make the combined result EXACTLY equal the full recompute, which
    // is what the plain-GROUP-BY oracle asserts. At 100 TB the base
    // never rescans: maintenance cost ∝ batch size.
    Q("agg_incremental_maintain", (spark, dir) => {
      val ev = Tables.loadEvents(spark, dir)
      def part(pred: org.apache.spark.sql.Column) = ev.filter(pred)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("v"))
      val base = part(col("event_id") % 10 < 8)
        .select(col("event_type"), col("n").as("bn"), col("v").as("bv"))
      val delta = part(col("event_id") % 10 >= 8)
        .select(col("event_type"), col("n").as("dn"), col("v").as("dv"))
      base.join(delta, Seq("event_type"), "full_outer")
        .select(col("event_type"),
          (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_events"),
          (coalesce(col("bv"), lit(java.math.BigDecimal.ZERO).cast("decimal(28,2)"))
            + coalesce(col("dv"), lit(java.math.BigDecimal.ZERO).cast("decimal(28,2)")))
            .cast("double").as("total_value"))
    }, oracle = Some("""
      SELECT event_type, count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY event_type""")),

    // Exact integer PageRank (3 unrolled power iterations, damping
    // 85/100) over the duplicate-pair graph: ranks are 2^40-scaled
    // integers and every step is integer division/summation, so the
    // result is bit-exact on any engine and any partitioning — the
    // floating-point order-dependence that normally makes distributed
    // PageRank unreproducible is gone by construction. Iterations are
    // map-side joins on the (small) edge list; at web scale the same
    // unrolled plan runs on a bucketed edge table.
    Q("graph_pagerank_dups", (spark, dir) => {
      val pairs = ExactJaccard.pairs(load(spark, dir, "documents"),
        "doc_id", "text", "lang", shingleN = 3, threshold = 0.5)
        .select(col("id_a").as("a"), col("id_b").as("b"))
      val edges = pairs.union(pairs.select(col("b").as("a"), col("a").as("b")))
        .distinct().localCheckpoint(true)
      // deg is referenced by every iteration (twice per round + the
      // rank seed); left lazy each reference re-aggregates the edge
      // list — 7 E-sized aggregations instead of 1 at scale. One
      // node-sized materialization (guide §3.3).
      // CLUSTER CAVEAT: localCheckpoint blocks are executor-local and
      // non-replicated — on a real cluster, losing an executor makes
      // this truncated lineage unrecoverable MID-QUERY and fails the
      // job (it re-runs clean; the query is a deterministic batch).
      // Deployments that cannot afford the retry set a reliable
      // checkpoint dir and swap these for .checkpoint(), trading the
      // re-run risk for a DFS round-trip per materialization.
      val deg = edges.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      var ranks: DataFrame = deg.select(col("node"), lit(1L << 40).as("rank"))
      for (_ <- 1 to 3) {
        val contribs = edges
          .join(ranks.withColumnRenamed("node", "a"), "a")
          .join(deg.withColumnRenamed("node", "a"), "a")
          .groupBy(col("b").as("node"))
          .agg(sum(expr("rank div deg")).as("inflow"))
        ranks = deg.select(col("node"))
          .join(contribs, Seq("node"), "left")
          .select(col("node"),
            (lit((15L * (1L << 40)) / 100L)
              + expr("85 * coalesce(inflow, 0L) div 100")).as("rank"))
      }
      ranks
    }, oracle = Some(s"""
      WITH d AS (
        SELECT doc_id, lang,
               CASE WHEN len(string_split(text,' ')) >= 3
                    THEN list_distinct(list_transform(
                           range(1, len(string_split(text,' ')) - 1),
                           i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))
                    ELSE [text] END AS sh
        FROM documents),
      ex AS (SELECT doc_id, lang, unnest(sh) AS s FROM d),
      cnt AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        FROM ex a JOIN ex b
          ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      sizes AS (SELECT doc_id, len(sh) AS n FROM d),
      pairs AS (
        SELECT id_a, id_b FROM cnt
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
      edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
              FROM edges GROUP BY a),
      r0 AS (SELECT node, CAST(1099511627776 AS BIGINT) AS rank FROM deg),
      ${(1 to 3).map(pagerankIterSql).mkString(",\n      ")}
      SELECT node, rank FROM r3""")),

    // Triangle counting over the duplicate-pair graph — the clustering
    // -coefficient building block. Edges are oriented id_a < id_b, so
    // one 3-way self-join enumerates each triangle exactly once
    // (a<b<c); the count is integer-exact. At web scale the same join
    // runs over a degree-ordered bucketed edge table (the standard
    // edge-iterator algorithm); here the edge list is the session's
    // cached pair frame, shared with clusters/pagerank/survivor.
    Q("graph_triangles", (spark, dir) => {
      val e = ExactJaccard.pairs(load(spark, dir, "documents"),
        "doc_id", "text", "lang", shingleN = 3, threshold = 0.5)
        .select(col("id_a").as("a"), col("id_b").as("b"))
      val tri = e.alias("e1")
        .join(e.alias("e2"), col("e1.b") === col("e2.a"))
        .join(e.alias("e3"),
          col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
        .agg(count(lit(1)).as("n_triangles"))
      val edges = e.agg(count(lit(1)).as("n_edges"))
      tri.crossJoin(edges)
    }, oracle = Some("""
      WITH d AS (
        SELECT doc_id, lang,
               CASE WHEN len(string_split(text,' ')) >= 3
                    THEN list_distinct(list_transform(
                           range(1, len(string_split(text,' ')) - 1),
                           i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))
                    ELSE [text] END AS sh
        FROM documents),
      ex AS (SELECT doc_id, lang, unnest(sh) AS s FROM d),
      cnt AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        FROM ex a JOIN ex b
          ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      sizes AS (SELECT doc_id, len(sh) AS n FROM d),
      pairs AS (
        SELECT id_a, id_b FROM cnt
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5)
      SELECT CAST((SELECT count(*) FROM pairs e1
                   JOIN pairs e2 ON e1.id_b = e2.id_a
                   JOIN pairs e3 ON e1.id_a = e3.id_a AND e2.id_b = e3.id_b)
             AS BIGINT) AS n_triangles,
             CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_edges""")),

    // Z-ORDER clustering: interleave the low 16 bits of two join/filter
    // dimensions into a Morton code, bucket by ARITHMETIC ranges of the
    // code (pure column math — no partitioner dependence), and emit
    // per-bucket extents of BOTH dimensions. Z-locality means each
    // bucket's (partkey, suppkey) bounding box is tight on BOTH axes —
    // the multi-dimensional analogue of TxLog.compactClustered's 1-D
    // range clustering, and the layout that lets min/max data skipping
    // prune on either dimension. The extent columns ARE the skipping
    // metadata; the oracle recomputes the identical integer geometry.
    Q("scale_zorder_cluster", (spark, dir) => {
      val a = col("l_partkey").bitwiseAND(lit(0xFFFFL))
      val b = col("l_suppkey").bitwiseAND(lit(0xFFFFL))
      val z = (0 until 16).map { i =>
        (shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
          (shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
      }.reduce(_ + _)
      load(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), z.as("zcode"))
        .withColumn("bucket", expr(s"zcode div ${1L << 26}"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
          min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
    }, oracle = Some(s"""
      WITH z AS (
        SELECT l_partkey, l_suppkey,
               ${(0 until 16).map(i =>
                 s"(((l_partkey & 65535) >> $i) & 1) * ${1L << (2 * i)} + " +
                 s"(((l_suppkey & 65535) >> $i) & 1) * ${1L << (2 * i + 1)}")
                 .mkString(" + ")} AS zcode
        FROM lineitem)
      SELECT zcode // ${1L << 26} AS bucket, count(*) AS n_rows,
             min(l_partkey) AS min_part, max(l_partkey) AS max_part,
             min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
      FROM z GROUP BY 1""")),

    // K-CORE decomposition (k=2) over the duplicate-pair graph — the
    // density filter a dedup pipeline runs to separate docs in densely
    // duplicated neighbourhoods (template farms, mirrored sites) from
    // incidental one-off pairs: repeatedly peel nodes of degree < k
    // until the remainder is a 2-core. Peeling is iterative by nature;
    // three unrolled rounds (a fixpoint on this corpus — round 3 ==
    // round 4, asserted in DedupSpec) keep the plan static: each round
    // is one degree aggregation + two semi-joins over the cached edge
    // frame, O(E) per round at any scale, no driver round-trips. The
    // oracle replays the identical three peels.
    Q("graph_kcore", (spark, dir) => {
      val pairs = ExactJaccard.pairs(load(spark, dir, "documents"),
        "doc_id", "text", "lang", shingleN = 3, threshold = 0.5)
        .select(col("id_a").as("a"), col("id_b").as("b"))
      var edges = pairs
        .union(pairs.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint(true)
      for (_ <- 1 to 3) {
        val keep = edges.groupBy(col("a").as("node"))
          .agg(count(lit(1)).as("d"))
          .filter(col("d") >= 2)
          .select(col("node"))
        // checkpoint each peel: left lazy, round N's plan inlines
        // rounds 1..N-1 once per semi-join side (the r18 plan audit
        // measured the 3-round plan at 1677 formatted lines / 106
        // Exchanges, with earlier rounds re-executed inside each
        // keep subtree). The edge list only shrinks, so each
        // materialization is at most the pair graph (guide §3.3).
        // CLUSTER CAVEAT: executor-local, non-replicated blocks —
        // executor loss mid-query fails the job (clean deterministic
        // re-run); swap for .checkpoint() under a reliable checkpoint
        // dir where that retry is unaffordable (see pagerank's deg).
        edges = edges
          .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
          .select(col("a"), col("b"))
          .localCheckpoint(true)
      }
      edges.groupBy(col("a").as("doc_id"))
        .agg(count(lit(1)).as("core_degree"))
    }, oracle = Some(s"""
      WITH d AS (
        SELECT doc_id, lang,
               CASE WHEN len(string_split(text,' ')) >= 3
                    THEN list_distinct(list_transform(
                           range(1, len(string_split(text,' ')) - 1),
                           i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))
                    ELSE [text] END AS sh
        FROM documents),
      ex AS (SELECT doc_id, lang, unnest(sh) AS s FROM d),
      cnt AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        FROM ex a JOIN ex b
          ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      sizes AS (SELECT doc_id, len(sh) AS n FROM d),
      pairs AS (
        SELECT id_a, id_b FROM cnt
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
      e0 AS (SELECT id_a AS a, id_b AS b FROM pairs
             UNION ALL SELECT id_b, id_a FROM pairs),
      ${(1 to 3).map(kcorePeelSql).mkString(",\n      ")}
      SELECT a AS doc_id, CAST(count(*) AS BIGINT) AS core_degree
      FROM e3 GROUP BY a""")),
  )

  /** One unrolled 2-core peel round as a CTE pair: surviving-node set
    * (degree >= 2) + edge restriction to both-endpoint survivors
    * (mirrors the Spark loop body). */
  private def kcorePeelSql(i: Int): String = {
    val prev = s"e${i - 1}"
    s"""k$i AS (SELECT a AS node FROM $prev GROUP BY a HAVING count(*) >= 2),
       |      e$i AS (
       |        SELECT e.a, e.b FROM $prev e
       |        JOIN k$i x ON e.a = x.node
       |        JOIN k$i y ON e.b = y.node)"""
      .stripMargin
  }

  /** One unrolled integer-PageRank iteration as a CTE pair: inflow
    * aggregation + damped update (mirrors the Spark loop body). */
  private def pagerankIterSql(i: Int): String = {
    val prev = s"r${i - 1}"
    s"""c$i AS (
       |        SELECT e.b AS node,
       |               CAST(sum($prev.rank // deg.deg) AS BIGINT) AS inflow
       |        FROM edges e
       |        JOIN $prev ON $prev.node = e.a
       |        JOIN deg ON deg.node = e.a
       |        GROUP BY e.b),
       |      r$i AS (
       |        SELECT deg.node,
       |               164926744166 + 85 * coalesce(c$i.inflow, 0) // 100 AS rank
       |        FROM deg LEFT JOIN c$i ON c$i.node = deg.node)"""
      .stripMargin
  }
}
