package graft.ops

import graft.dedup.{DedupClusters, ExactJaccard, MinHashLSH, SimHash}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Deduplication pack over `documents`: exact hash-groupBy, exact
  * n-gram Jaccard (the ground truth), MinHash+LSH and SimHash (the
  * scale paths). The exact variants carry DuckDB oracles; the LSH
  * variants are algorithm-specific (xxhash64 permutations are not
  * expressible in ANSI SQL) → rows-only checks, with scalatest suites
  * asserting they recover the exact-Jaccard truth on the test corpus.
  */
object DedupQueries {
  import Tables.load

  val all: Seq[Q] = Seq(

    // Exact dedup: one survivor (min doc_id) per identical text.
    Q("dedup_exact", (spark, dir) =>
      load(spark, dir, "documents")
        .groupBy(TextFunctions.exactHash(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies")),
      oracle = Some("""
      SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
      FROM documents GROUP BY md5(text)""")),

    // Exact 3-gram-shingle Jaccard over lang-blocked pairs — ground
    // truth for fuzzy dedup, computed with the inverted-index join
    // (pair space generated only by co-occurring shingles; see
    // [[graft.dedup.ExactJaccard]]). The oracle mirrors the same
    // inverted-index formulation.
    Q("dedup_ngram_jaccard", (spark, dir) =>
      ExactJaccard.pairs(load(spark, dir, "documents"), "doc_id", "text", "lang",
        shingleN = 3, threshold = 0.5),
      oracle = Some("""
      WITH d AS (
        SELECT doc_id, lang,
               CASE WHEN len(string_split(text,' ')) >= 3
                    THEN list_distinct(list_transform(
                           range(1, len(string_split(text,' ')) - 1),
                           i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))
                    ELSE [text] END AS sh
        FROM documents),
      ex AS (SELECT doc_id, lang, unnest(sh) AS s FROM d),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        FROM ex a JOIN ex b
          ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      sizes AS (SELECT doc_id, len(sh) AS n FROM d)
      SELECT id_a, id_b,
             CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
      FROM pairs JOIN sizes sa ON sa.doc_id = id_a
                 JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5"""), bench = true),

    // Duplicate clusters: connected components over the exact-Jaccard
    // pair graph, canonical survivor = min doc_id. Oracle recomputes the
    // components with a recursive transitive-closure CTE.
    Q("dedup_clusters", (spark, dir) => {
      val pairs = ExactJaccard.pairs(load(spark, dir, "documents"),
        "doc_id", "text", "lang", shingleN = 3, threshold = 0.5)
      DedupClusters.components(pairs, "id_a", "id_b")
        .select(col("node").as("doc_id"), col("cluster_id"),
          (col("node") === col("cluster_id")).as("is_survivor"))
    }, oracle = Some("""
      WITH RECURSIVE d AS (
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
      reach(node, r) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, r.r FROM edges e JOIN reach r ON r.node = e.b)
      SELECT node AS doc_id, min(r) AS cluster_id,
             node = min(r) AS is_survivor
      FROM reach GROUP BY node""")),

    // MinHash + banded LSH — the linear-ish scale path. Rows-only here;
    // recall vs dedup_ngram_jaccard is asserted in DedupSpec.
    Q("dedup_minhash_lsh", (spark, dir) =>
      MinHashLSH.duplicatePairs(load(spark, dir, "documents"), "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))),

    // SimHash with pigeonhole blocking — rows-only; recall asserted in
    // DedupSpec.
    Q("dedup_simhash", (spark, dir) =>
      SimHash.duplicatePairs(load(spark, dir, "documents"), "doc_id", "text", maxDist = 3)
        .orderBy(col("id_a"), col("id_b"))),
  )
}
