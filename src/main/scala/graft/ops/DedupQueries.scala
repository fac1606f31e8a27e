package graft.ops

import graft.dedup.{MinHashLSH, SimHash}
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
    // truth for fuzzy dedup. Quadratic within blocks; usable as an
    // oracle/recall-check, not the 100 TB path (that's the LSH below).
    Q("dedup_ngram_jaccard", (spark, dir) => {
      val d = load(spark, dir, "documents").select(
        col("doc_id"), col("lang"),
        TextFunctions.shingles(col("text"), 3).as("sh"))
      val a = d.select(col("lang"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val b = d.select(col("lang"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
      val inter = size(array_intersect(col("sh_a"), col("sh_b")))
      a.join(b, Seq("lang"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("jaccard",
          inter.cast("double") / (size(col("sh_a")) + size(col("sh_b")) - inter))
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }, oracle = Some("""
      WITH d AS (
        SELECT doc_id, lang,
               CASE WHEN len(string_split(text,' ')) >= 3
                    THEN list_distinct(list_transform(
                           range(1, len(string_split(text,' ')) - 1),
                           i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))
                    ELSE [text] END AS sh
        FROM documents)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5""")),

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
