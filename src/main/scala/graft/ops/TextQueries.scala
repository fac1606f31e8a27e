package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Text-analysis pack over the `documents` table: token statistics,
  * quality scoring, language-ID, fingerprinting. All pure narrow
  * projections (codegen'd, shuffle-free) — the 100 TB path is
  * embarrassingly parallel over document partitions.
  */
object TextQueries {
  import Tables.load

  private val stop = Seq("the", "a", "of", "and", "to")

  val all: Seq[Q] = Seq(

    // Token counting: whitespace tokens, distinct types, diversity.
    Q("text_token_stats", (spark, dir) =>
      load(spark, dir, "documents").select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        distinctTokenCount(col("text")).as("n_types"),
        typeTokenRatio(col("text")).as("ttr")),
      oracle = Some("""
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_types,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS ttr
      FROM documents"""), bench = true),

    // Quality scoring: stopword ratio, mean token length, composite
    // score — rational arithmetic only (oracle-exact doubles).
    Q("text_quality", (spark, dir) =>
      load(spark, dir, "documents").select(
        col("doc_id"),
        stopwordRatio(col("text"), stop).as("stopword_ratio"),
        meanTokenLength(col("text")).as("mean_token_len"),
        qualityScore(col("text"), stop).as("quality_score")),
      oracle = Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks, length(text) AS nc
        FROM documents),
      m AS (
        SELECT doc_id,
               CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to'], x))) AS DOUBLE)
                 / len(toks) AS stopword_ratio,
               CAST(nc - (len(toks) - 1) AS DOUBLE) / len(toks) AS mean_token_len,
               len(toks) AS n_tokens
        FROM t)
      SELECT doc_id, stopword_ratio, mean_token_len,
             stopword_ratio * 0.5
             + (CAST(least(n_tokens, 100) AS DOUBLE) / 100.0) * 0.3
             + (CASE WHEN mean_token_len BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.0 END) * 0.2
               AS quality_score
      FROM m""")),

    // Language-ID: stopword-profile hit counting, first-max-wins over
    // (en, de, es, fr), zero hits → 'und'.
    Q("text_langid", (spark, dir) =>
      load(spark, dir, "documents").select(
        col("doc_id"), col("lang").as("lang_label"),
        langId(col("text"), defaultProfiles).as("lang_pred"),
        wordlistHits(col("text"), defaultProfiles.head._2).as("en_hits")),
      oracle = Some("""
      WITH h AS (
        SELECT doc_id, lang AS lang_label,
          CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and','to'], x))) AS INT) AS en_h,
          CAST(len(list_filter(string_split(text,' '), x -> list_contains(['der','die','das','und','ist'], x))) AS INT) AS de_h,
          CAST(len(list_filter(string_split(text,' '), x -> list_contains(['el','la','los','y','es'], x))) AS INT) AS es_h,
          CAST(len(list_filter(string_split(text,' '), x -> list_contains(['le','la','les','et','est'], x))) AS INT) AS fr_h
        FROM documents)
      SELECT doc_id, lang_label,
             CASE
               WHEN en_h = greatest(en_h, de_h, es_h, fr_h) AND en_h > 0 THEN 'en'
               WHEN de_h = greatest(en_h, de_h, es_h, fr_h) AND de_h > 0 THEN 'de'
               WHEN es_h = greatest(en_h, de_h, es_h, fr_h) AND es_h > 0 THEN 'es'
               WHEN fr_h = greatest(en_h, de_h, es_h, fr_h) AND fr_h > 0 THEN 'fr'
               ELSE 'und'
             END AS lang_pred,
             en_h AS en_hits
      FROM h""")),

    // Language-ID CONFUSION MATRIX — the evaluation every classifier
    // heuristic owes its users: predicted-vs-labeled counts plus the
    // per-label hit rate in exact ppm. One tagging pass + one
    // (labels × predictions)-key aggregation; how the engine grades
    // its own `text_langid` operator at corpus scale.
    Q("text_lang_confusion", (spark, dir) =>
      load(spark, dir, "documents")
        .select(col("lang").as("lang_label"),
          langId(col("text"), defaultProfiles).as("lang_pred"))
        .groupBy(col("lang_label"), col("lang_pred"))
        .agg(count(lit(1)).as("n")),
      oracle = Some("""
      WITH h AS (
        SELECT lang AS lang_label,
          CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and','to'], x))) AS INT) AS en_h,
          CAST(len(list_filter(string_split(text,' '), x -> list_contains(['der','die','das','und','ist'], x))) AS INT) AS de_h,
          CAST(len(list_filter(string_split(text,' '), x -> list_contains(['el','la','los','y','es'], x))) AS INT) AS es_h,
          CAST(len(list_filter(string_split(text,' '), x -> list_contains(['le','la','les','et','est'], x))) AS INT) AS fr_h
        FROM documents),
      p AS (
        SELECT lang_label,
               CASE
                 WHEN en_h = greatest(en_h, de_h, es_h, fr_h) AND en_h > 0 THEN 'en'
                 WHEN de_h = greatest(en_h, de_h, es_h, fr_h) AND de_h > 0 THEN 'de'
                 WHEN es_h = greatest(en_h, de_h, es_h, fr_h) AND es_h > 0 THEN 'es'
                 WHEN fr_h = greatest(en_h, de_h, es_h, fr_h) AND fr_h > 0 THEN 'fr'
                 ELSE 'und'
               END AS lang_pred
        FROM h)
      SELECT lang_label, lang_pred, count(*) AS n
      FROM p GROUP BY 1, 2""")),

    // Document fingerprinting: exact-bytes hash, order-invariant
    // bag-of-words fingerprint, and a polynomial rolling hash.
    Q("text_fingerprint", (spark, dir) =>
      load(spark, dir, "documents").select(
        col("doc_id"),
        exactHash(col("text")).as("fp_exact"),
        fingerprint(col("text")).as("fp_bow"),
        rollingHash(col("text")).as("fp_rolling")),
      oracle = Some("""
      SELECT doc_id, md5(text) AS fp_exact,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp_bow,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
               (acc, c) -> (acc * 31 + c) % 1000000007) AS fp_rolling
      FROM documents""")),

    // Edit-distance near-duplicates, scalably: all-pairs Levenshtein is
    // O(n²·len²), so candidates come from the shingle inverted index at
    // a permissive Jaccard (≥ 0.3) and only those few pairs pay the
    // exact Levenshtein verification (dist ≤ len/4). The oracle mirrors
    // the same candidate+verify composition.
    Q("text_levenshtein_near", (spark, dir) => {
      val docs = load(spark, dir, "documents")
      val cand = graft.dedup.ExactJaccard.pairs(docs, "doc_id", "text", "lang",
        shingleN = 3, threshold = 0.3).select(col("id_a"), col("id_b"))
      val texts = docs.select(col("doc_id"), col("text"))
      cand
        .join(texts.select(col("doc_id").as("id_a"), col("text").as("ta")), "id_a")
        .join(texts.select(col("doc_id").as("id_b"), col("text").as("tb")), "id_b")
        // length-difference pre-filter: |len_a − len_b| is a lower
        // bound on the edit distance, so this rejects pairs BEFORE the
        // O(len²) Levenshtein without changing the result set
        .filter(abs(length(col("ta")) - length(col("tb"))) * 4
          <= greatest(length(col("ta")), length(col("tb"))))
        .withColumn("dist", levenshtein(col("ta"), col("tb")))
        .filter(col("dist") * 4 <= greatest(length(col("ta")), length(col("tb"))))
        .select(col("id_a"), col("id_b"), col("dist"))
    }, oracle = Some("""
      WITH d AS (
        SELECT doc_id, lang, text,
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
      cand AS (
        SELECT id_a, id_b FROM cnt
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.3)
      SELECT id_a, id_b,
             CAST(levenshtein(da.text, db.text) AS INT) AS dist
      FROM cand JOIN d da ON da.doc_id = id_a
                JOIN d db ON db.doc_id = id_b
      WHERE levenshtein(da.text, db.text) * 4
              <= greatest(length(da.text), length(db.text))""")),

    // BPE-ish sub-word pre-tokenization: piece counts vs whitespace
    // tokens (the token-budget estimator a training pipeline runs).
    Q("text_bpe_tokens", (spark, dir) =>
      load(spark, dir, "documents").select(
        col("doc_id"),
        bpePieceCount(col("text")).as("n_pieces"),
        tokenCount(col("text")).as("n_ws_tokens"),
        (bpePieceCount(col("text")).cast("double") / tokenCount(col("text")))
          .as("pieces_per_token")),
      oracle = Some("""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS n_pieces,
             CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
             CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS DOUBLE)
               / len(string_split(text, ' ')) AS pieces_per_token
      FROM documents""")),

    // PII redaction — the scrub pass a curation pipeline runs before
    // training: emails and phone-shaped spans are replaced with typed
    // placeholder tokens and counted. (The corpus is synthetic, so
    // deterministic PII is appended per doc to exercise the patterns;
    // the redaction itself is a pure codegen'd projection — no UDF,
    // no shuffle, linear over the corpus at any scale.)
    Q("text_redact_pii", (spark, dir) => {
      val pii = load(spark, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or 555-"), col("doc_id") % 10000).as("t"))
      pii.select(
        col("doc_id"),
        regexp_count(col("t"), lit("[A-Za-z0-9.]+@[A-Za-z0-9.]+")).as("n_emails"),
        regexp_count(col("t"), lit("555-[0-9]+")).as("n_phones"),
        regexp_replace(
          regexp_replace(col("t"), "[A-Za-z0-9.]+@[A-Za-z0-9.]+", "[EMAIL]"),
          "555-[0-9]+", "[PHONE]").as("clean_text"))
    }, oracle = Some("""
      WITH p AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com or 555-'
                    || (doc_id % 10000) AS t
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '[A-Za-z0-9.]+@[A-Za-z0-9.]+')) AS INT) AS n_emails,
             CAST(len(regexp_extract_all(t, '555-[0-9]+')) AS INT) AS n_phones,
             regexp_replace(regexp_replace(t,
               '[A-Za-z0-9.]+@[A-Za-z0-9.]+', '[EMAIL]', 'g'),
               '555-[0-9]+', '[PHONE]', 'g') AS clean_text
      FROM p""")),

    // Within-document REPETITION ratio — the Gopher/MassiveText "no
    // duplicate n-grams" signal: fraction of a document's 3-gram
    // multiset that is repeated (1 − distinct/total). Raw (multiset)
    // shingles here, NOT the deduped index shingles — repetition IS
    // the duplication the index throws away. Pure narrow projection;
    // the ratio is an exact int/int division (cross-engine-identical),
    // so the 0.2 repetitiveness cut cannot flip.
    Q("text_repetition_ratio", (spark, dir) => {
      val toks = load(spark, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"))
      val sh = toks.select(col("doc_id"),
        when(size(col("toks")) >= 3,
          transform(sequence(lit(0), size(col("toks")) - 3),
            i => array_join(slice(col("toks"), i + lit(1), lit(3)), " ")))
          .otherwise(array().cast("array<string>")).as("sh"))
      sh.select(col("doc_id"),
          size(col("sh")).cast("long").as("n_shingles"),
          size(array_distinct(col("sh"))).cast("long").as("n_distinct"))
        .withColumn("rep_ratio",
          when(col("n_shingles") > 0,
            lit(1.0) - col("n_distinct").cast("double") / col("n_shingles"))
            .otherwise(lit(0.0)))
        .withColumn("is_repetitive", col("rep_ratio") > 0.2)
    }, oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      m AS (
        SELECT doc_id,
               CASE WHEN len(toks) >= 3 THEN len(toks) - 2 ELSE 0 END AS n_shingles,
               CASE WHEN len(toks) >= 3
                    THEN len(list_distinct(list_transform(
                           range(1, len(toks) - 1),
                           i -> array_to_string(toks[i:i+2], ' '))))
                    ELSE 0 END AS n_distinct
        FROM t)
      SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
             CAST(n_distinct AS BIGINT) AS n_distinct,
             CASE WHEN n_shingles > 0
                  THEN 1.0 - CAST(n_distinct AS DOUBLE) / n_shingles
                  ELSE 0.0 END AS rep_ratio,
             (CASE WHEN n_shingles > 0
                   THEN 1.0 - CAST(n_distinct AS DOUBLE) / n_shingles
                   ELSE 0.0 END) > 0.2 AS is_repetitive
      FROM m""")),

    // CROSS-DOC REPEATED-SPAN audit — the "exact substring
    // deduplication" signal (contiguous runs of shingles that also
    // appear in other documents: boilerplate, licenses, templated
    // text). Positions whose 3-gram shingle occurs in ≥2 distinct
    // docs are marked via the inverted postings (one groupBy — never
    // an all-pairs scan), then per-doc gaps-and-islands (pos −
    // row_number, doc-partitioned window) finds MAXIMAL runs; runs of
    // ≥5 shingles (≥7 tokens) count as spans. At 100 TB the postings
    // are df-capped like the dedup index and every window is
    // doc-partitioned — the run detection never leaves the document.
    Q("text_repeated_spans", (spark, dir) => {
      val docs = load(spark, dir, "documents")
      val sh = docs
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          when(size(col("toks")) >= 3,
            transform(sequence(lit(0), size(col("toks")) - 3),
              i => array_join(slice(col("toks"), i + lit(1), lit(3)), " ")))
            .otherwise(array().cast("array<string>")).as("sh"))
        .select(col("doc_id"), posexplode(col("sh")).as(Seq("pos", "shingle")))
      val repeated = sh.select(col("shingle"), col("doc_id")).distinct()
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2).select(col("shingle"))
      val marked = sh.join(repeated, Seq("shingle"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val runs = marked
        .withColumn("grp", col("pos") - row_number().over(w))
        .groupBy(col("doc_id"), col("grp"))
        .agg(count(lit(1)).as("run_len"))
        .filter(col("run_len") >= 5)
      val perDoc = runs.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_spans"),
        max(col("run_len")).as("longest_run"),
        sum(col("run_len") + lit(2)).as("span_tokens"))
      docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("longest_run"), lit(0L)).as("longest_run"),
          coalesce(col("span_tokens"), lit(0L)).as("span_tokens"))
    }, oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      sh AS (
        SELECT doc_id,
               unnest(range(1, greatest(len(toks) - 1, 1))) AS pos,
               unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                      i -> array_to_string(toks[i:i+2], ' '))) AS shingle
        FROM t),
      rep AS (
        SELECT shingle FROM (SELECT DISTINCT shingle, doc_id FROM sh)
        GROUP BY shingle HAVING count(*) >= 2),
      runs AS (
        SELECT doc_id, grp, count(*) AS run_len FROM (
          SELECT s.doc_id, s.pos,
                 s.pos - row_number() OVER (PARTITION BY s.doc_id ORDER BY s.pos) AS grp
          FROM sh s JOIN rep r USING (shingle))
        GROUP BY doc_id, grp HAVING count(*) >= 5),
      per AS (
        SELECT doc_id, count(*) AS n_spans, max(run_len) AS longest_run,
               CAST(sum(run_len + 2) AS BIGINT) AS span_tokens
        FROM runs GROUP BY doc_id)
      SELECT d.doc_id,
             COALESCE(n_spans, 0) AS n_spans,
             COALESCE(longest_run, 0) AS longest_run,
             COALESCE(span_tokens, 0) AS span_tokens
      FROM documents d LEFT JOIN per USING (doc_id)""")),

    // WINSORIZED corpus statistics — robust per-language length stats
    // with the top and bottom DECILE of documents (by n_chars, doc_id
    // tiebreak — a total order) trimmed before aggregating: the
    // outlier-insensitive report a corpus healthcheck runs. The decile
    // assignment is the shared DISTRIBUTED two-phase rank
    // ([[CurationQueries.distributedNtile]] — range partition + local
    // row_number + broadcast offsets), so the global order never
    // funnels through one task; the trimmed aggregation is one keyed
    // pass. All sums are exact longs; means are single int/int double
    // divisions — bit-identical to the oracle's ntile.
    Q("text_winsorized_stats", (spark, dir) => {
      val d = load(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          tokenCount(col("text")).cast("long").as("n_tokens"))
      CurationQueries.distributedNtile(d, 10, 16, col("n_chars"), col("doc_id"))
        .filter(col("tier").between(2, 9))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("n_tokens")).as("sum_tokens"))
        .withColumn("mean_chars",
          col("sum_chars").cast("double") / col("n_docs"))
        .withColumn("mean_tokens",
          col("sum_tokens").cast("double") / col("n_docs"))
    }, oracle = Some("""
      WITH t AS (
        SELECT doc_id, lang, n_chars,
               len(string_split(text, ' ')) AS n_tokens,
               ntile(10) OVER (ORDER BY n_chars, doc_id) AS tier
        FROM documents)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
             CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean_chars,
             CAST(sum(n_tokens) AS DOUBLE) / count(*) AS mean_tokens
      FROM t WHERE tier BETWEEN 2 AND 9 GROUP BY lang""")),

    // CODE-SWITCHING detection — the mixed-language filter a
    // multilingual corpus runs before per-language sharding: each doc
    // is split into 8-token chunks (the paragraph stand-in shared with
    // `dedup_paragraphs`), every chunk is language-tagged by the same
    // wordlist heuristic as `text_langid`, and the doc reports its
    // DOMINANT chunk language (ties broken lexicographically), how
    // many chunks agree, and the switching ratio in exact ppm. One
    // explode pass + two keyed aggregations; the dominant-language
    // argmax is a hash-aggregate min over (−count, lang) — no window,
    // no sort.
    Q("text_code_switching", (spark, dir) => {
      val C = 8
      val tagged = load(spark, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), explode(transform(
          sequence(lit(0), ((size(col("toks")) - 1) / C).cast("int")),
          i => array_join(slice(col("toks"), i * C + 1, lit(C)), " "))).as("chunk"))
        .select(col("doc_id"), langId(col("chunk"), defaultProfiles).as("cl"))
      tagged.groupBy(col("doc_id"), col("cl"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("n_chunks"),
          min(struct((-col("n")).as("negn"), col("cl"))).as("d"))
        .select(col("doc_id"), col("n_chunks"),
          col("d.cl").as("dominant_lang"),
          (-col("d.negn")).as("n_dominant"),
          ((col("n_chunks") + col("d.negn")) * 1000000L / col("n_chunks"))
            .cast("long").as("switch_ppm"))
    }, oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      ch AS (
        SELECT doc_id,
               array_to_string(toks[u.pos*8+1 : u.pos*8+8], ' ') AS chunk
        FROM t, LATERAL (SELECT unnest(range(0, (len(toks) - 1) // 8 + 1)) AS pos) u),
      h AS (
        SELECT doc_id,
          CAST(len(list_filter(string_split(chunk,' '), x -> list_contains(['the','a','of','and','to'], x))) AS INT) AS en_h,
          CAST(len(list_filter(string_split(chunk,' '), x -> list_contains(['der','die','das','und','ist'], x))) AS INT) AS de_h,
          CAST(len(list_filter(string_split(chunk,' '), x -> list_contains(['el','la','los','y','es'], x))) AS INT) AS es_h,
          CAST(len(list_filter(string_split(chunk,' '), x -> list_contains(['le','la','les','et','est'], x))) AS INT) AS fr_h
        FROM ch),
      tg AS (
        SELECT doc_id,
               CASE
                 WHEN en_h = greatest(en_h, de_h, es_h, fr_h) AND en_h > 0 THEN 'en'
                 WHEN de_h = greatest(en_h, de_h, es_h, fr_h) AND de_h > 0 THEN 'de'
                 WHEN es_h = greatest(en_h, de_h, es_h, fr_h) AND es_h > 0 THEN 'es'
                 WHEN fr_h = greatest(en_h, de_h, es_h, fr_h) AND fr_h > 0 THEN 'fr'
                 ELSE 'und'
               END AS cl
        FROM h),
      cnt AS (SELECT doc_id, cl, CAST(count(*) AS BIGINT) AS n
              FROM tg GROUP BY 1, 2),
      dom AS (
        SELECT doc_id, cl, n,
               row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, cl) AS rk,
               sum(n) OVER (PARTITION BY doc_id) AS n_chunks
        FROM cnt)
      SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks, cl AS dominant_lang,
             n AS n_dominant,
             CAST((n_chunks - n) * 1000000 // n_chunks AS BIGINT) AS switch_ppm
      FROM dom WHERE rk = 1""")),

    // BIGRAM FAMILIARITY — the corpus-statistics LM-score proxy: train
    // a bigram "model" (global bigram counts) over the whole corpus in
    // one keyed aggregation, then score each document by the mean
    // corpus frequency of its own bigrams. Boilerplate/templated text
    // (bigrams everyone uses) scores high; novel prose scores low —
    // the count-based stand-in for perplexity filtering that needs no
    // log/exp (rational arithmetic only, so the doubles are oracle-
    // exact). Both passes shuffle keyed BY BIGRAM (count with map-side
    // combine, then one join back) — linear in total tokens at any
    // corpus size, never quadratic in vocabulary. Single-token docs
    // have no bigram and drop, mirrored in the oracle.
    Q("text_bigram_familiarity", (spark, dir) => {
      val bi = load(spark, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))")).as("bg"))
      val counts = bi.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
      bi.join(counts, "bg")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("cnt")).as("freq_sum"))
        .select(col("doc_id"), col("n_bigrams"), col("freq_sum"),
          (col("freq_sum").cast("double") / col("n_bigrams")).as("familiarity"))
    }, oracle = Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      b AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                 i -> toks[i] || ' ' || toks[i+1])) AS bg
        FROM t WHERE len(toks) >= 2),
      c AS (SELECT bg, count(*) AS cnt FROM b GROUP BY 1)
      SELECT b.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(c.cnt) AS BIGINT) AS freq_sum,
             CAST(sum(c.cnt) AS DOUBLE) / count(*) AS familiarity
      FROM b JOIN c USING (bg) GROUP BY b.doc_id""")),

    // BM25-shaped retrieval scoring — the IR ranking function next to
    // the TF-IDF pack: k1=1.2, b=0.75, with the RATIONAL idf surrogate
    // (N−df+0.5)/(df+0.5) in place of its log (transcendental-free:
    // the surrogate is strictly monotone in the true idf, and libm ln
    // differs across engines in the last ulp). The query = the 3 most
    // frequent non-stopword corpus terms, derived identically on both
    // sides; per-doc scores fold over the term scores in SORTED term
    // order (a sequential double fold — bit-identical cross-engine,
    // the same discipline as every vector score here). Selection is
    // the distributed top-20 heap. At 100 TB: tf/df are one
    // shuffle each, the query-term frame is a 3-row broadcast, and
    // scoring is a narrow projection — the inverted-index shape
    // shared with the TF-IDF/decontamination queries.
    Q("text_bm25_topk", (spark, dir) => {
      val toks = load(spark, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("nd"), sum(col("dl")).as("tt"))
      val dfr = tf.groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("ctf"))
      val qterms = broadcast(dfr.filter(!col("term").isin(stop: _*))
        .orderBy(col("ctf").desc, col("term")).limit(3)
        .select(col("term"), col("df")))
      tf.join(qterms, Seq("term"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .withColumn("s",
          ((col("nd").cast("double") - col("df").cast("double") + lit(0.5))
            / (col("df").cast("double") + lit(0.5)))
            * (col("tf").cast("double") * lit(2.2))
            / (col("tf").cast("double") + (lit(0.3) + lit(0.9)
              * ((col("dl").cast("double") * col("nd").cast("double"))
                / col("tt").cast("double")))))
        .groupBy(col("doc_id"))
        .agg(
          aggregate(array_sort(collect_list(struct(col("term"), col("s")))),
            lit(0.0), (acc, x) => acc + x.getField("s")).as("score"),
          count(lit(1)).as("n_hit"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }, oracle = Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             FROM toks GROUP BY 1, 2),
      dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
             FROM toks GROUP BY 1),
      stats AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                       CAST(sum(dl) AS BIGINT) AS tt FROM dl),
      dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
                     CAST(sum(tf) AS BIGINT) AS ctf
              FROM tf GROUP BY 1),
      qterms AS (
        SELECT term, df FROM dfr
        WHERE term NOT IN ('the','a','of','and','to')
        ORDER BY ctf DESC, term LIMIT 3),
      ts AS (
        SELECT t.doc_id, t.term,
               ((CAST(s.nd AS DOUBLE) - CAST(q.df AS DOUBLE) + 0.5)
                 / (CAST(q.df AS DOUBLE) + 0.5))
                 * (CAST(t.tf AS DOUBLE) * 2.2)
                 / (CAST(t.tf AS DOUBLE) + (0.3 + 0.9
                   * ((CAST(d.dl AS DOUBLE) * CAST(s.nd AS DOUBLE))
                     / CAST(s.tt AS DOUBLE)))) AS s
        FROM tf t
        JOIN qterms q ON q.term = t.term
        JOIN dl d ON d.doc_id = t.doc_id, stats s),
      folded AS (
        SELECT doc_id,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(s ORDER BY term)), (acc, x) -> acc + x) AS score,
               count(*) AS n_hit
        FROM ts GROUP BY doc_id)
      SELECT doc_id, score, n_hit FROM folded
      ORDER BY score DESC, doc_id LIMIT 20""")),
  )
}
