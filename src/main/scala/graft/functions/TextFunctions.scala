package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data pipeline pack:
  * tokenization, shingling, stopword/quality stats, language-ID
  * scoring, fingerprinting. Everything is built from codegen'd
  * `org.apache.spark.sql.functions` (no UDFs): these run inside
  * whole-stage codegen and scale linearly with the text volume — the
  * 100 TB path is a narrow map over the documents table, no shuffle.
  *
  * Float convention: ratios are produced by a single int/int → double
  * division (and rational arithmetic on those), which is bit-identical
  * across engines — keeps the DuckDB oracle exact. No transcendentals.
  */
object TextFunctions {

  /** Whitespace tokenization (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Type-token ratio: lexical diversity in [0,1]. */
  def typeTokenRatio(text: Column): Column =
    distinctTokenCount(text).cast("double") / tokenCount(text)

  /** Word n-gram shingles (distinct), the unit for Jaccard / MinHash
    * dedup. Short docs (< n tokens) collapse to one whole-text shingle.
    *
    * Prefer [[shinglesFromTokens]] over an already-projected token
    * column in hot paths: this convenience form embeds `split(text)`
    * at every reference site, and the lambda slices re-run the regex
    * split per shingle position (plus Catalyst's pushed-down not-null
    * filters re-evaluate the whole tree — measured 3-4× per-row
    * blowup on the inverted-index build). */
  def shingles(text: Column, n: Int): Column = shinglesFromTokens(tokens(text), n)

  /** Shingles over a materialized token-array column. Hoisting the
    * tokenization into its own projection means the split happens once
    * per row — CollapseProject declines to inline a non-cheap
    * expression referenced more than once, so the projection boundary
    * survives optimization. */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " "))))
      .otherwise(array(array_join(toks, " ")))

  /** |tokens ∩ wordlist|. */
  def wordlistHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(typedLit(words), t)))

  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    wordlistHits(text, stopwords).cast("double") / tokenCount(text)

  /** Mean token length, derived arithmetically from char count (single
    * division keeps it oracle-exact): (chars - (n-1) separators) / n. */
  def meanTokenLength(text: Column): Column =
    (length(text) - (tokenCount(text) - lit(1))).cast("double") / tokenCount(text)

  /** Language-ID by stopword-profile hit counting. Profiles are checked
    * in declaration order; the first language whose hit count is maximal
    * and positive wins; zero hits everywhere → "und". A real n-gram
    * model drops in behind the same Column contract.
    *
    * Shape: ONE `aggregate` pass — split once, count every profile's
    * hits into one int array, decide the argmax in the finish lambda
    * (where the accumulator is a lambda VARIABLE: reading it per
    * profile is free). The per-profile `size(filter(tokens(…)))` form
    * this replaces re-evaluated the split inside every hit count AND
    * every max comparison — higher-order functions are interpreted
    * (no codegen subexpression elimination), so a P-profile argmax
    * cost ~P(P+1) full token passes per document: measured 20× at 10×
    * data on the confusion-matrix query, entirely this constant. */
  def langId(text: Column, profiles: Seq[(String, Seq[String])]): Column =
    // coalesce: a NULL text must read "und" like the when-chain form
    // did (aggregate propagates NULL; the SQL CASE both oracles use
    // falls through to the ELSE)
    coalesce(aggregate(
      tokens(text),
      array(profiles.map(_ => lit(0)): _*),
      (acc, t) => array(profiles.zipWithIndex.map { case ((_, words), i) =>
        element_at(acc, i + 1) +
          when(array_contains(typedLit(words), t), lit(1)).otherwise(lit(0))
      }: _*),
      acc => {
        val hs = profiles.indices.map(i => element_at(acc, i + 1))
        val maxHits = hs.reduce((a, b) => greatest(a, b))
        profiles.zipWithIndex.foldRight(lit("und")) {
          case (((lang, _), i), els) =>
            when(hs(i) === maxHits && hs(i) > 0, lit(lang)).otherwise(els)
        }
      }), lit("und"))

  /** English/German/French/Spanish marker profiles (tiny but real). */
  val defaultProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
  )

  /** Content fingerprint: md5 over the sorted distinct token set —
    * stable under token reordering (bag-of-words duplicate catcher). */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " ").cast("binary"))

  /** Exact-duplicate hash: md5 of the raw utf-8 bytes. */
  def exactHash(text: Column): Column = md5(text.cast("binary"))

  /** BPE-ish sub-word pieces: maximal runs of letters / digits /
    * single other non-space chars — the pre-tokenization regex shape a
    * byte-pair tokenizer applies before merges. */
  def bpePieces(text: Column): Column =
    regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  def bpePieceCount(text: Column): Column = size(bpePieces(text))

  /** Polynomial rolling hash over the character stream:
    * h ← (31·h + ascii(c)) mod 1e9+7. Stays in long range (no overflow)
    * so it is expressible identically in ANSI SQL for the oracle. */
  def rollingHash(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31L + c) % 1000000007L)

  /** Composite quality score in [0,1] from rational-only arithmetic:
    * 0.5·stopword-ratio + 0.3·min(n_tokens,100)/100 + 0.2·[3 ≤ mean token len ≤ 8]. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    stopwordRatio(text, stopwords) * lit(0.5) +
      (least(tokenCount(text), lit(100)).cast("double") / 100.0) * lit(0.3) +
      when(meanTokenLength(text).between(3.0, 8.0), lit(1.0)).otherwise(lit(0.0)) * lit(0.2)
}
