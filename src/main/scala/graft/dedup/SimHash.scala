package graft.dedup

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: 60-bit locality-sensitive content
  * signature; similar documents differ in few bits (small Hamming
  * distance).
  *
  * Signature: for each bit j, sum over tokens of ±1 according to bit j
  * of hash(token); the sign of the sum sets bit j. Built entirely
  * from higher-order array functions — one codegen'd projection per doc.
  *
  * The token hash is deliberately ANSI-SQL-expressible (two polynomial
  * rolling hashes packed into 60 bits, [[tokenHash60]]) rather than
  * xxhash64: hash quality for near-dup voting is equivalent, and it
  * makes the ENTIRE operator — signatures, pigeonhole blocking, and
  * Hamming distances — reproducible by an independent SQL engine, so
  * the driver's DuckDB oracle can hash-match the output instead of a
  * rows-only check.
  *
  * Pairing at scale uses the pigeonhole trick: to find all pairs with
  * Hamming distance ≤ 3, split the 60-bit signature into 4 15-bit
  * blocks — any qualifying pair agrees exactly on ≥ 1 block, so an
  * equi-join per block finds all candidates without an all-pairs scan.
  */
object SimHash {

  /** SQL-expressible 60-bit token hash: two polynomial rolling hashes
    * over the character stream (bases 31 / 131, moduli 1e9+7 /
    * 998244353 — both < 2³⁰, so every intermediate stays in long
    * range), packed as h1·2³⁰ + h2. */
  def tokenHash60(t: Column): Column =
    hashFromChars(transform(split(t, ""), c => ascii(c).cast("long")))

  /** [[tokenHash60]] over an already-materialized char-code array —
    * hoist the split into its own projection on hot paths so the regex
    * split runs once, not once per fold.
    *
    * Rolling hashes have no avalanche — similar tokens yield
    * correlated bits, which would inflate simhash's false-collision
    * rate — so both halves are finished with a modular multiplicative
    * cross-mix: gᵢ = (hᵢ·2654435761 + h₍other₎) mod p₃₀. Every product
    * stays below 2⁶² (mod inputs < 2³⁰, multiplier < 2³², plus a 2³⁰
    * addend), so the expression is exact in any signed-64 SQL engine. */
  def hashFromChars(chars: Column): Column = {
    def roll(base: Long, mod: Long): Column =
      aggregate(chars, lit(0L), (acc, c) => (acc * base + c) % mod)
    val h1 = roll(31L, 1000000007L)
    val h2 = roll(131L, 998244353L)
    val p = 1073741789L // largest prime < 2^30
    val a = 2654435761L // Knuth's multiplicative constant
    val g1 = (h1 * a + h2) % p
    val g2 = (h2 * a + h1) % p
    g1 * lit(1L << 30) + g2
  }

  /** 60-bit simhash of the token multiset as a long. Bit j is set when
    * more than half the token hashes have bit j set — equivalent to the
    * classic ±1 vote sum being positive (2·count_set − n > 0). Shifts
    * are unrolled statically (Spark's shiftright takes a literal bit
    * count). */
  def simhash60(text: Column): Column = {
    val hs = transform(TextFunctions.tokens(text), t => tokenHash60(t))
    val n = size(hs)
    (0 until 60).map { j =>
      val cntSet = size(filter(hs, h => shiftright(h, j).bitwiseAND(1) === 1))
      when(cntSet * 2 > n, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Aggregation-shaped signature computation for whole tables: explode
    * to (id, token), pre-aggregate the multiset to (id, token, cnt) —
    * the ±1 instance votes collapse to ±cnt votes per DISTINCT token,
    * an identical sum that hashes each distinct token once instead of
    * once per occurrence — then 60 signed-count aggregates assemble
    * the sign bits (same plan-shape rationale as
    * [[MinHashLSH.signatures]]). */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sig = (0 until 60).map { j =>
      val vote = sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1,
        col("cnt")).otherwise(-col("cnt")))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    docs.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("t"))
      .groupBy(col("id"), col("t"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("chars", transform(split(col("t"), ""), c => ascii(c).cast("long")))
      .select(col("id"), col("cnt"), hashFromChars(col("chars")).as("h"))
      .groupBy("id")
      .agg(sig.as("sig"))
  }

  /** Pairs with Hamming(simhash) ≤ maxDist, via 15-bit-block pigeonhole
    * blocking + exact Hamming verification on candidates.
    * @return (id_a, id_b, hamming) with id_a < id_b.
    */
  def duplicatePairs(docs: DataFrame, idCol: String, textCol: String,
                     maxDist: Int = 3): DataFrame = {
    val sigs = signatures(docs, idCol, textCol)
    val blocked = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), b * 15).bitwiseAND(0x7FFFL)): _*)))
      .withColumnRenamed("pos", "block")
      .withColumnRenamed("col", "blockval")
    val l = blocked.select(col("block"), col("blockval"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val rj = blocked.select(col("block"), col("blockval"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(rj, Seq("block", "blockval"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
