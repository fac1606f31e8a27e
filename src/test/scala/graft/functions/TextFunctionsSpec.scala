package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._
  import TextFunctions._

  private def one(c: org.apache.spark.sql.Column, text: String) =
    Seq(text).toDF("t").select(c.as("v")).head()

  test("token statistics") {
    assert(one(tokenCount($"t"), "a b c b").getInt(0) === 4)
    assert(one(distinctTokenCount($"t"), "a b c b").getInt(0) === 3)
    assert(one(typeTokenRatio($"t"), "a b c b").getDouble(0) === 0.75)
    assert(one(tokenCount($"t"), "solo").getInt(0) === 1)
  }

  test("shingles: sliding distinct n-grams; short docs collapse to whole text") {
    assert(one(shingles($"t", 3), "a b c d").getSeq[String](0) === Seq("a b c", "b c d"))
    assert(one(shingles($"t", 3), "a b").getSeq[String](0) === Seq("a b"))
    // repeated shingles dedup
    assert(one(shingles($"t", 2), "x y x y").getSeq[String](0) === Seq("x y", "y x"))
  }

  test("stopword ratio and quality score are rational-exact") {
    assert(one(stopwordRatio($"t", Seq("the", "a")), "the cat a hat").getDouble(0) === 0.5)
    assert(one(meanTokenLength($"t"), "ab cd").getDouble(0) === 2.0)
  }

  test("langId: first maximal profile wins; no hits → und") {
    val profiles = Seq("en" -> Seq("the"), "de" -> Seq("der"))
    assert(one(langId($"t", profiles), "the dog").getString(0) === "en")
    assert(one(langId($"t", profiles), "der hund").getString(0) === "de")
    assert(one(langId($"t", profiles), "xyz").getString(0) === "und")
    // tie → declaration order (en before de)
    assert(one(langId($"t", profiles), "the der").getString(0) === "en")
    // NULL text reads "und", exactly like the SQL oracles' CASE-ELSE
    // (the aggregate form would propagate NULL without the coalesce)
    val nullRow = Seq(Option.empty[String]).toDF("t")
      .select(langId($"t", profiles).as("v")).head()
    assert(!nullRow.isNullAt(0) && nullRow.getString(0) === "und")
    // and empty text has zero hits everywhere
    assert(one(langId($"t", profiles), "").getString(0) === "und")
  }

  test("BPE-ish pieces split letter runs, digit runs, and single symbols") {
    assert(one(bpePieces($"t"), "foo42 bar-baz").getSeq[String](0)
      === Seq("foo", "42", "bar", "-", "baz"))
    assert(one(bpePieceCount($"t"), "plain words here").getInt(0) === 3)
  }

  test("rolling hash: polynomial over chars, stays under the modulus") {
    // h("ab") = (0*31+97)*31+98 mod 1e9+7 = 3105
    assert(one(rollingHash($"t"), "ab").getLong(0) === (97L * 31 + 98))
    val h1 = one(rollingHash($"t"), "hello world").getLong(0)
    val h2 = one(rollingHash($"t"), "hello worlD").getLong(0)
    assert(h1 !== h2)
    assert(h1 >= 0 && h1 < 1000000007L)
  }

  test("fingerprint is invariant under token reordering; exactHash is not") {
    val df = Seq(("a b c", "c b a")).toDF("x", "y")
    val r = df.select(
      (fingerprint($"x") === fingerprint($"y")).as("fp_eq"),
      (exactHash($"x") === exactHash($"y")).as("ex_eq")).head()
    assert(r.getBoolean(0) === true)
    assert(r.getBoolean(1) === false)
  }
}
