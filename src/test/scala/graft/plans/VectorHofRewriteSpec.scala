package graft.plans

import graft.SparkTestBase
import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The HOF→native optimizer rule: fires on the exact builder idioms,
  * preserves bits (incl. null / ragged / empty edges), and reaches the
  * declared LSH query's plan. */
class VectorHofRewriteSpec extends SparkTestBase {

  // parquet-backed (a projection over a LocalRelation constant-folds
  // away entirely, hiding the expression from plan assertions)
  private lazy val vecs: DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows: Seq[(Long, Any, Any)] = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.0f, 0.0f), Array(0.0f, 0.0f)), // zero vectors
      (3L, Array(1.5f, -2.5f), Array(-1.5f, 2.5f)),
      (4L, Array.empty[Float], Array.empty[Float]), // empty arrays
      (5L, Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)), // ragged
      (6L, null, Array(1.0f)), // null side
      (7L, Seq[Any](1.0f, null, 3.0f), Array(4.0f, 5.0f, 6.0f)), // null ELEMENT
    )
    val local = spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))))
    val path = tmpDir("hof_rewrite_vecs")
    local.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  private def bitsOf(df: DataFrame): Seq[(Long, Option[Long])] =
    df.collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None
        else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
    }.toSeq.sortBy(_._1)

  private def withoutRule[T](f: => T): T = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == VectorHofRewrite)
    try f finally spark.experimental.extraOptimizations = saved
  }

  test("dot / l2 / cosine HOF forms rewrite and stay bit-identical on all edges") {
    VectorHofRewrite.install(spark)
    for ((name, c, d) <- Seq(
        ("dot", VectorFunctions.vdot(col("a"), col("b")), vecs),
        ("l2", VectorFunctions.l2sq(col("a"), col("b")), vecs),
        // zero/empty rows excluded for cosine: ANSI divide-by-zero
        // throws identically on both sides, which is exactly why the
        // rule rewrites only the INNER folds and keeps the Divide node
        ("cos", VectorFunctions.cosine(col("a"), col("b")),
          vecs.filter(!col("id").isin(2L, 4L))))) {
      val q = d.select(col("id"), c.as("v"))
      val got = bitsOf(q)
      val want = withoutRule(bitsOf(d.select(col("id"), c.as("v"))))
      assert(got === want, s"$name: rewrite changed results")
      // and the rewrite actually happened: no ArrayAggregate survives
      val opt = q.queryExecution.optimizedPlan.toString
      assert(!opt.contains("aggregate("), s"$name: HOF fold not rewritten:\n$opt")
      val native = if (name == "l2") "l2_sq" else "dot_product"
      assert(opt.contains(native), s"$name: expected $native in:\n$opt")
    }
  }

  test("ragged and null inputs yield null both before and after rewrite") {
    VectorHofRewrite.install(spark)
    val out = vecs.select(col("id"), VectorFunctions.vdot(col("a"), col("b")).as("v"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(5L) && out(6L), "ragged/null rows must be null")
    assert(!out(1L) && !out(4L), "well-formed rows must not be null")
  }

  test("a null ELEMENT yields null both before and after rewrite (dot and l2)") {
    // aggregate(zip_with(...)) folds a null product/diff to null; the
    // natives must do the same, not read the slot as 0.0
    VectorHofRewrite.install(spark)
    for ((name, c) <- Seq(
        ("dot", VectorFunctions.vdot(col("a"), col("b"))),
        ("l2", VectorFunctions.l2sq(col("a"), col("b"))))) {
      val q = vecs.filter(col("id").isin(1L, 7L)).select(col("id"), c.as("v"))
      val rewritten = q.queryExecution.optimizedPlan.toString
      assert(!rewritten.contains("aggregate("), s"$name: rule did not fire")
      val got = q.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
      val want = withoutRule( // rebuild: q's QueryExecution is already cached
        vecs.filter(col("id").isin(1L, 7L)).select(col("id"), c.as("v"))
          .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap)
      assert(got(7L) && want(7L), s"$name: null-element row must be null on both paths")
      assert(!got(1L) && !want(1L), s"$name: clean row must stay non-null")
    }
  }

  test("dot with a double literal matrix side rewrites (the SRP shape)") {
    VectorHofRewrite.install(spark)
    val planes = VectorFunctions.srpPlanes(2, dims = 3)
    val q = vecs.filter(col("id") === 1L)
      .select(VectorFunctions.vdot(col("a"), typedLit(planes.head)).as("p"))
    assert(q.queryExecution.optimizedPlan.toString.contains("dot_product"))
    val gotBits = java.lang.Double.doubleToRawLongBits(q.head().getDouble(0))
    val expect = (0 until 3).map(i => Seq(1.0f, 2.0f, 3.0f)(i).toDouble * planes.head(i))
      .foldLeft(0.0)(_ + _)
    assert(gotBits === java.lang.Double.doubleToRawLongBits(expect))
  }

  test("the declared LSH query's executed plan carries the native dot") {
    val df = graft.SparkEntry.queries("sim_lsh_bucketed")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dot_product"), s"expected native dot in:\n$plan")
    assert(!plan.contains("aggregate("), "HOF fold survived in the LSH plan")
  }

  test("a fold that is NOT a dot product is left alone") {
    VectorHofRewrite.install(spark)
    // max-fold, not an add-fold: must not match
    val q = vecs.filter(col("id") === 1L).select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => greatest(acc, x)).as("m"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("dot_product"))
    assert(q.head().getDouble(0) === 18.0) // max of 4, 10, 18
  }
}
