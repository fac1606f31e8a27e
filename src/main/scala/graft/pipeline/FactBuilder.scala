package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fact table build (R11/O2) — `gold_fact_sales.ipynb`.
  *
  * silver ⟕ dim_branch ⟕ dim_dealer ⟕ dim_model ⟕ dim_date on natural
  * keys, projecting measures + the four surrogate keys
  * (`gold_fact_sales.ipynb:55996-56000`, cell 8). All four joins
  * broadcast the dimension side — dims are small by construction, so
  * the fact build is shuffle-free at any fact size (four consecutive
  * BroadcastHashJoins over one scan of silver).
  */
object FactBuilder {

  val factKeys: Seq[String] =
    Seq("dim_branch_key", "dim_dealer_key", "dim_model_key", "dim_date_key")

  /** Pure plan: silver + 4 dims → factsales relation. */
  def plan(silver: DataFrame, dims: Map[String, DataFrame]): DataFrame = {
    val joined = DimensionBuilder.specs.foldLeft(silver) { (acc, spec) =>
      val dim = broadcast(
        dims(spec.name).select(col(spec.dimKey), col(spec.naturalKey).as(s"__nk_${spec.name}")))
      acc.join(dim, acc(spec.naturalKey) === dim(s"__nk_${spec.name}"), "left")
    }
    joined.select(
      col("Revenue"), col("Units_Sold"), col("RevPerUnit"),
      col("dim_branch_key"), col("dim_dealer_key"),
      col("dim_model_key"), col("dim_date_key"))
  }

  /** O2/O3 — initial overwrite or merge on the 4-surrogate-key grain.
    *
    * Reference quirk preserved deliberately (SURVEY §2.3 O2): the
    * 4-key grain is NOT unique in the data, and Delta would throw if an
    * incremental source carried two rows of one grain. We pre-aggregate
    * the incremental source to the grain (sum measures) before merging —
    * the documented "pre-aggregate" resolution of SURVEY §7.4 risk 1 —
    * and keep strict duplicate detection on.
    */
  def build(spark: SparkSession, catalog: GoldCatalog, silver: DataFrame): Unit = {
    val dims = DimensionBuilder.specs
      .map(s => s.name -> catalog.table("gold", s.name)).toMap
    val fact = plan(silver, dims)
    if (catalog.tableExists("gold", "factsales")) {
      val src = fact.groupBy(factKeys.map(col): _*).agg(
        sum("Revenue").as("Revenue"),
        sum("Units_Sold").as("Units_Sold"),
        (sum("Revenue") / sum("Units_Sold")).as("RevPerUnit"))
        .select(fact.columns.map(col).toSeq: _*)
      catalog.mergeInto("gold", "factsales", src, factKeys)
    } else catalog.saveAsTable(fact, "gold", "factsales")
  }
}
