package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory (each with a DuckDB oracle unless noted):
  *  - c1..c7: the reference's claim-pipeline operators (SURVEY §2.1)
  *  - q1..q13: relational analytics surface (SURVEY §2.2 engine stance)
  *  - d,s,t,m prefixes: LLM-data-pipeline extensions (SURVEY §2.4)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q4_nation_revenue")(spark, "/root/testdata/sf0.001")

  // One entry per query module, in registration order. A flat Seq kept
  // shallow on purpose: the previous 90-term `a ++ b ++ ...` expression
  // overflowed scalac's typer stack.
  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
      Map[String, String])] = Seq(
    (graft.queries.ClaimOps.queries, graft.queries.ClaimOps.oracleSql),
    (graft.queries.Analytics.queries, graft.queries.Analytics.oracleSql),
    (graft.queries.Analytics2.queries, graft.queries.Analytics2.oracleSql),
    (graft.queries.Analytics3.queries, graft.queries.Analytics3.oracleSql),
    (graft.queries.Analytics4.queries, graft.queries.Analytics4.oracleSql),
    (graft.queries.Analytics5.queries, graft.queries.Analytics5.oracleSql),
    (graft.queries.Analytics6.queries, graft.queries.Analytics6.oracleSql),
    (graft.queries.Analytics7.queries, graft.queries.Analytics7.oracleSql),
    (graft.queries.Analytics8.queries, graft.queries.Analytics8.oracleSql),
    (graft.queries.Analytics9.queries, graft.queries.Analytics9.oracleSql),
    (graft.queries.Analytics10.queries, graft.queries.Analytics10.oracleSql),
    (graft.queries.Analytics11.queries, graft.queries.Analytics11.oracleSql),
    (graft.queries.Analytics12.queries, graft.queries.Analytics12.oracleSql),
    (graft.queries.Analytics13.queries, graft.queries.Analytics13.oracleSql),
    (graft.queries.Analytics14.queries, graft.queries.Analytics14.oracleSql),
    (graft.queries.Analytics15.queries, graft.queries.Analytics15.oracleSql),
    (graft.queries.Analytics16.queries, graft.queries.Analytics16.oracleSql),
    (graft.queries.Analytics17.queries, graft.queries.Analytics17.oracleSql),
    (graft.queries.Analytics18.queries, graft.queries.Analytics18.oracleSql),
    (graft.queries.Analytics19.queries, graft.queries.Analytics19.oracleSql),
    (graft.queries.Analytics20.queries, graft.queries.Analytics20.oracleSql),
    (graft.queries.Analytics21.queries, graft.queries.Analytics21.oracleSql),
    (graft.queries.Analytics22.queries, graft.queries.Analytics22.oracleSql),
    (graft.queries.Analytics23.queries, graft.queries.Analytics23.oracleSql),
    (graft.queries.Analytics24.queries, graft.queries.Analytics24.oracleSql),
    (graft.queries.Analytics25.queries, graft.queries.Analytics25.oracleSql),
    (graft.queries.Analytics26.queries, graft.queries.Analytics26.oracleSql),
    (graft.queries.Analytics27.queries, graft.queries.Analytics27.oracleSql),
    (graft.queries.Analytics28.queries, graft.queries.Analytics28.oracleSql),
    (graft.queries.Analytics29.queries, graft.queries.Analytics29.oracleSql),
    (graft.queries.Analytics30.queries, graft.queries.Analytics30.oracleSql),
    (graft.queries.Analytics31.queries, graft.queries.Analytics31.oracleSql),
    (graft.queries.Analytics32.queries, graft.queries.Analytics32.oracleSql),
    (graft.queries.Analytics33.queries, graft.queries.Analytics33.oracleSql),
    (graft.queries.Analytics34.queries, graft.queries.Analytics34.oracleSql),
    (graft.queries.Analytics35.queries, graft.queries.Analytics35.oracleSql),
    (graft.queries.Analytics36.queries, graft.queries.Analytics36.oracleSql),
    (graft.queries.Analytics37.queries, graft.queries.Analytics37.oracleSql),
    (graft.queries.Analytics38.queries, graft.queries.Analytics38.oracleSql),
    (graft.queries.Analytics39.queries, graft.queries.Analytics39.oracleSql),
    (graft.queries.Analytics40.queries, graft.queries.Analytics40.oracleSql),
    (graft.queries.Analytics41.queries, graft.queries.Analytics41.oracleSql),
    (graft.queries.Analytics42.queries, graft.queries.Analytics42.oracleSql),
    (graft.queries.Analytics43.queries, graft.queries.Analytics43.oracleSql),
    (graft.queries.Analytics44.queries, graft.queries.Analytics44.oracleSql),
    (graft.queries.Analytics45.queries, graft.queries.Analytics45.oracleSql),
    (graft.queries.Analytics46.queries, graft.queries.Analytics46.oracleSql),
    (graft.queries.Analytics47.queries, graft.queries.Analytics47.oracleSql),
    (graft.queries.Analytics48.queries, graft.queries.Analytics48.oracleSql),
    (graft.queries.Analytics49.queries, graft.queries.Analytics49.oracleSql),
    (graft.queries.Analytics50.queries, graft.queries.Analytics50.oracleSql),
    (graft.queries.Analytics51.queries, graft.queries.Analytics51.oracleSql),
    (graft.queries.Analytics52.queries, graft.queries.Analytics52.oracleSql),
    (graft.queries.Analytics53.queries, graft.queries.Analytics53.oracleSql),
    (graft.queries.Analytics54.queries, graft.queries.Analytics54.oracleSql),
    (graft.queries.Analytics55.queries, graft.queries.Analytics55.oracleSql),
    (graft.queries.Analytics56.queries, graft.queries.Analytics56.oracleSql),
    (graft.queries.Analytics57.queries, graft.queries.Analytics57.oracleSql),
    (graft.queries.Analytics58.queries, graft.queries.Analytics58.oracleSql),
    (graft.queries.Analytics59.queries, graft.queries.Analytics59.oracleSql),
    (graft.queries.Analytics60.queries, graft.queries.Analytics60.oracleSql),
    (graft.queries.Analytics61.queries, graft.queries.Analytics61.oracleSql),
    (graft.queries.Analytics62.queries, graft.queries.Analytics62.oracleSql),
    (graft.queries.Analytics63.queries, graft.queries.Analytics63.oracleSql),
    (graft.queries.Analytics64.queries, graft.queries.Analytics64.oracleSql),
    (graft.queries.Analytics65.queries, graft.queries.Analytics65.oracleSql),
    (graft.queries.Analytics66.queries, graft.queries.Analytics66.oracleSql),
    (graft.queries.Analytics67.queries, graft.queries.Analytics67.oracleSql),
    (graft.queries.Analytics68.queries, graft.queries.Analytics68.oracleSql),
    (graft.queries.Analytics69.queries, graft.queries.Analytics69.oracleSql),
    (graft.queries.Analytics70.queries, graft.queries.Analytics70.oracleSql),
    (graft.queries.Analytics71.queries, graft.queries.Analytics71.oracleSql),
    (graft.queries.Analytics72.queries, graft.queries.Analytics72.oracleSql),
    (graft.queries.Analytics73.queries, graft.queries.Analytics73.oracleSql),
    (graft.queries.Analytics74.queries, graft.queries.Analytics74.oracleSql),
    (graft.queries.Analytics75.queries, graft.queries.Analytics75.oracleSql),
    (graft.queries.Analytics76.queries, graft.queries.Analytics76.oracleSql),
    (graft.queries.Analytics77.queries, graft.queries.Analytics77.oracleSql),
    (graft.queries.Analytics78.queries, graft.queries.Analytics78.oracleSql),
    (graft.queries.Analytics79.queries, graft.queries.Analytics79.oracleSql),
    (graft.queries.Analytics80.queries, graft.queries.Analytics80.oracleSql),
    (graft.queries.Analytics81.queries, graft.queries.Analytics81.oracleSql),
    (graft.queries.Analytics82.queries, graft.queries.Analytics82.oracleSql),
    (graft.queries.Analytics83.queries, graft.queries.Analytics83.oracleSql),
    (graft.queries.Analytics84.queries, graft.queries.Analytics84.oracleSql),
    (graft.queries.Analytics85.queries, graft.queries.Analytics85.oracleSql),
    (graft.queries.Analytics86.queries, graft.queries.Analytics86.oracleSql),
    (graft.queries.Analytics87.queries, graft.queries.Analytics87.oracleSql),
    (graft.queries.Analytics88.queries, graft.queries.Analytics88.oracleSql),
    (graft.queries.Analytics89.queries, graft.queries.Analytics89.oracleSql),
    (graft.queries.Analytics90.queries, graft.queries.Analytics90.oracleSql),
    (graft.queries.TextOps.queries, graft.queries.TextOps.oracleSql),
    (graft.queries.TextOps2.queries, graft.queries.TextOps2.oracleSql),
    (graft.queries.TextOps3.queries, graft.queries.TextOps3.oracleSql),
    (graft.queries.TextOps4.queries, graft.queries.TextOps4.oracleSql),
    (graft.queries.TextOps5.queries, graft.queries.TextOps5.oracleSql),
    (graft.queries.TextOps6.queries, graft.queries.TextOps6.oracleSql),
    (graft.queries.TextOps7.queries, graft.queries.TextOps7.oracleSql),
    (graft.queries.TextOps8.queries, graft.queries.TextOps8.oracleSql),
    (graft.queries.TextOps9.queries, graft.queries.TextOps9.oracleSql),
    (graft.queries.TextOps10.queries, graft.queries.TextOps10.oracleSql),
    (graft.queries.TextOps11.queries, graft.queries.TextOps11.oracleSql),
    (graft.queries.TextOps12.queries, graft.queries.TextOps12.oracleSql),
    (graft.queries.TextOps13.queries, graft.queries.TextOps13.oracleSql),
    (graft.queries.TextOps14.queries, graft.queries.TextOps14.oracleSql),
    (graft.queries.TextOps15.queries, graft.queries.TextOps15.oracleSql),
    (graft.queries.TextOps16.queries, graft.queries.TextOps16.oracleSql),
    (graft.queries.TextOps17.queries, graft.queries.TextOps17.oracleSql),
    (graft.queries.TextOps18.queries, graft.queries.TextOps18.oracleSql),
    (graft.queries.TextOps19.queries, graft.queries.TextOps19.oracleSql),
    (graft.queries.TextOps20.queries, graft.queries.TextOps20.oracleSql),
    (graft.queries.TextOps21.queries, graft.queries.TextOps21.oracleSql),
    (graft.queries.TextOps22.queries, graft.queries.TextOps22.oracleSql),
    (graft.queries.TextOps23.queries, graft.queries.TextOps23.oracleSql),
    (graft.queries.TextOps24.queries, graft.queries.TextOps24.oracleSql),
    (graft.queries.TextOps25.queries, graft.queries.TextOps25.oracleSql),
    (graft.queries.TextOps26.queries, graft.queries.TextOps26.oracleSql),
    (graft.queries.TextOps27.queries, graft.queries.TextOps27.oracleSql),
    (graft.queries.TextOps28.queries, graft.queries.TextOps28.oracleSql),
    (graft.queries.TextOps29.queries, graft.queries.TextOps29.oracleSql),
    (graft.queries.TextOps30.queries, graft.queries.TextOps30.oracleSql),
    (graft.queries.TextOps31.queries, graft.queries.TextOps31.oracleSql),
    (graft.queries.TextOps32.queries, graft.queries.TextOps32.oracleSql),
    (graft.queries.TextOps33.queries, graft.queries.TextOps33.oracleSql),
    (graft.queries.TextOps34.queries, graft.queries.TextOps34.oracleSql),
    (graft.queries.TextOps35.queries, graft.queries.TextOps35.oracleSql),
    (graft.queries.TextOps36.queries, graft.queries.TextOps36.oracleSql),
    (graft.queries.TextOps37.queries, graft.queries.TextOps37.oracleSql),
    (graft.queries.TextOps38.queries, graft.queries.TextOps38.oracleSql),
    (graft.queries.TextOps39.queries, graft.queries.TextOps39.oracleSql),
    (graft.queries.TextOps40.queries, graft.queries.TextOps40.oracleSql),
    (graft.queries.TextOps41.queries, graft.queries.TextOps41.oracleSql),
    (graft.queries.TextOps42.queries, graft.queries.TextOps42.oracleSql),
    (graft.queries.TextOps43.queries, graft.queries.TextOps43.oracleSql),
    (graft.queries.TextOps44.queries, graft.queries.TextOps44.oracleSql),
    (graft.queries.TextOps45.queries, graft.queries.TextOps45.oracleSql),
    (graft.queries.TextOps46.queries, graft.queries.TextOps46.oracleSql),
    (graft.queries.TextOps47.queries, graft.queries.TextOps47.oracleSql),
    (graft.queries.TextOps48.queries, graft.queries.TextOps48.oracleSql),
    (graft.queries.TextOps49.queries, graft.queries.TextOps49.oracleSql),
    (graft.queries.TextOps50.queries, graft.queries.TextOps50.oracleSql),
    (graft.queries.TextOps51.queries, graft.queries.TextOps51.oracleSql),
    (graft.queries.TextOps52.queries, graft.queries.TextOps52.oracleSql),
    (graft.queries.TextOps53.queries, graft.queries.TextOps53.oracleSql))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for the genuinely
    * non-replayable q19 (engine-specific HLL/quantile sketch internals)
    * → driver records a weaker rows-only check for it.
    */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
