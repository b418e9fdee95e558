package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 84 text ops (SURVEY.md §2.4):
  *
  *  - t43: RAKE-lite keyword scoring — keyword extraction by the
  *    degree/frequency ratio: a term's degree is the total length of
  *    the stopword-free runs it appears in (co-occurrence weight), its
  *    frequency the plain count; deg/freq favors terms that live in
  *    long content phrases. Runs split on the 6-term stopword list;
  *    run segmentation reuses the islands trick (position − rank of
  *    position is constant within a run). Everything is exact integers
  *    until the final ratio; top-20 by (score desc, term).
  */
object TextOps44 {
  import Tables.t

  private val Stop = Seq("the", "a", "of", "and", "to", "in")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t43_rake_keywords" -> ((spark, dir) => {
      val tok = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
        .filter(!col("term").isin(Stop: _*) && length(col("term")) > 0)
      // islands: consecutive content positions share (pos - rn)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val runs = tok
        .withColumn("grp", col("pos") - row_number().over(w))
        .withColumn("run_len",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id", "grp")))
      runs.groupBy("term")
        .agg(count(lit(1)).as("freq"),
          sum(col("run_len")).cast("long").as("degree"))
        .filter(col("freq") >= 5)
        .withColumn("score",
          round(col("degree").cast("double") / col("freq").cast("double"),
            6))
        .orderBy(col("score").desc, col("term"))
        .limit(20)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t43_rake_keywords" -> {
      val stopList = Stop.map(s => s"'$s'").mkString(", ")
      s"""WITH tok AS (
         |  SELECT doc_id, p.term AS term, CAST(p.pos AS BIGINT) AS pos
         |  FROM (
         |    SELECT doc_id, unnest(list_transform(range(len(tk)),
         |      i -> struct_pack(term := tk[i+1], pos := i))) AS p
         |    FROM (SELECT doc_id, string_split(text, ' ') AS tk
         |          FROM documents WHERE text IS NOT NULL))),
         |content AS (
         |  SELECT doc_id, term, pos FROM tok
         |  WHERE term NOT IN ($stopList) AND length(term) > 0),
         |runs AS (
         |  SELECT doc_id, term,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
         |      AS grp
         |  FROM content),
         |sized AS (
         |  SELECT doc_id, term, grp,
         |    count(*) OVER (PARTITION BY doc_id, grp) AS run_len
         |  FROM runs)
         |SELECT term, CAST(count(*) AS BIGINT) AS freq,
         |  CAST(sum(run_len) AS BIGINT) AS degree,
         |  round(CAST(sum(run_len) AS DOUBLE) / count(*), 6) AS score
         |FROM sized GROUP BY term
         |HAVING count(*) >= 5
         |ORDER BY score DESC, term
         |LIMIT 20""".stripMargin
    },
  )
}
