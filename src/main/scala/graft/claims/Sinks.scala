package graft.claims

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}

/** Output sinks matching the reference's byte formats (SURVEY §2.1 O18/O19).
  *
  * The candidates sink is a single pretty-printed JSON array
  * (claim_pipeline.py:218-220) — Spark's distributed `write.json` emits
  * JSON-lines part files, so for byte parity we render the (small, filtered)
  * candidate set on the driver, with a size guard. The scalable alternative
  * [[writeCandidatesDistributed]] keeps `df.write.json` for big outputs.
  */
object Sinks {

  /** Max rows the pretty sink will collect to the driver. */
  val DriverCollectGuard: Int = 1000000

  /** Python json.dump escape semantics (the byte-parity contract): the
    * shorthand escapes incl. \b and \f, and ensure_ascii=True — every
    * non-ASCII UTF-16 code unit (incl. each surrogate half) as \uXXXX.
    */
  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case '\b' => "\\b"
    case '\f' => "\\f"
    case c if c < ' ' || c > '~' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Render rows as a Python-json.dump(indent=2)-style JSON array. */
  def renderJsonArray(rows: Seq[Row]): String = {
    if (rows.isEmpty) return "[]"
    val items = rows.map { r =>
      val fields = r.schema.fields.zipWithIndex.map { case (f, i) =>
        val v =
          if (r.isNullAt(i)) "null"
          else r.get(i) match {
            case s: String => "\"" + jsonEscape(s) + "\""
            case n: java.lang.Number => n.toString
            case b: java.lang.Boolean => b.toString
            // Dates/timestamps/anything else: render as a JSON string —
            // bare toString would be invalid JSON.
            case other => "\"" + jsonEscape(other.toString) + "\""
          }
        s"""    "${jsonEscape(f.name)}": $v"""
      }
      "  {\n" + fields.mkString(",\n") + "\n  }"
    }
    "[\n" + items.mkString(",\n") + "\n]"
  }

  /** Pretty-JSON candidates sink (byte-parity path). Returns collected rows
    * so callers share the single action (reference returns the candidate
    * list too, claim_pipeline.py:233).
    */
  def writeCandidatesPretty(candidates: DataFrame, path: String): Seq[Row] = {
    val rows = candidates.limit(DriverCollectGuard + 1).collect().toSeq
    require(rows.size <= DriverCollectGuard,
      s"candidate set exceeds driver guard ($DriverCollectGuard rows); " +
        "use writeCandidatesDistributed")
    Files.write(Paths.get(path),
      renderJsonArray(rows).getBytes(StandardCharsets.UTF_8))
    rows
  }

  /** Scalable sink: distributed JSON-lines (documented format divergence). */
  def writeCandidatesDistributed(candidates: DataFrame, path: String): Unit =
    candidates.write.mode("overwrite").json(path)

  /** Fixed-template metrics text sink (claim_pipeline.py:223-231). */
  def writeMetrics(metrics: PipelineMetrics, path: String): Unit =
    Files.write(Paths.get(path), metrics.render.getBytes(StandardCharsets.UTF_8))
}
