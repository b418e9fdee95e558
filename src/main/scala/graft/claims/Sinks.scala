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
    * Appends into `sb`: the per-char string-returning formulation this
    * replaces dominated the sink at 300k+ candidates.
    */
  private def jsonEscapeInto(sb: java.lang.StringBuilder, s: String): Unit = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < ' ' || c > '~' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
  }

  /** Render rows as a Python-json.dump(indent=2)-style JSON array. */
  def renderJsonArray(rows: Seq[Row]): String = {
    if (rows.isEmpty) return "[]"
    val sb = new java.lang.StringBuilder(math.min(rows.size, 1 << 20) * 64)
    sb.append("[\n")
    var first = true
    rows.foreach { r =>
      if (!first) sb.append(",\n")
      first = false
      sb.append("  {\n")
      val fields = r.schema.fields
      var i = 0
      while (i < fields.length) {
        if (i > 0) sb.append(",\n")
        sb.append("    \"")
        jsonEscapeInto(sb, fields(i).name)
        sb.append("\": ")
        if (r.isNullAt(i)) sb.append("null")
        else r.get(i) match {
          case s: String =>
            sb.append('"'); jsonEscapeInto(sb, s); sb.append('"')
          case n: java.lang.Number => sb.append(n.toString)
          case b: java.lang.Boolean => sb.append(b.toString)
          // Dates/timestamps/anything else: render as a JSON string —
          // bare toString would be invalid JSON.
          case other =>
            sb.append('"'); jsonEscapeInto(sb, other.toString); sb.append('"')
        }
        i += 1
      }
      sb.append("\n  }")
    }
    sb.append("\n]")
    sb.toString
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
