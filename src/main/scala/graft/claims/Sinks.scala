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
    * Appends into `out`: the per-char string-returning formulation this
    * replaces dominated the sink at 300k+ candidates.
    */
  private def jsonEscapeInto(out: java.io.Writer, s: String): Unit = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => out.append("\\\"")
        case '\\' => out.append("\\\\")
        case '\n' => out.append("\\n")
        case '\r' => out.append("\\r")
        case '\t' => out.append("\\t")
        case '\b' => out.append("\\b")
        case '\f' => out.append("\\f")
        case c if c < ' ' || c > '~' => out.append(f"\\u${c.toInt}%04x")
        case c => out.append(c)
      }
      i += 1
    }
  }

  /** Stream rows as a Python-json.dump(indent=2)-style JSON array into
    * `out`. Streaming keeps peak driver memory bounded by the writer's
    * buffer rather than by the rendered output (at the head-to-head's
    * 29% flag rate the one-StringBuilder formulation held the entire
    * multi-hundred-MB array in memory alongside the rows).
    */
  def renderJsonArrayTo(out: java.io.Writer, rows: IterableOnce[Row]): Unit = {
    val it = rows.iterator
    if (!it.hasNext) { out.append("[]"); return }
    out.append("[\n")
    var first = true
    it.foreach { r =>
      if (!first) out.append(",\n")
      first = false
      out.append("  {\n")
      val fields = r.schema.fields
      var i = 0
      while (i < fields.length) {
        if (i > 0) out.append(",\n")
        out.append("    \"")
        jsonEscapeInto(out, fields(i).name)
        out.append("\": ")
        if (r.isNullAt(i)) out.append("null")
        else r.get(i) match {
          case s: String =>
            out.append('"'); jsonEscapeInto(out, s); out.append('"')
          case n: java.lang.Number => out.append(n.toString)
          case b: java.lang.Boolean => out.append(b.toString)
          // Dates/timestamps/anything else: render as a JSON string —
          // bare toString would be invalid JSON.
          case other =>
            out.append('"'); jsonEscapeInto(out, other.toString)
            out.append('"')
        }
        i += 1
      }
      out.append("\n  }")
    }
    out.append("\n]")
  }

  /** Render rows as one in-memory string (tests, small sets). */
  def renderJsonArray(rows: Seq[Row]): String = {
    val sw = new java.io.StringWriter(math.min(rows.size, 1 << 20) * 64)
    renderJsonArrayTo(sw, rows)
    sw.toString
  }

  /** Pretty-JSON candidates sink (byte-parity path). Returns collected rows
    * so callers share the single action (reference returns the candidate
    * list too, claim_pipeline.py:233). The render streams through a
    * buffered writer straight to disk — bytes identical to the in-memory
    * formulation, peak memory bounded by the buffer.
    */
  def writeCandidatesPretty(candidates: DataFrame, path: String): Seq[Row] = {
    val rows = candidates.limit(DriverCollectGuard + 1).collect().toSeq
    require(rows.size <= DriverCollectGuard,
      s"candidate set exceeds driver guard ($DriverCollectGuard rows); " +
        "use writeCandidatesDistributed")
    val out = Files.newBufferedWriter(Paths.get(path),
      StandardCharsets.UTF_8)
    try renderJsonArrayTo(out, rows)
    finally out.close()
    rows
  }

  /** Scalable sink: distributed JSON-lines (documented format divergence). */
  def writeCandidatesDistributed(candidates: DataFrame, path: String): Unit =
    candidates.write.mode("overwrite").json(path)

  /** Fixed-template metrics text sink (claim_pipeline.py:223-231). */
  def writeMetrics(metrics: PipelineMetrics, path: String): Unit =
    Files.write(Paths.get(path), metrics.render.getBytes(StandardCharsets.UTF_8))
}
