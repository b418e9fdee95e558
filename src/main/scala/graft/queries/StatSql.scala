package graft.queries

/** Engine-neutral SQL fragments for normal-distribution probabilities —
  * neither Spark nor DuckDB ships Φ, so both sides evaluate the SAME
  * Abramowitz–Stegun 7.1.26 erf polynomial (max abs err 1.5e-7) in
  * plain arithmetic; identical expression trees over identical inputs
  * give bit-identical doubles. Strings use Spark's `d` double-literal
  * suffix; strip with [[dedSuffix]] for DuckDB.
  */
object StatSql {

  /** erf(|z|/√2)-based upper bound piece: Φ(|z|) for z ≥ 0. */
  private def phiAbs(z: String): String =
    s"""(0.5d * (1.0d +
       |  (1.0d - (((((1.061405429d / (1.0d + 0.3275911d * (abs($z) / sqrt(2.0d)))
       |    - 1.453152027d) / (1.0d + 0.3275911d * (abs($z) / sqrt(2.0d)))
       |    + 1.421413741d) / (1.0d + 0.3275911d * (abs($z) / sqrt(2.0d)))
       |    - 0.284496736d) / (1.0d + 0.3275911d * (abs($z) / sqrt(2.0d)))
       |    + 0.254829592d) / (1.0d + 0.3275911d * (abs($z) / sqrt(2.0d))))
       |   * exp(-(abs($z) / sqrt(2.0d)) * (abs($z) / sqrt(2.0d))))))"""
      .stripMargin

  /** Φ(z) for any sign (symmetry around 0). */
  def phiSql(z: String): String =
    s"(case when ($z) >= 0 then ${phiAbs(z)} " +
      s"else 1.0d - ${phiAbs(z)} end)"

  /** Two-sided normal p-value 2·(1 − Φ(|z|)). */
  def pTwoSidedSql(z: String): String =
    s"(2.0d * (1.0d - ${phiAbs(z)}))"

  /** Strip Spark's `d` double-literal suffixes for DuckDB. */
  def dedSuffix(sql: String): String = sql.replaceAll("""(\d)d\b""", "$1")
}
