package graft.queries

/**
 * Shared DuckDB SQL fragments for the oracle entries — ONE definition of
 * each distance so the SQL can never drift from graft.functions
 * VectorKernels (sequential double accumulation; explicit products, never
 * `^` which is pow(); the cosine 1e-8 epsilon).
 */
object OracleFragments {

  def sqlDot(x: String, y: String): String =
    s"list_sum(list_transform(range(1, len($x)+1), " +
      s"i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"

  /** Squared L2 (no sqrt), matching VectorKernels.l2. */
  def sqlL2(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), " +
      s"i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))"

  /** Negated dot product, matching VectorKernels.ip. */
  def sqlIp(a: String, b: String): String = s"-${sqlDot(a, b)}"

  /** 1 - cos with the 1e-8 epsilon, matching VectorKernels.cosine. */
  def sqlCosine(a: String, b: String): String =
    s"1.0 - ${sqlDot(a, b)} / " +
      s"(sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)}) + 1e-8)"
}
