package graft.queries

/**
 * DuckDB SQL fragment generators that mirror the engine's vector kernels
 * EXACTLY (same formula, same sequential left-to-right DOUBLE accumulation),
 * so Spark results and oracle results are bitwise comparable before rounding.
 *
 * DuckDB's builtin `list_cosine_similarity`/`list_distance` are NOT used:
 * they compute in FLOAT and with unspecified accumulation order, which makes
 * hash-equality of rounded results fragile. These explicit `list_reduce`
 * folds are slower but deterministic — they only run on sf0.01 verify data.
 */
object OracleSql {

  /** Sequential left-fold of `elemExpr(i)` over 1-based index i in [1, len]. */
  private def fold(arr: String, elem: String): String =
    s"list_reduce(list_transform(range(1, len($arr)+1), i -> $elem), (x, y) -> x + y)"

  def dot(a: String, b: String): String =
    fold(a, s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)")

  def normSq(a: String): String = dot(a, a)

  def l2Sq(a: String, b: String): String =
    fold(a, s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))")

  def cosine(a: String, b: String): String =
    s"""CASE WHEN ${normSq(a)} = 0 OR ${normSq(b)} = 0 THEN CAST(-1.0 AS DOUBLE)
       | ELSE ${dot(a, b)} / (sqrt(${normSq(a)}) * sqrt(${normSq(b)})) END""".stripMargin.replaceAll("\n", " ")
}
