package graft.queries

import graft.attack.Inversion
import org.apache.spark.sql.functions.col

/**
 * Embedding-inversion attack as a registered query. Iterative and therefore
 * not ANSI-SQL-expressible — no oracle; the driver records the rows-only
 * check. Fully seeded-deterministic, so the output (including texts) is
 * stable run to run.
 */
object AttackQueries {
  import Registry.tbl

  val all: Seq[Q] = Seq(
    Q(
      "q_attack_invert",
      "seeded embedding-inversion attack (evolutionary + greedy), top-10",
      (s, dir) => {
        val targetText = tbl(s, dir, "documents")
          .filter(col("doc_id") === 0).select("text").head().getString(0)
        val target = Inversion.embedText(targetText, 64)
        val p = Inversion.Params(
          popSize = 24, generations = 6, eliteFrac = 0.25,
          restarts = 4, iters = 40, topK = 10, dim = 64, seed = 42L)
        Inversion.invert(s, target, p)
      },
      None)
  )
}
