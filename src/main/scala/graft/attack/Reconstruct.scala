package graft.attack

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * LLM-assisted reconstruction — the reference's fifth workload
 * (/root/reference/src/cod.py:141-175, invocation commented out there): for
 * each leaked embedding, retrieve the k nearest stored documents, assemble
 * the reconstruction prompt from them, and run an external language model
 * over the prompt. The retrieval is the kNN join (J1/W1), the prompt is
 * string aggregation (F10), and the LLM call is a PLUGGABLE map stage —
 * engine correctness never depends on what the model returns.
 *
 * Scale shape: probes broadcast (they are leaked vectors, few), the corpus
 * scans once, per-probe top-k is a window over the candidate set, prompts
 * are one row per probe, and the LLM stage is mapPartitions so a real
 * client (HTTP pool, token bucket) initializes once per partition and
 * batches its I/O — the standard external-service-enrichment pattern.
 */
object Reconstruct {

  /** Per-probe reconstruction: `corpus` is (id, doc, emb), `probes` is
    * (probe_id, qe). Returns (probe_id, prompt, reconstruction) with the
    * prompt built from the k nearest docs in ascending-distance order.
    * `llm` runs once per probe inside the executor partition. */
  def reconstruct(corpus: DataFrame, probes: DataFrame, k: Int)
                 (llm: String => String): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val w = Window.partitionBy("probe_id").orderBy(asc("dist"), asc("id"))
    val prompts = corpus
      .crossJoin(broadcast(probes))
      .withColumn("dist", VF.l2Sq(col("emb"), col("qe")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy("probe_id")
      .agg(concat(
        lit("Reconstruct the original text from these related documents: "),
        array_join(
          transform(array_sort(collect_list(struct(col("rn"), col("doc")))),
            x => x.getField("doc")),
          " | ")).as("prompt"))
    val out: Dataset[(Long, String, String)] =
      prompts.select(col("probe_id").cast("long"), col("prompt"))
        .as[(Long, String)]
        .mapPartitions { it =>
          // a production client would be constructed HERE, once per partition
          it.map { case (pid, prompt) => (pid, prompt, llm(prompt)) }
        }
    out.toDF("probe_id", "prompt", "reconstruction")
  }
}
