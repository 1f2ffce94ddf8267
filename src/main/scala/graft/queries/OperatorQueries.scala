package graft.queries

import graft.multimodal.MultimodalOps
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/**
 * Composite-operator queries: as-of join (point-in-time lookup) and the
 * multimodal binary feature pipeline — both oracle-checked.
 */
object OperatorQueries {

  val all: Seq[Q] = Seq(

    // As-of join: for each purchase, the user's most recent click at or
    // before it. Spark side is union+window (one shuffle, one sort);
    // oracle uses DuckDB's native ASOF LEFT JOIN.
    Q(
      "q_asof_join",
      "as-of join: latest click at-or-before each purchase per user",
      (s, dir) => {
        val ev = EventsTable.load(s, dir)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("tsu"), col("event_type"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("tsu"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("tsu"))
        AsOfJoin.asOf(purchases, clicks, "user_id", "tsu", Seq("tsu" -> "click_tsu"))
          .select(col("event_id"), col("user_id"),
            (col("tsu") - col("click_tsu")).as("lag_us"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tsu, event_type FROM events),
             |l AS (SELECT event_id, user_id, tsu FROM e WHERE event_type = 'purchase'),
             |r AS (SELECT user_id, tsu FROM e WHERE event_type = 'click')
             |SELECT l.event_id, l.user_id, l.tsu - r.tsu AS lag_us
             |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.tsu >= r.tsu
             |ORDER BY l.event_id""".stripMargin)),

    // Multimodal plumbing: text bytes as an opaque BINARY payload, batched
    // stub decode via mapPartitions, typed feature schema. The oracle
    // recomputes the stub's deterministic features from the source text
    // (payloads are ASCII, so bytes == code points).
    Q(
      "q_multimodal_features",
      "binary media payload -> batched stub decode -> typed features",
      (s, dir) => {
        import s.implicits._
        val payloads = Registry.tbl(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .as[(Long, Array[Byte])]
        MultimodalOps.extractImageFeatures(payloads)
          .toDF()
          .orderBy("doc_id")
      },
      Some {
        val ck = OracleText.polyHash("text")
        s"""WITH f AS (SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           |                  $ck AS checksum FROM documents)
           |SELECT doc_id, n_bytes, checksum,
           |       CAST(checksum % 640 + 1 AS INT) AS width,
           |       CAST(checksum % 480 + 1 AS INT) AS height
           |FROM f ORDER BY doc_id""".stripMargin
      })
  )
}
