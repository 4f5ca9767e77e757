package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming-state extensions (SURVEY §2.8/§7 step 6): the reference
  * is a stateless delivery engine; these add the stateful streaming
  * operators a training-data pipeline needs, with watermark-bounded
  * state so they run indefinitely on unbounded streams.
  */
object StreamingOps {

  /** Exact streaming dedup on a content hash: watermark bounds the
    * dedup state (a key older than `delay` is forgotten — at 100 TB/day
    * unbounded dedup state is the first thing that falls over).
    */
  def dedupStream(df: DataFrame, eventTimeCol: String, delay: String,
                  keyCols: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicates(keyCols :+ eventTimeCol)

  /** Tumbling/sliding windowed aggregation with watermarking. */
  def windowedCounts(df: DataFrame, eventTimeCol: String, delay: String,
                     windowDuration: String, slide: Option[String] = None,
                     groupCols: Seq[String] = Nil): DataFrame = {
    val w = slide match {
      case Some(s) => window(col(eventTimeCol), windowDuration, s)
      case None => window(col(eventTimeCol), windowDuration)
    }
    df.withWatermark(eventTimeCol, delay)
      .groupBy(w +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Session windows (gap-based) — the streaming analogue of the
    * q9_user_sessions batch query.
    */
  def sessionCounts(df: DataFrame, eventTimeCol: String, delay: String,
                    gap: String, keyCols: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .groupBy(session_window(col(eventTimeCol), gap) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"))
}
