package graft.analytics

import org.apache.spark.sql.DataFrame

/** Shared materialization fence for multiply-referenced intermediates.
  *
  * Catalyst performs no common-subexpression elimination across join /
  * union inputs: a DataFrame referenced N times in one plan is derived
  * N times, scans and exchanges included (ReuseExchange only fires when
  * the two subtrees stay byte-canonically identical, which projections
  * and alias pruning routinely break). Every operator whose derived
  * table feeds 2+ consumers fences it once instead.
  *
  * Same contract as the local fences in [[Text.sboTrain]] /
  * [[Sampling.stratifiedTiles]] / [[Sketch]]: reliable `checkpoint`
  * when the session has a checkpoint dir (cluster deployments — the
  * fence survives executor loss), executor-local `localCheckpoint`
  * otherwise (blocks are freed by the ContextCleaner when the frame is
  * collected, so nothing leaks into the CacheManager).
  */
private[graft] object Fences {
  def fence(d: DataFrame): DataFrame =
    if (d.sparkSession.sparkContext.getCheckpointDir.isDefined)
      d.checkpoint(true)
    else d.localCheckpoint(true)
}
