package graft.tools

import org.apache.spark.sql.SparkSession

/** Codegen-cost audit (round 13): per gate query, executes the SAME
  * DataFrame twice — the second run hits Spark's codegen cache
  * (identical generated source), so `run1 − run2` bounds the one-time
  * plan cost (janino compile + codegen emission) that the bench
  * RE-PAYS every pass, because each pass rebuilds the DataFrame and
  * fresh exprIds defeat the cache. The KLL family lost ~12 s/run to
  * exactly this (an exploding when-chain); this tool finds any other
  * query paying a disproportionate compile tax. Also reports the
  * compilation-count delta from CodegenMetrics (exact, monotonic).
  * Not part of the driver contract.
  *
  * Usage: runMain graft.tools.CodegenAudit [query ...]
  * (SPARK_GRAFT_SF_DIR selects data, default sf0.01 — compile cost is
  * data-independent, so the small SF is the cheap, honest probe.)
  */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import org.apache.spark.metrics.source.CodegenMetrics._
    def nCompiles: Long = METRIC_COMPILATION_TIME.getCount

    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    println(f"AUDIT ${"query"}%-28s ${"run1_s"}%8s ${"run2_s"}%8s ${"tax_s"}%7s ${"classes"}%8s")
    val rows = names.flatMap { n =>
      val fn = graft.SparkEntry.queries(n)
      try {
        val df = fn(spark, sfDir)
        val c0 = nCompiles
        // phases mode prints a breakdown INSIDE the timed window, so
        // run1 (and the tax) still includes plan derivation
        val t0 = System.nanoTime()
        if (sys.env.contains("SPARK_GRAFT_PHASES")) {
          df.queryExecution.optimizedPlan
          val tb = System.nanoTime()
          df.queryExecution.executedPlan
          val tc = System.nanoTime()
          println(f"AUDIT $n%-28s optimize=${(tb - t0) / 1e9}%.2f " +
            f"physical=${(tc - tb) / 1e9}%.2f")
        }
        df.write.format("noop").mode("overwrite").save()
        val w1 = (System.nanoTime() - t0) / 1e9
        val dc = nCompiles - c0
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val w2 = (System.nanoTime() - t1) / 1e9
        println(f"AUDIT $n%-28s $w1%8.2f $w2%8.2f ${w1 - w2}%7.2f $dc%8d")
        Some((n, w1, w2, dc))
      } catch {
        case e: Exception =>
          println(s"AUDIT $n FAILED: ${e.getMessage}"); None
      }
    }
    val tax = rows.map(r => math.max(0.0, r._2 - r._3)).sum
    println(f"AUDIT TOTAL run1=${rows.map(_._2).sum}%.1f s run2=${rows.map(_._3).sum}%.1f s " +
      f"tax=${tax}%.1f s classes=${rows.map(_._4).sum}")
    spark.stop()
  }
}
