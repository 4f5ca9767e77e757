package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every gate query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Measurement rules (BASELINE.md): ground truth, not engine metrics —
  * each query executes fully into a `noop` sink (`count()` would let
  * Catalyst prune projections); one warmup pass of the scan path amort-
  * izes JVM/codegen warmup; `stream_gen_1m` is the reference-comparable
  * pipeline number (generator → field.set → sink, BASELINE ~338k rec/s
  * ground truth for the reference): reported as seconds for 1M records.
  *
  * ==Self-adjudication (round 7)==
  * Two consecutive rounds the official artifact was contaminated by
  * hypervisor stalls (PERF.md: ~1,358 s of /proc/stat steal in one
  * boot; 176-s wall gaps with zero GC events). The bench now measures
  * the host alongside the engine, per attempt:
  *   - `/proc/stat` steal delta (CPU-seconds stolen by the hypervisor
  *     while the attempt ran);
  *   - a max-priority 50 ms heartbeat thread whose largest observed
  *     wake-up gap bounds any whole-JVM freeze during the attempt;
  *   - GC-time delta, to tell an honest GC pause from a host freeze.
  * An attempt is `stall_suspect` when steal exceeds 1 CPU-s or a >1 s
  * heartbeat gap is not explained by GC. Suspected steady attempts are
  * re-run (≤3 total, short-circuiting on the first clean one); the
  * JSON reports cold pass, steady pass, per-query min over all
  * attempts, a `stall_suspects` map (empty ⇢ artifact trustworthy as
  * printed), and whole-run `steal_delta_s`/`max_gap_s` in the header.
  */
object Bench {

  /** Hypervisor steal time, in USER_HZ jiffies (column 9 of the
    * aggregate `cpu` line; USER_HZ=100 on every Linux this targets). */
  private def stealJiffies(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val parts = src.getLines().next().trim.split("\\s+")
        if (parts.length > 8) parts(8).toLong else 0L
      } finally src.close()
    } catch { case _: Throwable => 0L }

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime.max(0L)).sum
  }

  /** Freeze sentinel: sleeps 50 ms at max priority and tracks the
    * largest wake-to-wake gap since the last reset. A multi-second gap
    * with no matching GC time means the whole JVM was descheduled. */
  private object Heartbeat {
    private val maxGap = new java.util.concurrent.atomic.AtomicLong(0L)
    private val globalMax = new java.util.concurrent.atomic.AtomicLong(0L)
    private val t = new Thread(() => {
      var last = System.nanoTime()
      while (true) {
        try Thread.sleep(50) catch { case _: InterruptedException => () }
        val now = System.nanoTime()
        val gap = now - last
        last = now
        maxGap.getAndAccumulate(gap, math.max)
        globalMax.getAndAccumulate(gap, math.max)
      }
    }, "bench-heartbeat")
    t.setDaemon(true)
    t.setPriority(Thread.MAX_PRIORITY)
    def start(): Unit = t.start()
    def reset(): Unit = maxGap.set(0L)
    def maxGapSecs(): Double = maxGap.get() / 1e9
    def globalMaxSecs(): Double = globalMax.get() / 1e9
  }

  /** ==In-artifact A/A calibration (round 8)==
    * The round-7 artifact ran in a "sustained slow host" regime the
    * discrete-freeze sentinel cannot flag: every query uniformly
    * ~25-30% above the clean record with clean steal/heartbeat
    * telemetry, so cross-artifact comparison needed a PERF.md note.
    * The bench now carries its own yardstick: a fixed, data-free,
    * CPU-bound codegen probe (xxhash64 fold over a 1B range on 32
    * slices — no I/O, no shuffle beyond the single-row agg, immune to
    * data-scale and plan changes; each sample = min of 3 executions)
    * executed at bench start, middle and end. `CalibrationRefSecs` is
    * its clean-host time — re-recorded round 9 as the MINIMUM probe
    * over verified-clean runs (BENCH_r08 read 0.139 on a clean host;
    * the round-8 value 0.21 sat ~34% above this host class's floor,
    * so a genuine ~25% sustained-slow regime still clamped to factor
    * 1.0 and hid — the exact forensics gap the probe exists to
    * close). `calibration_factor` = min(all probes)/ref — min,
    * because a transient stall inflates some probes but only a
    * SUSTAINED slow regime inflates all of them. factor ≈ 1 ⇒ the
    * artifact compares directly across rounds; factor 1.3 ⇒ the host
    * ran ~30% slow and `total_min_calibrated` (= total_min/factor)
    * estimates the clean-host number in-artifact. The divisor is
    * clamped at 1 so a fast host can never INFLATE the claim.
    */
  private val CalibrationRefSecs = 0.139

  private final case class Attempt(secs: Double, stealS: Double, gapS: Double, gcS: Double) {
    /** Host interference verdict, not engine quality: >1 CPU-s stolen,
      * or a >1 s whole-JVM freeze that GC doesn't account for. */
    def suspect: Boolean =
      secs >= 0 && (stealS > 1.0 || (gapS > 1.0 && gapS > gcS + 0.5))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE may re-partition CACHED plans (guide §2: scale-adaptive
      // partitioning, not a constant): by default Spark pins a cached
      // frame's layout to the static shuffle-partition count, so every
      // scan over the persist-heavy iterative operators (pagerank/
      // kcore/components round state) paid `cpus` near-empty tasks per
      // reference at gate scale. With the flag on, AQE coalesces the
      // cached plan to the advisory partition size — tiny caches read
      // as one task, 100 TB caches (partitions >= advisory size
      // already) are untouched. Values are partition-independent:
      // oracle rows fold deterministically by design (r19 closed the
      // one exception — the regr_* OLS tails — with ols_fit6).
      // Validated r19 with the flag in Verify: full oracle 322/322;
      // Probe min-of-3 at sf0.1/32cpu, flag off -> on: graph_kcore
      // 4.87 -> 3.66 s, graph_pagerank 9.83 -> 6.23 s,
      // graph_components 3.03 -> 2.70 s.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // host-freeze armor (PERF.md round-6): the sandbox hypervisor
      // suspends this VM for multi-minute chunks; with the default
      // 10 s heartbeat a long freeze kills the in-process executor
      // ("unable to send heartbeats ... 60 times", exit 56) and the
      // whole bench with it. Generous timeouts keep a frozen-then-
      // resumed run alive; they change nothing about measured work.
      .config("spark.executor.heartbeatInterval", "120s")
      .config("spark.network.timeout", "1200s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Heartbeat.start()
    val benchSteal0 = stealJiffies()

    def runNoop(fn: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn.write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    def instrument(run: () => Double): Attempt = {
      val s0 = stealJiffies(); val g0 = gcMillis(); Heartbeat.reset()
      val secs = run()
      Attempt(secs,
        (stealJiffies() - s0) / 100.0,
        Heartbeat.maxGapSecs(),
        (gcMillis() - g0) / 1000.0)
    }

    // each sample = min of 3 executions: single executions of the 1B
    // fold still jitter ±50 ms with JIT/scheduling noise; the min of 3
    // is a stable host-speed estimate and total probe overhead stays
    // ~6 s per bench run
    def calibrationProbe(): Double = {
      import org.apache.spark.sql.functions.{xxhash64, col => c, bit_xor}
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(0L, 1000000000L, 1L, 32)
          .select(xxhash64(c("id")).as("h")).agg(bit_xor(c("h")))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      Seq(once(), once(), once()).min
    }
    val probes = scala.collection.mutable.ArrayBuffer.empty[Double]

    // warmup: touch every table + exercise codegen/JSON paths once
    SparkEntry.queries.get("q1_pricing_summary").foreach(q =>
      try q(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () })
    try spark.read.parquet(s"$sfDir/documents.parquet")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // SPARK_GRAFT_ONLY=name1,name2 restricts the run (local scaling
    // probes); the official artifact always runs the full set.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    // the unit of measurement: name → a fresh full execution
    val runnables0: Seq[(String, () => Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        name -> (() => runNoop(fn(spark, sfDir)))
      } :+ ("stream_gen_1m" -> { () =>
        // reference-comparable pipeline throughput: 1M generated records
        // through a processor into a sink (see BASELINE.md ground truth)
        val p = graft.pipeline.Pipeline("bench")
          .source("gen", "builtin:generator",
            "format.options.id" -> "int", "format.options.name" -> "string",
            "recordCount" -> "1000000")
          .processor("set", "field.set",
            "field" -> ".Payload.After.department", "value" -> "finance")
        // ground-truth style: one pass source→processor→sink, no
        // bookkeeping actions in the timed path (BASELINE.md rules)
        runNoop(graft.model.Cdc.ok(
          graft.pipeline.Runner.build(spark, p, streaming = false)))
      })

    val runnables: Seq[(String, () => Double)] =
      if (only.isEmpty) runnables0
      else {
        // a typo must not yield an empty-but-valid-looking artifact
        val known = runnables0.map(_._1).toSet
        val unknown = only.diff(known)
        require(unknown.isEmpty, "SPARK_GRAFT_ONLY names not runnable: " +
          unknown.toSeq.sorted.mkString(", ") +
          s" (known: ${known.toSeq.sorted.mkString(", ")})")
        runnables0.filter { case (name, _) => only(name) }
      }

    val attempts = scala.collection.mutable.LinkedHashMap
      .empty[String, List[Attempt]]
    def record(name: String, a: Attempt): Unit =
      attempts(name) = attempts.getOrElse(name, Nil) :+ a

    // A/A methodology: two identical in-JVM passes. `queries` (pass 1,
    // cold codegen/JIT — comparable with every earlier round's numbers)
    // and `queries_steady` (pass 2, steady state). The per-query spread
    // between the passes IS the single-shot noise floor. Steady attempts
    // flagged by the host sentinel re-run (≤3 total) so `queries_min`
    // is freeze-free without manual forensics.
    // probe twice up front (the first touches the noop/codegen path)
    calibrationProbe(); probes += calibrationProbe()

    val cold = runnables.map { case (name, run) =>
      val a = instrument(run); record(name, a); name -> a.secs
    }.to(scala.collection.mutable.LinkedHashMap)

    probes += calibrationProbe() // mid-run host-speed sample

    val steady = runnables.map { case (name, run) =>
      var a = instrument(run); record(name, a)
      var tries = 1
      while (a.suspect && tries < 3) {
        a = instrument(run); record(name, a); tries += 1
      }
      name -> a.secs
    }.to(scala.collection.mutable.LinkedHashMap)

    val minMap = attempts.map { case (name, as) =>
      val ok = as.map(_.secs).filter(_ >= 0)
      name -> (if (ok.isEmpty) -1.0 else ok.min)
    }

    def f(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    def js(m: scala.collection.Map[String, Double]): String =
      m.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    def arr(vs: Seq[Double]): String = vs.map(f).mkString("[", ",", "]")

    // per-query dossier for anything the sentinel flagged; an empty map
    // means the artifact needed no adjudication
    val suspects = attempts.filter(_._2.exists(_.suspect)).map { case (name, as) =>
      "\"" + name + "\":{" +
        "\"secs\":" + arr(as.map(_.secs)) + "," +
        "\"steal_s\":" + arr(as.map(_.stealS)) + "," +
        "\"gap_s\":" + arr(as.map(_.gapS)) + "," +
        "\"gc_s\":" + arr(as.map(_.gcS)) + "," +
        "\"suspect\":" + arr(as.map(a => if (a.suspect) 1.0 else 0.0)) + "," +
        "\"min_still_suspect\":" + {
          val ok = as.filter(_.secs >= 0)
          ok.nonEmpty && as.filter(_.secs >= 0).minBy(_.secs).suspect
        } + "}"
    }.mkString("{", ",", "}")

    probes += calibrationProbe() // end-of-run host-speed sample

    val total = cold.values.filter(_ >= 0).sum
    val totalSteady = steady.values.filter(_ >= 0).sum
    val totalMin = minMap.values.filter(_ >= 0).sum
    val stealTotal = (stealJiffies() - benchSteal0) / 100.0
    val calFactor = probes.min / CalibrationRefSecs
    val calJson = "{\"probe_s\":" + arr(probes.toSeq) +
      ",\"ref_s\":" + f(CalibrationRefSecs) +
      ",\"factor\":" + f(calFactor) + "}"
    val line = s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":${js(cold)},"queries_steady":${js(steady)},"queries_min":${js(minMap)},"total_steady":${f(totalSteady)},"total_min":${f(totalMin)},"calibration":$calJson,"total_min_calibrated":${f(totalMin / math.max(calFactor, 1.0))},"stall_suspects":$suspects,"steal_delta_s":${f(stealTotal)},"max_gap_s":${f(Heartbeat.globalMaxSecs())},"sf":"$sfDir"}"""
    println(line)
    // Durable copy: the driver captures stdout's tail, which has twice
    // truncated the (long) line into `parsed: null`. BENCH_LOCAL.json
    // in the CWD (also overridable) survives any tail window.
    try {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (line + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    // Compact totals-only line LAST: the driver's stdout tail window
    // (~2 KB) truncates the full per-query line, so every BENCH_r*.json
    // parsed as null. This one is a few hundred bytes and printed
    // last, so it always survives the tail; per-query data lives in
    // the full line above / BENCH_LOCAL.json.
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","total_steady":${f(totalSteady)},"total_min":${f(totalMin)},"total_min_calibrated":${f(totalMin / math.max(calFactor, 1.0))},"cal_factor":${f(calFactor)},"n_queries":${minMap.size},"steal_delta_s":${f(stealTotal)},"max_gap_s":${f(Heartbeat.globalMaxSecs())},"detail":"BENCH_LOCAL.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
