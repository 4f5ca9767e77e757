// Generate the sf1 scaling corpus used by PERF.md's "sf0.1 -> sf1"
// table: 10 disjoint key-shifted copies of sf0.1. Each copy is a
// closed key universe at +i*10^9 (joins keep their exact
// selectivity); shared dims region/nation stay unshifted. Document /
// embedding copies keep their content, so the duplicate density grows
// ~quadratically — a deliberately harder stress for the dedup family,
// not a neutral 10x volume bump.
//
// Run (needs nanosAsLong for the events TIMESTAMP(NANOS) column —
// without it the events write throws and spark-shell -I silently
// skips the remaining tables):
//   /opt/spark/bin/spark-shell --master "local[16]" --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     -I scripts/gen_sf1.scala
import org.apache.spark.sql.functions._
val src = sys.env.getOrElse("SPARK_GRAFT_SRC", "/root/testdata/sf0.1")
val dst = sys.env.getOrElse("SPARK_GRAFT_DST", "/tmp/sf1")
val OFF = 1000000000L
val shifts: Seq[(String, Seq[String])] = Seq(
  "region" -> Nil,
  "nation" -> Nil,
  "customer" -> Seq("c_custkey"),
  "supplier" -> Seq("s_suppkey"),
  "part" -> Seq("p_partkey"),
  "orders" -> Seq("o_orderkey", "o_custkey"),
  "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
  "events" -> Seq("event_id", "user_id"),
  "documents" -> Seq("doc_id"),
  "embeddings" -> Seq("vec_id"))
for ((t, keys) <- shifts) {
  try {
    val base = spark.read.parquet(s"$src/$t.parquet")
    val out =
      if (keys.isEmpty) base
      else (0 until 10).map { i =>
        keys.foldLeft(base) { (df, k) => df.withColumn(k, col(k) + lit(i * OFF)) }
      }.reduce(_ unionByName _)
    out.repartition(32).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    println(s"$t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
  } catch { case e: Throwable => println(s"$t FAILED: ${e.getMessage.take(200)}") }
}
System.exit(0)
