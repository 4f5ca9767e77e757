// Constant-duplicate-density control for the sf1 scaling corpus
// (VERDICT r6 item #2): /tmp/sf1's embeddings are 10 IDENTICAL copies
// of sf0.1's, so true near-dup pair work grows ~quadratically (each
// original pair spawns ~100 cross-copy pairs, each vector C(10,2)=45
// self-pairs). This variant applies a per-copy SIGNED ROTATION
// (dimension rotation + deterministic sign flips — an orthogonal
// transform): within-copy cosines are preserved EXACTLY (each copy
// contributes precisely sf0.1's pair structure) while cross-copy
// cosines decorrelate (expected ~0 for 64 dims), so duplicate density
// stays constant at 10x the volume. dedup_embedding's scale factor on
// THIS corpus isolates the engine effect from the corpus effect.
//
// Run:
//   /opt/spark/bin/spark-shell --master "local[16]" --driver-memory 8g \
//     --conf spark.sql.shuffle.partitions=32 \
//     -I scripts/gen_sf1_constdensity.scala
import org.apache.spark.sql.functions._
val src = sys.env.getOrElse("SPARK_GRAFT_SRC", "/root/testdata/sf0.1")
val dst = sys.env.getOrElse("SPARK_GRAFT_DST", "/tmp/sf1cd")
val OFF = 1000000000L
val D = 64

// splitmix64-style deterministic sign per (copy, dim)
def signAt(i: Int, j: Int): Float = {
  var x = i.toLong * 2654435761L + j.toLong * 40503L + 0x9e3779b97f4a7c15L
  x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
  x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
  x = x ^ (x >>> 31)
  if ((x & 1L) == 0L) 1f else -1f
}

val base = spark.read.parquet(s"$src/embeddings.parquet")
val out = (0 until 10).map { i =>
  if (i == 0) base
  else base
    .withColumn("vec_id", col("vec_id") + lit(i * OFF))
    .withColumn("embedding",
      array((0 until D).map { j =>
        (col("embedding").getItem((j + 7 * i) % D) * lit(signAt(i, j)))
          .cast("float")
      }: _*))
}.reduce(_ unionByName _)
out.repartition(32).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
println(s"embeddings: ${spark.read.parquet(s"$dst/embeddings.parquet").count()} rows")
System.exit(0)
