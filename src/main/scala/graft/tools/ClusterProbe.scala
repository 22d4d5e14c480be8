package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSessionFactory
import graft.pipeline.Extract
import graft.synth.Corpus

/** Multi-JVM execution probe: runs the flagship extraction once under
  * single-process `local[8]` and once under `local-cluster[2,8,4096]` —
  * real forked executor JVMs, so closure/broadcast serialization and the
  * per-executor `ExtractorModel` singleton actually cross a process
  * boundary — and asserts the triples are bit-identical (count + an
  * order-independent xxhash64 fold over every column).
  *
  * `runMain graft.tools.ClusterProbe [docs]` (default 2000).
  */
object ClusterProbe {

  /** (row count, order-independent checksum) of the extraction output.
    * bit_xor keeps the fold overflow-free under ANSI mode and independent
    * of partitioning/arrival order — exactly what a cross-master
    * bit-identity claim needs. */
  def extractChecksum(spark: SparkSession, docs: Long): (Long, Long) = {
    val t = Extract.triples(
      Corpus.pages(spark, docs, seed = 11, noisyFrac = 0.02).toDF()).toDF()
    val row = t.agg(
      count(lit(1)),
      bit_xor(xxhash64(col("url"), col("subjectType"), col("subject"),
        col("relation"), col("objectType"), col("obj")))).head()
    (row.getLong(0), row.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val docs = if (args.nonEmpty) args(0).toLong else 2000L
    val local = SparkSessionFactory.local(8, "probe-local")
    val (c1, h1) = extractChecksum(local, docs)
    local.stop()
    val cl = SparkSessionFactory.cluster("local-cluster[2,8,4096]", "probe-cluster")
    val (c2, h2) = extractChecksum(cl, docs)
    cl.stop()
    println(s"""{"docs":$docs,"local":{"triples":$c1,"checksum":$h1},""" +
      s""""cluster":{"triples":$c2,"checksum":$h2},"match":${c1 == c2 && h1 == h2}}""")
    require(c1 == c2 && h1 == h2, "multi-JVM extraction diverged from local mode")
  }
}
