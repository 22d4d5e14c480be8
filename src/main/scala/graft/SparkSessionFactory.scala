package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's recommended session configuration — the same
  * knobs a spark-submit deployment would set (SURVEY.md §4.2/§4.3):
  * AQE with skew-join splitting, sensible shuffle parallelism, native
  * function registration (GraftExtensions).
  */
object SparkSessionFactory {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // bucketed-table warehouse (co-located joins); a deployment overrides
      // this with its real metastore/warehouse — the sandbox default stays
      // out of the working directory and is per-process so concurrent local
      // JVMs (driver + bench) never collide on table paths
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          s"/graft-warehouse-${ProcessHandle.current().pid()}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")

  def local(cpus: Int, appName: String = "graft"): SparkSession = {
    val s = builder(s"local[$cpus]", math.max(cpus, 4)).appName(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
