package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's recommended session configuration — the same
  * knobs a spark-submit deployment would set (SURVEY.md §4.2/§4.3):
  * AQE with skew-join splitting, sensible shuffle parallelism, native
  * function registration (GraftExtensions).
  */
object SparkSessionFactory {

  /** Per-process scratch dir under tmp (warehouse etc.): concurrent local
    * JVMs (driver + bench + tests) must not collide on table paths; a
    * shutdown hook removes it so repeated runs don't fill the host tmp. */
  def scratchDir(prefix: String): String = {
    val dir = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      s"/$prefix-${ProcessHandle.current().pid()}"
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))))
    dir
  }

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // bucketed-table warehouse (co-located joins); a deployment overrides
      // this with its real metastore/warehouse
      .config("spark.sql.warehouse.dir", scratchDir("graft-warehouse"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")

  def local(cpus: Int, appName: String = "graft"): SparkSession = {
    val s = builder(s"local[$cpus]", math.max(cpus, 4)).appName(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
