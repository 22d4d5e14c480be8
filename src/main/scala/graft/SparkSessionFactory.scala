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
      // list ≤128 partition dirs on the driver: the default threshold (32)
      // launches a distributed listing JOB for the 64-bucket state tables,
      // which costs more than the listing itself at any deployment size —
      // the job path exists for thousands of object-store paths, not dozens
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "128")
      // bucketed-table warehouse (co-located joins); a deployment overrides
      // this with its real metastore/warehouse
      .config("spark.sql.warehouse.dir", scratchDir("graft-warehouse"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")

  def local(cpus: Int, appName: String = "graft"): SparkSession =
    sys.env.get("SPARK_GRAFT_MASTER") match {
      // manual override (e.g. SPARK_GRAFT_MASTER=local-cluster[2,8,4096]
      // sbt "runMain graft.Verify ...") — the whole battery under a real
      // multi-JVM master without touching callers
      case Some(m) if m.startsWith("local-cluster") => cluster(m, appName)
      case _ =>
        val s = builder(s"local[$cpus]", math.max(cpus, 4)).appName(appName).getOrCreate()
        s.sparkContext.setLogLevel("WARN")
        s
    }

  /** Multi-JVM session: `local-cluster[workers,coresPerWorker,memMB]` forks
    * real executor processes through the standalone Worker path, so closure /
    * broadcast serialization, task-result transport, and the per-executor
    * lazy singletons actually cross a process boundary — the in-sandbox
    * stand-in for spark-submit on a real cluster (north_rule). Executor JVMs
    * are built from SPARK_HOME, which knows nothing of this build, so the
    * application classes are handed over via `spark.executor.extraClassPath`
    * (this JVM's own classpath — the forked sbt run JVM carries the full
    * app classpath) and the JDK-17 module opens via the launcher's own
    * [[org.apache.spark.launcher.JavaModuleOptions]]. */
  def cluster(master: String, appName: String = "graft-cluster",
      executorMem: String = "3g"): SparkSession = {
    val appCp = sys.props.getOrElse("java.class.path", "")
    val s = builder(master, 32).appName(appName)
      .config("spark.executor.memory", executorMem)
      .config("spark.executor.extraClassPath", appCp)
      .config("spark.executor.extraJavaOptions",
        org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions())
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
