package graft.tools

/** Dump `explain("formatted")` for named registered queries to files —
  * the per-round before/after plan evidence (`plans/r07/<q>_{before,after}.txt`).
  * `runMain graft.tools.PlanDumpQ <outDir> <suffix> <name>[,<name>...]`
  * Honors SPARK_GRAFT_SF_DIR. Measurement tooling only. */
object PlanDumpQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDumpQ <outDir> <suffix> <names>")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(outDir)
    val spark = graft.SparkSessionFactory.local(8, "graft-plandumpq")
    try names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote ${outDir.resolve(s"${n}_$suffix.txt")}")
    } finally spark.stop()
  }
}
