package graft.tools

import org.apache.spark.sql.functions._

import graft.link.Compaction
import graft.streaming.StreamLink

/** CLI driver for the offline bridge compaction — the periodic maintenance
  * job an incremental-linking deployment schedules (monthly drops →
  * compaction → stream continues against the compacted state):
  * `runMain graft.tools.CompactRun <stateDir> <outDir> [migrationDir]`
  * — compacts `stateDir` into a fresh snapshot at `outDir` and, when given,
  * persists the old→new migration map at `migrationDir` for consumers of
  * published canonical ids. Prints a one-line JSON summary. */
object CompactRun {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CompactRun <stateDir> <outDir> [migrationDir]")
    val spark = graft.SparkSessionFactory.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-compact")
    try {
      val bridges = StreamLink.readBridges(spark, args(0)).count()
      val mig = Compaction.compact(spark, args(0), args(1))
      args.lift(2).foreach(p => mig.write.mode("overwrite").parquet(p))
      val row = mig.agg(count(lit(1)), count(when(col("changed"), 1))).head()
      println(s"""{"published_ids":${row.getLong(0)},"migrated":${row.getLong(1)},""" +
        s""""bridges_consumed":$bridges,"out":"${args(1)}"}""")
    } finally spark.stop()
  }
}
