package graft.tools

import graft.queries.Battery
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Counts Spark jobs/stages/tasks and their wall time for one battery
  * query execution — distinguishes per-stage scheduling overhead from
  * compute for the small-sf serve paths (r20 evidence).
  * `runMain graft.tools.JobCountProbe <query> [reps]` */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var stageMs = 0L
    val byName =
      new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        val ms = (for (a <- s.stageInfo.submissionTime;
          b <- s.stageInfo.completionTime) yield b - a).getOrElse(0L)
        stageMs += ms
        val key = s.stageInfo.name.takeWhile(_ != '(').trim + " @ " +
          s.stageInfo.name.dropWhile(_ != '(')
            .replaceAll("[0-9]+", "N").take(60)
        byName.merge(key, (1, ms),
          (a, b) => (a._1 + b._1, a._2 + b._2))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val fn = Battery.queries(name)
    (1 to reps).foreach { r =>
      jobs = 0; stages = 0; tasks = 0; stageMs = 0; byName.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      println(f"[jobs] $name rep$r rows=$n wall=$dt%.2f s " +
        f"jobs=$jobs stages=$stages tasks=$tasks stageTime=${stageMs / 1e3}%.2f s")
      if (r == reps) {
        import scala.jdk.CollectionConverters._
        byName.asScala.toSeq.sortBy(-_._2._2).take(15).foreach {
          case (k, (c, ms)) =>
            println(f"[jobs]   ${ms / 1e3}%6.2f s x$c%-3d $k")
        }
      }
      graft.operators.Dedup.releasePersisted()
    }
    spark.stop()
  }
}
