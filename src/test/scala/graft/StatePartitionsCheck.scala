package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Test-scope check main: does restoring spark.sql.shuffle.partitions
  * IMMEDIATELY after writeStream.start() race the stream's conf
  * snapshot? StreamExecution clones the session (capturing the conf)
  * during query construction inside start(), so the restore-after-
  * start pattern used by StreamingQueries.startWithStatePartitions
  * and StOverheadBench should be sound — this verifies it by reading
  * the state operator's own numShufflePartitions from query progress
  * after the conf has been put back. */
object StatePartitionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    val mem = MemoryStream[Int]
    spark.conf.set(key, "8")
    val q = mem.toDF().dropDuplicates("value")
      .writeStream.format("memory").queryName("spc")
      .outputMode("update").start()
    spark.conf.set(key, old) // restore IMMEDIATELY, like the gates do
    mem.addData(1, 2, 3)
    q.processAllAvailable()
    val n = q.lastProgress.stateOperators.apply(0).numShufflePartitions
    q.stop()
    println(s"RESULT state_partitions=$n session_conf=$old")
    spark.stop()
  }
}
