package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Dev-only micro-benchmarks for driver-side costs (test scope). */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val schema = StructType(Seq(
      StructField("file", StringType, nullable = true),
      StructField("sym_bucket", LongType, nullable = true),
      StructField("zmin", DateType, nullable = true),
      StructField("zmax", DateType, nullable = true),
      StructField("n_rows", LongType, nullable = false)))
    val rows: Array[Row] = (0 until 64).map { i =>
      Row(s"sym_bucket=$i/part-000$i.parquet", i.toLong,
        java.sql.Date.valueOf("1995-01-01"),
        java.sql.Date.valueOf("1998-12-31"), 1000L + i)
    }.toArray

    val base = System.getProperty("java.io.tmpdir") + "/microbench_parts"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(base))

    def timeIt(name: String, n: Int)(f: Int => Unit): Unit = {
      f(10000) // warm
      val t0 = System.nanoTime()
      (0 until n).foreach(f)
      println(f"$name: ${(System.nanoTime() - t0) / 1e6 / n}%.1f ms/op over $n")
    }

    timeIt("spark-part-write", 20) { i =>
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .coalesce(1).write.mode("overwrite").parquet(s"$base/sw_$i")
    }
    // empty 1-row job floor
    timeIt("1-task-job", 20) { _ =>
      spark.range(0, 1, 1, 1).count()
    }
    timeIt("rdd-1-task-job", 50) { _ =>
      spark.sparkContext.parallelize(Seq(1), 1).count()
    }
    val reused = spark.range(0, 1, 1, 1)
    timeIt("reused-df-count", 50) { _ => reused.count() }
    graft.ops.ConfScope.withScopedConf(spark,
      Seq("spark.sql.adaptive.enabled" -> "false")) {
      timeIt("1-task-job-noAQE", 20) { _ =>
        spark.range(0, 1, 1, 1).count()
      }
    }
    timeIt("32-task-job", 20) { _ =>
      spark.range(0, 32, 1, 32).count()
    }
    // createDataFrame+plan cost without the write
    timeIt("createDF-count", 20) { _ =>
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .count()
    }
    spark.stop()
  }
}
