package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink — the engine-side analogue of the reference's Postgres
  * leg (the spark-submit packages `org.postgresql:postgresql:42.7.7`,
  * kafka_stream.pyc @ 91; SURVEY.md §2.3 daily_kpis writes JDBC).
  *
  * Runtime-exercised broker-free: Spark's own distribution ships Apache
  * Derby (the metastore's embedded pure-JVM database), so JdbcSpec
  * round-trips a partitioned write and a predicate-pushdown parallel read
  * through these exact builders against `jdbc:derby:memory:` — same code
  * path a Postgres deployment takes, different driver string. The option
  * plumbing (partitioned parallel reads, batched writes) is the part that
  * matters at scale: without partitionColumn bounds a JDBC read is a
  * single-task bottleneck regardless of cluster size.
  */
object Jdbc {

  /** Batched append/overwrite to a JDBC table (the daily-KPIs sink). */
  def write(
      df: DataFrame,
      url: String,
      table: String,
      user: String,
      password: String,
      mode: String = "append",
      driver: String = "org.postgresql.Driver",
      batchSize: Int = 10000): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("driver", driver)
      .option("batchsize", batchSize)
      .mode(mode)
      .save()

  /** Parallel partitioned read: numPartitions concurrent range scans on a
    * numeric column — without these options a JDBC read is a single-task
    * bottleneck regardless of cluster size.
    */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      user: String,
      password: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      driver: String = "org.postgresql.Driver"): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("driver", driver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()
}
