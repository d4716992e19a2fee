package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/**
 * Bridge to Spark's `private[spark]` [[SerializableConfiguration]]: ships
 * the session's Hadoop configuration to executors (filesystem credentials,
 * endpoint overrides) so tasks can open files/footers directly — the
 * distributed-metadata-scan prerequisite. Lives under `org.apache.spark`
 * for package access, like [[ColumnBridge]].
 */
object HadoopConfBridge {
  def broadcastConf(spark: SparkSession): Broadcast[SerializableConfiguration] =
    spark.sparkContext.broadcast(
      new SerializableConfiguration(spark.sessionState.newHadoopConf()))

  def confOf(b: Broadcast[SerializableConfiguration]): Configuration = b.value.value
}
