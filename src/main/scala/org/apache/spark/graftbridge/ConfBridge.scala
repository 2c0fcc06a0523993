package org.apache.spark.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.spark.util.SerializableConfiguration

/** Bridge to Spark's `private[spark]` [[SerializableConfiguration]] —
  * the standard way to ship a Hadoop Configuration into tasks (every
  * built-in datasource uses it). Needed by [[graft.operators
  * .SnapshotStats]]'s distributed footer-stats job so executor-side
  * filesystem access sees the same fs.* settings as the driver.
  */
object ConfBridge {
  def serializable(conf: Configuration): SerializableConfiguration =
    new SerializableConfiguration(conf)
  def value(sc: SerializableConfiguration): Configuration = sc.value
}
