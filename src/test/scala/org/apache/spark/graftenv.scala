package org.apache.spark

/** Test-only accessor for private[spark] runtime state: lets specs count
  * live broadcast blocks to pin the serving loop's release-after-sink
  * hygiene. Mirrors the `graftshims` convention used for sql internals. */
object graftenv {
  def broadcastBlockCount(sc: SparkContext): Int =
    sc.env.blockManager.getMatchingBlockIds(_.isBroadcast).size
}
