package org.apache.spark.rdd



/** Bridge to `RDD.isLocallyCheckpointed` (private[spark]): the
  * staleness probe of graft's memoized shared stages must distinguish
  * a LOCAL checkpoint (persisted blocks — an external unpersist
  * orphans it) from a RELIABLE one (file-backed — never enters
  * `getPersistentRDDs`, so registry membership says nothing). The
  * storage level cannot stand in: `unpersist` resets it to NONE, which
  * would make a swept local checkpoint read as "not local" exactly
  * when the probe must fire. Same technique as GraftExpressionBridge. */
object GraftRddBridge {
  def isLocallyCheckpointed(rdd: RDD[_]): Boolean = rdd.isLocallyCheckpointed

  /** Drop ONE materialized block of an RDD without deregistering it —
    * the test seam that simulates executor/preemption block loss (the
    * registration survives, the data doesn't), which the memo
    * staleness probe must detect as unrecoverable. `removeBlock` is
    * master-API (private[spark]); production code never calls this. */
  def dropBlock(sc: org.apache.spark.SparkContext, rddId: Int, split: Int): Unit =
    sc.env.blockManager.master.removeBlock(
      org.apache.spark.storage.RDDBlockId(rddId, split))

  /** How many of `rddId`'s `numPartitions` partitions the
    * block-manager MASTER currently knows a block for — the
    * SYNCHRONOUS view the memo block-loss probe needs.
    * `SparkContext.getRDDStorageInfo` reads the listener-bus-fed
    * status store, which lags block events by an async hop (the r17
    * block-drop spec read a full cache right after the drop); the
    * master's blockLocations map is the source of truth. One batched
    * `getLocations` ask, O(partitions of THIS rdd) — not the
    * getMatchingBlockIds predicate scan over every block the master
    * knows, which would land O(all-blocks) driver work inside each
    * memo access and therefore inside timed bench reps (review r17). */
  def masterCachedPartitions(sc: org.apache.spark.SparkContext, rddId: Int,
      numPartitions: Int): Int =
    sc.env.blockManager.master.getLocations(
      (0 until numPartitions)
        .map(org.apache.spark.storage.RDDBlockId(rddId, _))
        .toArray[org.apache.spark.storage.BlockId])
      .count(_.nonEmpty)
}
