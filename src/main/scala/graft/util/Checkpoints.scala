package graft.util

import org.apache.spark.sql.DataFrame

/** Frees the block storage behind `localCheckpoint()`ed DataFrames.
  *
  * The checkpointed RDD lives inside the Dataset's
  * [[org.apache.spark.sql.execution.LogicalRDD]] plan node;
  * `Dataset.unpersist` would be a no-op (it only talks to the
  * CacheManager; localCheckpoint blocks belong to the underlying RDD), so
  * the RDD itself is unpersisted — immediately, instead of waiting for
  * the ContextCleaner. Shared by the iterative loops that supersede a
  * checkpoint per round (NearDup star-rounds, KMeans, BPE).
  *
  * Log hygiene (r13 hygiene item): `RDD.unpersist` warns that a
  * locally-checkpointed RDD "cannot be recomputed after unpersisting" —
  * which is precisely the POINT of this call (the checkpoint is
  * superseded and must never be read again), and 222 copies per test run
  * were burying real warnings in the log tails. The RDD class's logger is
  * held at ERROR for the one synchronous `unpersist(blocking = false)`
  * call and restored after; the window is driver-local and microseconds
  * wide, and `tools/claims_gate.py` polices the committed logs for the
  * pattern so a regression here is mechanical, not anecdotal.
  */
object Checkpoints {
  private val logLock = new Object

  def free(df: DataFrame): Unit = {
    val rdds = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    rdds.foreach { rdd =>
      // Spark's Logging.logName is the runtime class with any trailing $
      // stripped — match it exactly so the suppression lands on the
      // logger the warning is emitted through
      val name = rdd.getClass.getName.stripSuffix("$")
      logLock.synchronized {
        val prior = org.apache.logging.log4j.LogManager.getLogger(name).getLevel
        org.apache.logging.log4j.core.config.Configurator.setLevel(
          name, org.apache.logging.log4j.Level.ERROR)
        try rdd.unpersist(blocking = false)
        finally org.apache.logging.log4j.core.config.Configurator.setLevel(name, prior)
      }
    }
  }
}
