package graft.util

import org.apache.spark.sql.SparkSession

/** Label the Spark jobs an eager library phase launches (guide §1.5) so
  * profiler output (OptProf, the UI) attributes wall time to the phase
  * instead of an anonymous job id. Thread-local, restores the previous
  * description, no effect on planning or results.
  */
object JobDesc {
  def labeled[T](spark: SparkSession, desc: String)(f: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try f
    finally sc.setJobDescription(prev)
  }
}
