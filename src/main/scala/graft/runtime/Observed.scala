package graft.runtime

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Registry for `Dataset.observe` metrics — the no-silent-caps mechanism
 * (round-1 verdict item 6: the dedup band cap and linker block cap dropped
 * candidates with no counter).
 *
 * Every capped operator attaches an `observe` aggregate counting the rows
 * it drops; `observe` rides the existing job (an AggregatingAccumulator —
 * no extra action, stays inside whole-stage codegen). This listener
 * harvests the observed values on query completion into a process-wide
 * map, WARN-logs any non-zero drop counter, and [[Checkpoint]] snapshots
 * the map into each stage manifest so the counters are part of the run's
 * lineage record.
 */
object Observed {

  /** observation name → (metric column name → value). */
  private val values = new ConcurrentHashMap[String, Map[String, Long]]()
  private val installed = ConcurrentHashMap.newKeySet[String]()

  private val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      qe.observedMetrics.foreach { case (name, row) =>
        val m = row.schema.fieldNames.map { f =>
          f -> (row.getAs[Any](f) match {
            case l: Long => l
            case i: Int => i.toLong
            case null => 0L
            case other => other.toString.toDouble.toLong
          })
        }.toMap
        values.put(name, m)
        m.foreach { case (k, v) =>
          if (v > 0)
            org.slf4j.LoggerFactory.getLogger(getClass)
              .warn(s"graft observed metric $name.$k = $v (capped/dropped rows)")
        }
      }
    }
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
  }

  /** Idempotent per-session listener registration. */
  def install(spark: SparkSession): Unit =
    if (installed.add(System.identityHashCode(spark).toString))
      spark.listenerManager.register(listener)

  def get(name: String): Option[Map[String, Long]] = Option(values.get(name))

  /** Drop a stored observation (tests: isolate from earlier queries that
    * reported under the same name).
    */
  def clear(name: String): Unit = values.remove(name)

  def snapshot(): Map[String, Map[String, Long]] = {
    import scala.jdk.CollectionConverters._
    values.asScala.toMap
  }
}
