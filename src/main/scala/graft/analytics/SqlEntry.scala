package graft.analytics

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pure `spark.sql` entry point for the handful of queries that exercise
  * the SQL surface (GROUPING SETS, NOT IN, LATERAL, recursive CTE — the
  * shapes the DataFrame API cannot spell directly).
  *
  * A bare `createOrReplaceTempView(fixedName)` inside a query builder
  * breaks the "pure `(SparkSession, sfDir) => DataFrame`" contract every
  * other builder honors: two concurrent builds of the same query against
  * different datasets race on the shared session catalog (last
  * registration wins between view creation and `spark.sql` analysis),
  * silently binding one plan to the other's data — and the view leaks.
  *
  * Here every invocation registers its inputs under a process-unique
  * suffix, analyzes the statement against those names, and drops the
  * views before returning. `spark.sql` analysis is eager: the resolved
  * plan inlines the view's child plan, so the returned DataFrame stays
  * executable after the drop and the session catalog is left exactly as
  * found.
  */
object SqlEntry {

  private val seq = new AtomicLong()

  /** Run `statement` with each `(placeholder, df)` input visible as a
    * table named `placeholder`. Placeholders must be distinctive tokens
    * (they are substituted by plain string replacement). */
  def sql(s: SparkSession, statement: String, inputs: (String, DataFrame)*): DataFrame = {
    val bound = inputs.map { case (name, df) =>
      (name, s"${name}_v${seq.incrementAndGet()}", df)
    }
    bound.foreach { case (_, viewName, df) => df.createOrReplaceTempView(viewName) }
    try s.sql(bound.foldLeft(statement) { case (q, (name, viewName, _)) =>
      q.replace(name, viewName)
    })
    finally bound.foreach { case (_, viewName, _) => s.catalog.dropTempView(viewName) }
  }
}
