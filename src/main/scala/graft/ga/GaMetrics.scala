package graft.ga

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Named metrics matching the reference's GA metric vocabulary
  * (`ga:users`, `ga:sessions`, `ga:pageviews`-class names), ready to
  * pass to [[GaQuery.metrics]]. `sessions` counts distinct 30-min-gap
  * sessions — GaQuery detects it by key and computes session ids
  * automatically (one extra shuffle on user_id).
  */
object GaMetrics {
  val SessionsKey = "sessions"

  /** ga:users — distinct users. */
  def users: (String, Column) = "users" -> countDistinct(col("user_id"))

  /** ga:hits / ga:pageviews analog — row count. */
  def events: (String, Column) = "events" -> count(lit(1))

  /** ga:sessions — distinct gap-based sessions. */
  def sessions: (String, Column) =
    SessionsKey -> countDistinct(col("user_id"), col("_sid"))

  /** ga:totalValue (revenue-style sum, rounded per determinism rules). */
  def totalValue: (String, Column) =
    "total_value" -> round(sum(col("value")), 2)

  /** ga:avgValue. */
  def avgValue: (String, Column) =
    "avg_value" -> round(avg(col("value")), 4)
}
