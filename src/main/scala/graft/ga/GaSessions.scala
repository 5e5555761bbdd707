package graft.ga

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** The one gap-sessionization kernel (lag → new-session flag →
  * running sum), shared by GaQuery's session scope and the Graft
  * facade so session identity can't drift between entry points.
  * `us` must be an integral microsecond expression; `order` the full
  * deterministic within-user ordering (include a tie-break key).
  */
private[graft] object GaSessions {
  def addSessionId(df: DataFrame, user: Column, us: Column,
      order: Seq[Column], gapUs: Long, out: String): DataFrame = {
    val w = Window.partitionBy(user).orderBy(order: _*)
    df.withColumn("_prev", lag(us, 1).over(w))
      .withColumn("_new", when(col("_prev").isNull ||
        us - col("_prev") > gapUs, 1L).otherwise(0L))
      .withColumn(out, sum(col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev", "_new")
  }
}
