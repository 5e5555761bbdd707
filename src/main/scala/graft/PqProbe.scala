package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cumulative-stage decomposition of `pq_topk_trained` (the
  * GramProbe method, SCALE.md round 11): time each prefix of the
  * op's plan at a given SF so the expensive stage is attributed, not
  * guessed. Stages:
  *   1. sub      — explode + slice + self-dot + localCheckpoint
  *   2. assign1  — one scoring pass (broadcast join + long-key argmin)
  *   3. means1   — assignment ⋈ sub re-join + per-cell means
  *   4. train    — the full LloydRounds codebook chain
  *   5. full     — the declared op end-to-end
  *
  *   sbt "runMain graft.PqProbe /tmp/sf10"
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ext.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._

    // stage-level attribution: which stage actually burns the time,
    // and with how many tasks (the 1-task-after-AQE-coalesce theory
    // needs direct evidence, not plan-string reading)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val secs = (for {
            s <- si.submissionTime; c <- si.completionTime
          } yield (c - s) / 1e3).getOrElse(-1.0)
          if (secs > 2.0)
            println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
              f"${secs}%7.2f s  ${si.name.linesIterator.next().take(90)}")
        }
      })

    def time(name: String)(mk: => DataFrame): Unit = {
      // warm once, then min-of-2
      mk.count()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[pq-probe] $name%-10s ${ts.min}%8.2f s (runs ${ts.map(t => f"$t%.2f").mkString(",")})")
    }

    val emb = Tables(spark, sfDir, "embeddings")
    def mkSub() = emb
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(7))).as("s"),
        col("embedding"))
      .withColumn("sv", expr("slice(embedding, s * 8 + 1, 8)"))
      .withColumn("s2", expr("dot_f(sv, sv)"))
      .select(col("vec_id"), col("s"), col("sv"), col("s2"))

    time("sub_raw")(mkSub())
    val sub = mkSub().localCheckpoint()
    val t0 = System.nanoTime()
    sub.count()
    println(f"[pq-probe] sub_chk    ${(System.nanoTime() - t0) / 1e9}%8.2f s (checkpoint reread)")

    def cb0() = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code"),
        explode(sequence(lit(0), lit(7))).as("s"),
        col("embedding"))
      .withColumn("c_sv", expr(
        "transform(slice(embedding, s * 8 + 1, 8), x -> CAST(x AS DOUBLE))"))
      .select(col("s"), col("code"), col("c_sv"))
      .withColumn("c2", expr("dot_fd(c_sv, c_sv)"))

    def assign(cb: DataFrame) = sub.join(broadcast(cb), "s")
      .withColumn("d2",
        round(col("s2") + col("c2") -
          lit(2.0) * expr("dot_fd(sv, c_sv)"), 4))
      .withColumn("k",
        round(col("d2") * 10000, 0).cast("long") * 65536L + col("code"))
      .groupBy(col("vec_id"), col("s"))
      .agg(min(col("k")).as("k"))
      .select(col("vec_id"), col("s"), (col("k") % 65536L).as("code"))

    def means(a: DataFrame) = a.join(sub, Seq("vec_id", "s"))
      .select(col("s"), col("code"), posexplode(col("sv")))
      .groupBy(col("s"), col("code"), col("pos"))
      .agg(round(avg(col("col")), 4).as("v"))
      .groupBy(col("s"), col("code"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, v)))," +
        " x -> x.v)").as("newsv"))

    def meansMerge(a: DataFrame) = a.join(sub.hint("merge"), Seq("vec_id", "s"))
      .select(col("s"), col("code"), posexplode(col("sv")))
      .groupBy(col("s"), col("code"), col("pos"))
      .agg(round(avg(col("col")), 4).as("v"))
      .groupBy(col("s"), col("code"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, v)))," +
        " x -> x.v)").as("newsv"))

    val c0 = cb0().localCheckpoint()
    // count()-based timings of an Aggregate are pruned lies: count
    // over groupBy drops the min(k) aggregate, and with it the entire
    // d2/dot_fd scoring tree. Force the value columns with sum().
    time("assign_full")(assign(c0).agg(sum(col("code")).as("x")))
    // the localCheckpoint CALL itself (eager materialization):
    val tc0 = System.nanoTime()
    val a1 = assign(c0).localCheckpoint()
    println(f"[pq-probe] a_chk_call ${(System.nanoTime() - tc0) / 1e9}%8.2f s" +
      s" (${a1.rdd.getNumPartitions} partitions)")
    time("joinonly")(a1.join(sub, Seq("vec_id", "s"))
      .agg(sum(col("code") + size(col("sv"))).as("x")))
    time("join_expl")(a1.join(sub, Seq("vec_id", "s"))
      .select(col("s"), col("code"), posexplode(col("sv")))
      .agg(sum(col("col")).as("x"), sum(col("pos")).as("y")))
    time("means_a1")(means(a1))
    time("means1")(means(assign(c0)))

    def train(rounds: Int): DataFrame = {
      var cb = c0
      (1 to rounds).foreach { _ =>
        val m = means(assign(cb).localCheckpoint())
        cb = cb.join(m, Seq("s", "code"), "left")
          .select(col("s"), col("code"),
            coalesce(col("newsv"), col("c_sv")).as("c_sv"))
          .withColumn("c2", expr("dot_fd(c_sv, c_sv)"))
          .localCheckpoint()
      }
      cb
    }
    time("train3")(train(3))
    val cbf = train(3)
    time("codes_f")(assign(cbf))
    def adc(cb: DataFrame) = sub.filter(col("vec_id") === 0)
      .select(col("s"), col("sv").as("q_sv"))
      .join(broadcast(cb), "s")
      .withColumn("qdot_i",
        round(expr("dot_fd(q_sv, c_sv)") * 10000, 0).cast("long"))
      .select(col("s"), col("code"), col("qdot_i"))
    time("tail") {
      assign(cbf)
        .join(broadcast(adc(cbf)), Seq("s", "code"))
        .groupBy(col("vec_id"))
        .agg((sum(col("qdot_i")) / 10000.0).as("adc_score"))
        .filter(col("vec_id") =!= 0)
        .orderBy(col("adc_score").desc, col("vec_id"))
        .limit(10)
    }
    println(s"[pq-probe] sub partitions: ${sub.rdd.getNumPartitions}")
    spark.stop()
  }
}
