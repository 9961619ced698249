package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** As-of join: for every left row, the most recent right row with the
  * same key and time ≤ the left row's time.
  *
  * Spark has no native as-of join; the scalable composition is the
  * union-and-running-max trick: tag both sides, sort within each key
  * by (time, tag) — right rows first on ties so `>=` semantics hold —
  * and carry a running max of struct(right_time, right_payload).
  * Struct ordering is lexicographic, so the max IS the latest right
  * row seen so far. One shuffle on the key, one within-partition sort:
  * the same cost as a single window query, with no row explosion —
  * this holds at 100 TB where a per-left-row subquery never would.
  */
object AsofJoin {

  /** Generic as-of: left + (asofTime, asofPayload) columns.
    *
    * @param left      left rows (kept in full)
    * @param right     right rows: key, time and one payload column
    * @param key       equi-join key column name (same name both sides)
    * @param leftTime  left event-time column name (numeric or timestamp)
    * @param rightTime right event-time column name
    * @param payload   right payload column name
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String, payload: String): DataFrame = {
    val leftCols = left.columns
    // Null placeholder typed as the EXACT struct<t,p> built on the right
    // side below — same field names, so unionByName merges the two
    // branches into one identical struct type regardless of the right
    // table's own column names.
    val rStruct = right
      .select(struct(col(rightTime).as("t"), col(payload).as("p")))
      .schema.fields.head.dataType
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(1))
      .withColumn("_r", lit(null).cast(rStruct))
    val r = right.select(
      col(key),
      col(rightTime).as("_t"),
      lit(0).as("_tag"),
      struct(col(rightTime).as("t"), col(payload).as("p")).as("_r"))
    val unioned = l.select(col(key) +: l.columns.filterNot(_ == key).toSeq.map(col): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t").asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_last", max(col("_r")).over(w))
      .filter(col("_tag") === 1)
      .select(leftCols.toSeq.map(col) :+
        col("_last.t").as("asof_time") :+ col("_last.p").as("asof_payload"): _*)
  }

  /** For each event: timestamp and value of the user's latest `signup`
    * at or before it — the classic attribution as-of. */
  def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Events.events(s, d)
      .select($"event_id", $"user_id", $"event_type", $"ts_us")
    // one right row per (user, instant): ASOF tie choice is
    // engine-specific, so make the tie impossible. Repartition on
    // user_id alone BEFORE the (user_id, ts_us) aggregate: a
    // user_id-hash partitioning satisfies the aggregate's clustered
    // distribution AND the downstream key requirement, so the signup
    // side shuffles ONCE instead of agg-shuffle + join-shuffle.
    val signups = ev.filter($"event_type" === "signup")
      .repartition($"user_id")
      .groupBy($"user_id", $"ts_us")
      .agg(max($"event_id").as("signup_event"))
    join(ev, signups, "user_id", "ts_us", "ts_us", "signup_event")
      .select($"event_id", $"user_id", $"ts_us",
        $"asof_time".as("signup_us"), $"asof_payload".as("signup_event"))
  }

  /** [[qAsofJoin]] on the dedicated physical operator
    * ([[graft.plans.AsofJoinExec]]): per-side shuffle + sort and an
    * O(n) streaming merge, instead of the union-wide sort + running
    * struct-max. Same semantics, same oracle — the exec earns its own
    * green correctness row. */
  def qAsofPhysical(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Events.events(s, d)
      .select($"event_id", $"user_id", $"event_type", $"ts_us")
    // same single-shuffle signup side as qAsofJoin: user_id partitioning
    // serves both the dedup aggregate and the exec's key requirement
    val signups = ev.filter($"event_type" === "signup")
      .repartition($"user_id")
      .groupBy($"user_id", $"ts_us")
      .agg(max($"event_id").as("signup_event"))
    graft.plans.AsofPhysical
      .join(ev, signups, "user_id", "ts_us", "ts_us", "signup_event")
      .select($"event_id", $"user_id", $"ts_us",
        $"asof_time".as("signup_us"), $"asof_payload".as("signup_event"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (qAsofJoin _),
    "q_asof_physical" -> (qAsofPhysical _)
  )

  private val asofSql =
    """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
      |  FROM events),
      |s AS (SELECT user_id, ts_us, MAX(event_id) AS signup_event FROM e
      |  WHERE event_type = 'signup' GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, e.ts_us,
      |s.ts_us AS signup_us, s.signup_event
      |FROM e ASOF LEFT JOIN s
      |ON e.user_id = s.user_id AND e.ts_us >= s.ts_us""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_asof_join" -> asofSql,
    "q_asof_physical" -> asofSql
  )
}
