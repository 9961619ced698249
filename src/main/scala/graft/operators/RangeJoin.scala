package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Range (interval-containment) join: points `p` against intervals
  * `[start, end]`, with no equi key.
  *
  * The naive plan is a nested-loop join — O(points × intervals), fine
  * only when one side broadcasts. [[byBucket]] is the 100 TB shape:
  * quantize time into fixed buckets, explode each interval over the
  * buckets it spans (bounded by interval-length / bucket-width), and
  * equi-join on the bucket before the exact containment filter. Each
  * point lives in exactly one bucket, so no dedup is needed, and the
  * join is an ordinary shuffled/broadcast hash join on a dense key.
  */
object RangeJoin {

  /** Bucketized containment join. Output: all columns of `points` +
    * all columns of `intervals` for every (point ∈ interval) pair.
    * `bucketWidth` should be ≥ typical interval length: cost is
    * O(intervals × span/bucketWidth + matches). */
  def byBucket(points: DataFrame, intervals: DataFrame,
               ptCol: String, startCol: String, endCol: String,
               bucketWidth: Long): DataFrame = {
    val p = points.withColumn("_bk", floor(col(ptCol) / bucketWidth))
    val iv = intervals.withColumn("_bk",
      explode(sequence(floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    p.join(iv, Seq("_bk"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("_bk")
  }

  /** Which events fall inside each "active window" — the first hour of
    * activity of the 10 earliest users (windows carry no key, so the
    * join is pure range containment). */
  def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (ev, windows) = activeWindows(s, d)
    byBucket(ev, windows, "ts_us", "w_start", "w_end", 3600L * 1000000)
      .groupBy($"w_user")
      .agg(count(lit(1)).as("n_events_in_window"),
        countDistinct($"user_id").as("n_users_in_window"))
  }

  private def activeWindows(s: SparkSession, d: String) = {
    import s.implicits._
    val ev = Events.events(s, d).select($"event_id", $"user_id", $"ts_us")
    val windows = ev.filter($"user_id" < 10)
      .groupBy($"user_id".as("w_user"))
      .agg(min($"ts_us").as("w_start"))
      .withColumn("w_end", $"w_start" + 3600L * 1000000)
      .select($"w_user", $"w_start", $"w_end")
    (ev, windows)
  }

  /** Same question and oracle as [[qRangeJoin]], answered by the
    * dedicated physical operator ([[graft.plans.RangePhysical]]):
    * the window set broadcasts as an augmented sorted array and every
    * event probes it with one binary search — no bucket explode, no
    * shuffle of the event side. The bucketized composition and this
    * exec must be result-identical; the shared oracle enforces it. */
  def qRangePhysical(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (ev, windows) = activeWindows(s, d)
    graft.plans.RangePhysical.join(ev, windows, "ts_us", "w_start", "w_end")
      .groupBy($"w_user")
      .agg(count(lit(1)).as("n_events_in_window"),
        countDistinct($"user_id").as("n_users_in_window"))
  }

  /** INTERVAL–INTERVAL OVERLAP join (the general range-join verb, vs
    * the point probes above): which other early users' first-hour
    * activity windows overlap each user's own — the concurrency
    * question behind co-activity, contention and double-booking
    * analyses. Runs on the same broadcast exec with the probe side
    * carrying [start, end] (match ⇔ start ≤ p_end AND end ≥ p_start);
    * zero-overlap users are kept via a left join back to the window
    * set. Scale shape: the interval set is bounded and broadcasts;
    * the probe side can be fact-scale — here it is the same window
    * set, probing itself. */
  def qIntervalOverlap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Events.events(s, d).select($"user_id", $"ts_us")
    val w = ev.filter($"user_id" < 50)
      .groupBy($"user_id".as("w_user"))
      .agg(min($"ts_us").as("w_start"))
      .withColumn("w_end", $"w_start" + 3600L * 1000000)
      .select($"w_user", $"w_start", $"w_end")
    val probes = w.select($"w_user".as("p_user"),
      $"w_start".as("p_start"), $"w_end".as("p_end"))
    val counts = graft.plans.RangePhysical
      .overlapJoin(probes, w, "p_start", "p_end", "w_start", "w_end")
      .filter($"p_user" =!= $"w_user")
      .groupBy($"p_user").agg(count(lit(1)).as("n"))
    w.join(counts, $"w_user" === $"p_user", "left")
      .select($"w_user", coalesce($"n", lit(0L)).as("n_overlapping"))
  }

  /** ANTI range join — the complement question ([[qRangePhysical]]
    * finds events INSIDE windows): per event type, how many events
    * fall outside EVERY active window. Runs as the exec's LEFT OUTER
    * mode + a null filter — unmatched probes emit one null-interval
    * row, so "outside all windows" is `w_user IS NULL`, computed in
    * the same single broadcast pass (no second scan, no NOT EXISTS
    * subquery re-probing the fact table). */
  def qRangeAnti(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Events.events(s, d)
      .select($"event_id", $"event_type", $"ts_us")
    val windows = Events.events(s, d).filter($"user_id" < 10)
      .groupBy($"user_id".as("w_user"))
      .agg(min($"ts_us").as("w_start"))
      .withColumn("w_end", $"w_start" + 3600L * 1000000)
      .select($"w_user", $"w_start", $"w_end")
    graft.plans.RangePhysical
      .join(ev, windows, "ts_us", "w_start", "w_end", outer = true)
      .filter($"w_user".isNull)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_outside"))
  }

  /** FULL OUTER range join — all three row classes of a full join in
    * one pass: events inside windows (matched), events outside every
    * window (the null-window group), and windows NO event touched
    * (zero-count rows — five synthetic windows placed past the global
    * max timestamp are empty by construction, so the gate exercises
    * the unmatched-interval path non-trivially). The global max is a
    * 1-row aggregate cross-joined in (broadcast scalar, the declared
    * pattern); the exec computes the matched-interval set with its
    * bitset pre-pass and unions the untouched windows null-extended. */
  def qRangeFull(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Events.events(s, d).select($"event_id", $"user_id", $"ts_us")
    val real = ev.filter($"user_id" < 10)
      .groupBy($"user_id".as("w_user"))
      .agg(min($"ts_us").as("w_start"))
      .withColumn("w_end", $"w_start" + 3600L * 1000000)
      .select($"w_user", $"w_start", $"w_end")
    val gmax = ev.agg(max($"ts_us").as("gmax"))
    val empty = s.range(5).crossJoin(gmax)
      .select(($"id" + 1000L).as("w_user"),
        ($"gmax" + ($"id" + 1) * 3600000000L).as("w_start"),
        ($"gmax" + ($"id" + 1) * 3600000000L + 1800000000L).as("w_end"))
    val windows = real.unionByName(empty)
    graft.plans.RangePhysical
      .fullJoin(ev, windows, "ts_us", "w_start", "w_end")
      .groupBy($"w_user")
      .agg(count($"event_id").as("n_events"),
        countDistinct($"user_id").as("n_users"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_range_join" -> (qRangeJoin _),
    "q_range_physical" -> (qRangePhysical _),
    "q_interval_overlap" -> (qIntervalOverlap _),
    "q_range_anti" -> (qRangeAnti _),
    "q_range_full" -> (qRangeFull _)
  )

  /** One SQL for both formulations: the physical exec is an execution
    * detail that must be result-invariant. */
  private val rangeSql =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
      |w AS (SELECT user_id AS w_user, MIN(ts_us) AS w_start,
      |  MIN(ts_us) + 3600000000 AS w_end
      |  FROM e WHERE user_id < 10 GROUP BY 1)
      |SELECT w_user, COUNT(*) AS n_events_in_window,
      |COUNT(DISTINCT user_id) AS n_users_in_window
      |FROM e JOIN w ON e.ts_us >= w.w_start AND e.ts_us <= w.w_end
      |GROUP BY w_user""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_range_physical" -> rangeSql,
    "q_range_join" -> rangeSql,
    "q_range_anti" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |w AS (SELECT user_id AS w_user, MIN(epoch_us(ts)) AS w_start,
        |  MIN(epoch_us(ts)) + 3600000000 AS w_end
        |  FROM events WHERE user_id < 10 GROUP BY 1)
        |SELECT event_type, COUNT(*) AS n_outside FROM e
        |WHERE NOT EXISTS (SELECT 1 FROM w
        |  WHERE e.ts_us >= w.w_start AND e.ts_us <= w.w_end)
        |GROUP BY event_type""".stripMargin,
    "q_range_full" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |  FROM events),
        |w AS (SELECT user_id AS w_user, MIN(ts_us) AS w_start,
        |  MIN(ts_us) + 3600000000 AS w_end
        |  FROM e WHERE user_id < 10 GROUP BY 1
        |  UNION ALL
        |  SELECT 1000 + k, (SELECT MAX(ts_us) FROM e) + (k+1) * 3600000000,
        |    (SELECT MAX(ts_us) FROM e) + (k+1) * 3600000000 + 1800000000
        |  FROM (SELECT unnest([0,1,2,3,4]) AS k))
        |SELECT w_user, COUNT(event_id) AS n_events,
        |COUNT(DISTINCT user_id) AS n_users
        |FROM e FULL JOIN w ON e.ts_us >= w.w_start AND e.ts_us <= w.w_end
        |GROUP BY w_user""".stripMargin,
    "q_interval_overlap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |w AS (SELECT user_id AS w_user, MIN(ts_us) AS w_start,
        |  MIN(ts_us) + 3600000000 AS w_end
        |  FROM e WHERE user_id < 50 GROUP BY 1),
        |p AS (SELECT a.w_user AS u, COUNT(*) AS n
        |  FROM w a JOIN w b
        |  ON a.w_start <= b.w_end AND a.w_end >= b.w_start
        |    AND a.w_user <> b.w_user
        |  GROUP BY 1)
        |SELECT w.w_user, COALESCE(p.n, 0) AS n_overlapping
        |FROM w LEFT JOIN p ON w.w_user = p.u""".stripMargin
  )
}
