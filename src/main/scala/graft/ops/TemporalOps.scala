package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators over event streams.
  *
  * The reference engine has no temporal joins; these are part of the
  * beyond-reference training-data-pipeline surface (attribution, feature
  * as-of lookup, point-in-time correctness for label joins).
  */
object TemporalOps {

  /** As-of join: for every left row, attach the single most recent right
    * row with the same key and `rightTs <= leftTs` (ties at equal
    * timestamps match — the "backward, inclusive" convention).
    *
    * Implementation is the scale-native union+window form, NOT a non-equi
    * join: both inputs are tagged and unioned, each key's timeline is
    * sorted once, and the latest right payload is carried forward with
    * `last(_, ignoreNulls)` over an unbounded-preceding frame. Cost: ONE
    * shuffle on the key + a per-partition sort — the same shape as a
    * sort-merge join. The declarative alternative (`l.key = r.key AND
    * r.ts <= l.ts` then `max_by(ts)`) materializes every candidate pair
    * per key before reducing — quadratic in per-key row count, which at
    * 100 TB event scale is the difference between a pass and an explosion.
    *
    * The matched right timestamp is exposed as `__asof_ts` so callers can
    * compute gaps / enforce tolerances.
    *
    * Contract:
    *  - `right` must have at most one row per (keys, rightTs) — pre-reduce
    *    with groupBy(keys, ts).agg(...) otherwise (which of several
    *    equal-timestamp rows wins would be partition-order-dependent);
    *  - `rightPayload` names must not collide with left column names;
    *  - payload columns are carried in ONE struct, so all matched fields
    *    come from the same right row by construction.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      inner: Boolean): DataFrame = {
    val leftExtra = left.columns.toSeq.filterNot(keys.contains)
    val leftTypes = left.schema.map(f => f.name -> f.dataType).toMap

    val payload = struct((rightTs +: rightPayload).map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType

    val lU = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__is_left"),
          lit(null).cast(payloadType).as("__p")) ++
        leftExtra.map(col): _*)
    val rU = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__is_left"),
          payload.as("__p")) ++
        leftExtra.map(c => lit(null).cast(leftTypes(c)).as(c)): _*)

    // rights sort before lefts at equal __ts (is_left asc) so an
    // equal-timestamp right is visible to the left row's frame
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = lU.unionByName(rU)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
    val matched = if (inner) joined.filter(col("__m").isNotNull) else joined
    matched.select(
      keys.map(col) ++ leftExtra.map(col) ++
        Seq(col(s"__m.$rightTs").as("__asof_ts")) ++
        rightPayload.map(p => col(s"__m.$p").as(p)): _*)
  }

  /** Interval join: pair every left interval `[startUs, endUs)` with the
    * right rows sharing its key whose timestamp falls inside it.
    * Timestamps are epoch MICROSECONDS (long columns — cast TIMESTAMP_NTZ
    * via `unix_micros` upstream).
    *
    * The declarative form — `l.key = r.key AND r.ts >= l.start AND r.ts <
    * l.end` — gives Catalyst an equi-join with two residual range
    * predicates, which is fine until one key is hot; worse, with NO key it
    * degenerates to BroadcastNestedLoopJoin. This implementation joins on
    * `(key, time bucket)` instead: each left interval is exploded to the
    * `granularityUs` buckets it overlaps, each right row lands in exactly
    * one bucket, and the exact range predicate filters the equi-join
    * output. Every matching pair appears exactly once (a point's bucket is
    * unique — no dedup pass), the shuffle key gains time-locality (hot
    * entities spread over their active buckets), and the join stays a
    * hash/sort-merge equi-join at any scale.
    *
    * Intervals longer than ~1000 buckets explode accordingly — pick
    * `granularityUs` near the typical interval length (the standard
    * bucketized-range-join tuning knob).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      startUs: String, endUs: String, rightTsUs: String,
      granularityUs: Long): DataFrame = {
    require(granularityUs > 0, "granularity must be positive")
    val lb = left
      // [start, end) overlaps buckets floor(start/G) .. floor((end-1)/G);
      // empty intervals (end <= start) produce an empty sequence and drop
      .withColumn("__bucket", explode(sequence(
        expr(s"$startUs div ${granularityUs}L"),
        expr(s"($endUs - 1L) div ${granularityUs}L"))))
    // right columns renamed r_<name> up front: unambiguous self-join
    // resolution and collision-free output by construction
    val rb = right
      .select(right.columns.map(c => col(c).as(s"r_$c")).toSeq: _*)
      .withColumn("__rbucket", expr(s"r_$rightTsUs div ${granularityUs}L"))
    val rTs = col(s"r_$rightTsUs")
    lb.join(rb,
        keys.map(k => col(k) === col(s"r_$k")).reduce(_ && _) &&
          col("__bucket") === col("__rbucket") &&
          rTs >= col(startUs) && rTs < col(endUs))
      .drop("__bucket", "__rbucket")
      .drop(keys.map(k => s"r_$k"): _*)
  }
}
