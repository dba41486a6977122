package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The incremental-idempotency primitive of the reference pipeline.
  *
  * Every append first diffs the candidate batch against what the target
  * partition already holds (reference: extract_flights.py:87;
  * load_dim_dates.py:35; load_fct_flights.py:105), so re-running a day
  * appends zero rows. `Dataset.except` is EXCEPT DISTINCT and resolves
  * columns POSITIONALLY — the reference reorders columns by hand before
  * every subtract (reference: load_fct_flights.py:92-100). We centralize
  * that here so column order can never silently drift.
  */
object IncrementalOps {

  /** `batch EXCEPT DISTINCT alreadyLoaded`, with both sides first
    * normalized to `alreadyLoaded`'s column order (by NAME, then applied
    * positionally — the safe rendition of the reference's manual reorder).
    *
    * NOTE (EXCEPT DISTINCT): duplicate rows inside `batch` are collapsed
    * by this path; they survive only on a first-ever write that skips the
    * diff (reference: extract_flights.py:87-92). Tests cover both branches.
    */
  def exceptNew(batch: DataFrame, alreadyLoaded: DataFrame): DataFrame = {
    val ordered = alreadyLoaded.columns.map(col).toSeq
    batch.select(ordered: _*).except(alreadyLoaded.select(ordered: _*))
  }

  /** True when the two frames hold the same row multiset — the *fixed*
    * rendition of the reference's dead object-identity comparison
    * (reference: load_dim_aircrafts.py:126, load_dim_airports.py:54,
    * always-false `==` on DataFrame objects). Used to skip dim rewrites.
    */
  def sameContent(a: DataFrame, b: DataFrame): Boolean = {
    val ordered = a.columns.sorted.map(col).toSeq
    val x = a.select(ordered: _*)
    val y = b.select(ordered: _*)
    // exceptAll both ways = multiset equality without a full sort
    x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty
  }

  /** Incremental aggregate maintenance: merge an existing aggregate
    * with a delta aggregate over the same keys by re-summing the
    * mergeable measure columns. For sums/counts (and any commutative
    * monoid) this equals the from-scratch aggregate over the combined
    * input — the property that lets a daily rollup absorb one day's
    * partial instead of rescanning the full history at every load.
    * The merge input is two aggregate relations (keys-cardinality
    * rows), so the shuffle is tiny regardless of fact size.
    */
  def mergeAggregates(existing: DataFrame, delta: DataFrame,
                      keys: Seq[String], measures: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.sum
    val aggs = measures.map(m => sum(col(m)).as(m))
    existing.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** MERGE-INTO upsert semantics as one full-outer join: rows of
    * `updates` replace same-key rows of `target` (WHEN MATCHED THEN
    * UPDATE), new keys insert (WHEN NOT MATCHED THEN INSERT),
    * untouched target rows pass through. The presence MARKER — not
    * value non-nullness — decides who wins, so an update row carrying
    * a legitimate NULL attribute still replaces the target row (the
    * classic coalesce-based upsert bug). Schemas must match by name;
    * `updates` must be key-unique (enforced — a duplicate-key update
    * relation makes MERGE ambiguous, and Spark would emit both rows).
    * One shuffle on the key; at warehouse scale the target side is the
    * big one, so AQE broadcast-ises the update side when small.
    */
  def upsert(target: DataFrame, updates: DataFrame,
             keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{lit, when}
    // compare (name, type) pairs, not names alone: a type drift (e.g.
    // updates carrying a measure as string) must fail HERE with a clear
    // message, not later as a confusing when/otherwise coercion or an
    // analysis error far from the call site
    def sig(df: DataFrame) =
      df.schema.fields.map(f => f.name -> f.dataType).sortBy(_._1).toSeq
    require(sig(target) == sig(updates),
      s"upsert schemas differ: target ${sig(target).mkString(",")} " +
        s"vs updates ${sig(updates).mkString(",")}")
    // one aggregation over the (small) update side — the guard that
    // keeps MERGE deterministic is worth the extra action
    require(updates.groupBy(keys.map(col): _*)
      .count().filter(col("count") > 1).isEmpty,
      s"updates not unique on (${keys.mkString(", ")}) — MERGE is ambiguous")
    val nonKeys = target.columns.filterNot(keys.contains).toSeq
    val u = nonKeys.foldLeft(updates)((d, c) => d.withColumnRenamed(c, s"__u_$c"))
      .withColumn("__upd", lit(1))
    target.join(u, keys, "full_outer")
      .select(keys.map(col) ++ nonKeys.map(c =>
        when(col("__upd").isNotNull, col(s"__u_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** CDC-style snapshot diff: classify every key as added / removed /
    * changed / unchanged between `current` and `snapshot`. The change
    * test is ONE md5 over the null-sentineled concatenation of the
    * non-key columns — per-row constant work however wide the table,
    * the generic change-data-capture shape (compare digests, not N
    * columns). Output carries the key, `status`, and `old_<c>` /
    * `new_<c>` for every non-key column.
    *
    * Scale shape: a single full-outer equi-join on the key — the one
    * unavoidable shuffle; with both sides bucketed on the key it plans
    * co-located. Presence is tracked by literal marker columns, never
    * by key nullness (a NULL business key must not read as "absent").
    */
  def snapshotDiff(current: DataFrame, snapshot: DataFrame,
                   keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, concat_ws, lit, md5, when}
    def sig(df: DataFrame) =
      df.schema.fields.map(f => f.name -> f.dataType).sortBy(_._1).toSeq
    require(sig(current) == sig(snapshot),
      s"snapshotDiff schemas differ: current ${sig(current).mkString(",")} " +
        s"vs snapshot ${sig(snapshot).mkString(",")}")
    val nonKeys = current.columns.filterNot(keys.contains).toSeq
    def digest(df: DataFrame, pfx: String) =
      df.select(keys.map(col) ++ Seq(
        // control-char separator + null sentinel: without them
        // ("ab","c")/("a","bc") and NULL/"" digest identically
        md5(concat_ws("\u0001", nonKeys.map(c =>
          coalesce(col(c).cast("string"), lit("\u0000"))): _*)).as(s"__${pfx}_h"),
        lit(1).as(s"__${pfx}_present")) ++
        nonKeys.map(c => col(c).as(s"${pfx}_$c")): _*)
    digest(current, "old").join(digest(snapshot, "new"), keys, "full_outer")
      .withColumn("status",
        when(col("__old_present").isNull, lit("added"))
          .when(col("__new_present").isNull, lit("removed"))
          .when(col("__old_h") =!= col("__new_h"), lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("__old_h", "__new_h", "__old_present", "__new_present")
  }

  /** Apply a [[snapshotDiff]] back onto `current`: drop removed keys,
    * upsert added/changed rows from the diff's `new_<c>` columns, pass
    * unchanged rows through untouched. The round-trip law — in spirit
    * `applyDiff(current, snapshotDiff(current, snap)) == snap` — is
    * what makes the diff a usable CHANGE FEED rather than a report: a
    * downstream replica can subscribe to diffs alone and stay exactly
    * in sync (held as a property test over generated snapshots).
    *
    * Scale shape: one left join current⋈diff on the key (the diff
    * carries only changed keys if pre-filtered, so AQE broadcasts it
    * on quiet days) plus a union of the added rows — no extra shuffle
    * beyond the join's.
    */
  def applyDiff(current: DataFrame, diff: DataFrame,
                keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{lit, when}
    val nonKeys = current.columns.filterNot(keys.contains).toSeq
    val changes = diff.filter(col("status") =!= "unchanged")
      .select(keys.map(col) ++ Seq(col("status")) ++
        nonKeys.map(c => col(s"new_$c")): _*)
    val marked = nonKeys.foldLeft(changes)((d, c) =>
      d.withColumnRenamed(s"new_$c", s"__n_$c")).withColumn("__hit", lit(1))
    val survived = current.join(marked, keys, "left")
      .filter(col("__hit").isNull || col("status") =!= "removed")
      .select(keys.map(col) ++ nonKeys.map(c =>
        when(col("__hit").isNotNull, col(s"__n_$c")).otherwise(col(c)).as(c)): _*)
    val added = marked.filter(col("status") === "added")
      .select(keys.map(col) ++ nonKeys.map(c => col(s"__n_$c").as(c)): _*)
    survived.unionByName(added)
  }
}
