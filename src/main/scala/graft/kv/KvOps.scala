package graft.kv

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed-table operators — the Spark re-expression of the reference's
  * `ITable`/`HashTable` surface (SURVEY.md §2 O1–O11).
  *
  * The reference's open-addressing hash table with linear probing
  * (`/root/reference/src/cuda/hashTable.cuh:36-252`) is pure "HOW": on Spark,
  * per-key ownership is what a hash shuffle gives you for free, so every op
  * below is a declarative plan. All ops are batch-oriented (no driver-side
  * loops), so they distribute unchanged to a 1000-executor cluster:
  *
  *  - point lookup (O1–O3)   → pushed-down key predicate on the scan
  *  - batched lookup (O14's probe shape) → equi-join, broadcast when the probe
  *    side is small
  *  - upsert (O4/O5)         → union + last-writer-wins per key (one shuffle)
  *  - delete (O9, completing the reference's empty stub
  *    `hashTable.cuh:112-114`) → left-anti join
  *  - rehash (O6)            → `repartition(n, key)` — Spark's exchange IS the
  *    rehash, so there is no operator to write
  *  - count/scan (O7/O8)     → `count`/`select`
  */
object KvOps {

  /** O1/O2: point lookup. The key predicate is pushed into the Parquet scan
    * (row-group pruning via min/max statistics at scale).
    */
  def pointLookup(table: DataFrame, keyCol: String, key: Long): DataFrame =
    table.filter(col(keyCol) === key)

  /** O14 probe shape: batched lookup as an equi-join. Broadcast the probe set
    * when small (the common case: a txn batch's keys vs a 100 TB table).
    * Inner join = the reference's "missing key ⇒ skipped" semantics
    * (`TrancM_func.cuh:32-34`).
    */
  def batchLookup(table: DataFrame, keys: DataFrame, keyCol: String,
      broadcastKeys: Boolean = true): DataFrame = {
    val k = if (broadcastKeys) broadcast(keys) else keys
    table.join(k, Seq(keyCol), "inner")
  }

  /** O4/O5: batch upsert, last-writer-wins per key. `updates` rows replace
    * existing rows with the same key; new keys are inserted. One shuffle on
    * the key; no driver-side state. At 100 TB this is the standard
    * copy-on-write merge shape (the same plan a MERGE INTO lowers to).
    * Contract: `updates` must be key-unique (dedupe upstream — e.g. the
    * Aria winners aggregation — otherwise the surviving duplicate is
    * arbitrary).
    */
  def upsert(table: DataFrame, updates: DataFrame, keyCol: String): DataFrame = {
    val tagged = table.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    // max_by picks the updates-side row when both exist for a key.
    val valueCols = tagged.columns.filter(c => c != keyCol && c != "__src")
    tagged.groupBy(col(keyCol))
      .agg(max_by(struct(valueCols.map(col).toIndexedSeq: _*), col("__src"))
        .as("__v"))
      .select((col(keyCol) +: valueCols.map(c => col(s"__v.$c").as(c)))
        .toIndexedSeq: _*)
  }

  /** O9: batch delete = left-anti join (completes the reference's stub). */
  def delete(table: DataFrame, keys: DataFrame, keyCol: String): DataFrame =
    table.join(broadcast(keys), Seq(keyCol), "left_anti")

  /** O7/O8: full scan projection + size. */
  def scanKeys(table: DataFrame, keyCol: String): DataFrame =
    table.select(col(keyCol)).orderBy(col(keyCol))
}
