package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** NULL-canonicalization and priority-pick helpers.
  *
  * These are expression *builders* (`Column => Column`), not UDFs — the
  * produced trees stay inside Catalyst/codegen, which is what keeps them
  * free at 100 TB.
  */
object CleanseOps {

  /** Remap a set of sentinel words to NULL.
    *
    * Semantics of the reference's boolean-fold builder
    * (reference: load_dim_aircrafts.py:137-154 `field_vals_to_nulls`):
    * when the value is one of `nullWords` the result is NULL, otherwise
    * the value unchanged. NULL input stays NULL. Expressed with `isin`
    * (a single codegen'd InSet) instead of an OR-chain — same NULL
    * semantics, better plan.
    */
  def nullifyWords(c: Column, nullWords: Seq[String]): Column =
    when(!c.isin(nullWords: _*), c) // else-branch absent => NULL

  /** Priority pick of the first non-NULL identifier
    * (reference: load_dim_aircrafts.py:176-179).
    */
  def firstNonNull(cols: Column*): Column = coalesce(cols: _*)

  /** Fallback when a lookup failed: if `lookupKey` is NULL after a left
    * join, use `fallback`, else `joined`
    * (reference: load_dim_aircrafts.py:103-107).
    */
  def lookupOrFallback(lookupKey: Column, joined: Column, fallback: Column): Column =
    when(lookupKey.isNull, fallback).otherwise(joined)
}
