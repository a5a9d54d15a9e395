package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

private[graft] object ExprUtil {

  /** THE engine's 60-bit md5 hash law — first 15 hex digits of md5 as
    * a BIGINT — in exactly ONE Scala rendering (r17 review closure:
    * the law had grown five hand-copied renderings; a tweak to one
    * would silently fork the persisted sparse index's term hashes
    * from the q80/q83/q85 gates). The DuckDB rendering lives once in
    * [[Dedup.tokenHashCte]]; this is its Spark twin. The 52-bit
    * (13-hex-digit) sampling-axis law is a DIFFERENT law and keeps
    * its own sites.
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Evaluate `arr` exactly ONCE per row and reuse the result inside `f`.
    *
    * Why: when an array expression is referenced inside a higher-order
    * lambda (e.g. `transform(sequence(...), i => slice(arr, i, n))`),
    * Catalyst inlines the whole subtree into the lambda body and
    * re-evaluates it for EVERY element — turning O(n) shingling into
    * O(n^2) re-tokenization (measured 9x-30x on the dedup family).
    * Wrapping the value in a single-element array and binding it to a
    * lambda variable forces one evaluation; lambda-variable reads are
    * just slot lookups.
    */
  def bound(arr: Column)(f: Column => Column): Column =
    element_at(transform(array(arr), v => f(v)), 1)
}
