package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

private[operators] object ExprUtil {

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
