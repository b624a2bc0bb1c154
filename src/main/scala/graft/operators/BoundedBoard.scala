package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helper for window functions over BOUNDED boards (O(days)/O(buckets)/
  * ≤k-row post-limit frames) where a single-partition window is the
  * intended, scale-safe plan.
  *
  * A bare `Window.orderBy(...)` (empty partition spec) is semantically
  * right but logs `WindowExec: No Partition Defined` — noise that buries
  * the one case where that warning matters: an UNBOUNDED frame
  * accidentally sorted on one partition. A naive `partitionBy(lit(0))`
  * does not help: Catalyst's FoldablePropagation strips foldable
  * partition expressions, leaving the spec empty again.
  */
object BoundedBoard {

  /** A constant-zero partition key the optimizer cannot fold away:
    * `pmod(hash(anchor), 1)` references a real column (so it is never
    * constant-folded — simpler spellings like `x * 0` DO fold once the
    * anchor is provably non-nullable, and EliminateWindowPartitions then
    * strips the foldable key) yet evaluates to 0 for EVERY row, null
    * anchors included (`hash(null)` is the seed, not null). Partitioning
    * a window by it sends all rows to one hash bucket — identical
    * semantics to the unpartitioned window, with a defined partition
    * spec, so the WindowExec warning census stays a usable scale-smell
    * detector. Only for frames documented bounded (boards, post-limit
    * top-k). */
  def pinnedZero(anchor: Column): Column = pmod(hash(anchor), lit(1))
}
