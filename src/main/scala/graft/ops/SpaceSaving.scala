package graft.ops

import scala.collection.mutable

/** SpaceSaving heavy-hitters summary (Metwally, Agrawal & El Abbadi,
  * "Efficient Computation of Frequent and Top-k Elements in Data
  * Streams", ICDT 2005): a capacity-m counter table where an unseen
  * item evicts the MINIMUM counter and inherits its value as error.
  * Guarantees, per summary over its own stream:
  *
  *   - est(t) ≥ true(t)                 (counts only over-estimate)
  *   - est(t) − err(t) ≤ true(t)        (the inherited part is bounded)
  *   - absent t  ⇒  true(t) ≤ floor     (the current minimum counter)
  *
  * Merged across partitions those become Σ-bounds: lb(t) = Σ present
  * (est−err) ≤ true(t) ≤ Σ (present ? est : floor_p) = ub(t) — the
  * contract d62 asserts against exact counts.
  */
object SpaceSaving {

  /** Summarize one partition's stream. Returns the surviving
    * (item, est, err) triples and the eviction floor (0 while the
    * table never filled — then absent genuinely means count 0). */
  def summarize(items: Iterator[String], capacity: Int): (Seq[(String, Long, Long)], Long) = {
    require(capacity > 0, "capacity must be positive")
    val table = mutable.HashMap.empty[String, (Long, Long)] // item -> (est, err)
    items.foreach { it =>
      table.get(it) match {
        case Some((c, e)) => table.update(it, (c + 1, e))
        case None if table.size < capacity => table.update(it, (1L, 0L))
        case None =>
          // evict the minimum counter (item ties break lexicographically
          // for determinism); the newcomer inherits its count as error
          val (minItem, (minC, _)) =
            table.minBy { case (k, (c, _)) => (c, k) }
          table.remove(minItem)
          table.update(it, (minC + 1, minC))
      }
    }
    val floor = if (table.size < capacity) 0L else table.values.map(_._1).min
    (table.iterator.map { case (k, (c, e)) => (k, c, e) }.toSeq, floor)
  }
}
