package graft.core

/**
 * Minimal open-addressing int hash set (linear probing, power-of-two
 * capacity) for the graph searchers' visited sets. Replaces
 * `java.util.HashSet[Integer]` whose per-node boxing dominated build/search
 * profiles. Not thread-safe; one instance per search/build scratch.
 *
 * Stores ids >= 0 only (graph labels); EMPTY = -1 sentinel.
 */
final class IntSet(initialCapacity: Int = 1024) {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) - 1) << 1
  private var mask = cap - 1
  private var table = {
    val t = new Array[Int](cap)
    java.util.Arrays.fill(t, -1)
    t
  }
  private var used = 0

  /** Adds x; returns true when x was not present. */
  def add(x: Int): Boolean = {
    val h = x * 0x9E3779B1
    var i = (h ^ (h >>> 16)) & mask
    while (true) {
      val v = table(i)
      if (v == x) return false
      if (v == -1) {
        table(i) = x
        used += 1
        if (used * 10 >= cap * 7) grow()
        return true
      }
      i = (i + 1) & mask
    }
    false
  }

  def clear(): Unit = {
    java.util.Arrays.fill(table, -1)
    used = 0
  }

  def size: Int = used

  private def grow(): Unit = {
    val old = table
    cap <<= 1
    mask = cap - 1
    table = new Array[Int](cap)
    java.util.Arrays.fill(table, -1)
    used = 0
    var i = 0
    while (i < old.length) {
      if (old(i) != -1) add(old(i))
      i += 1
    }
  }
}
