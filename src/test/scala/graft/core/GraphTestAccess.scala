package graft.core

/** Test-only bridge: specs outside graft.core (the churn fixture in
 *  FilteredSearchSpec) need VamanaIndex.load to craft a severed graph. */
object GraphTestAccess {
  def load(ix: VamanaIndex, n: Int, vectors: Array[Float],
      adjacency: Array[Array[Int]], eps: Array[Int]): Unit =
    ix.load(n, java.util.Arrays.copyOf(vectors, n * ix.dim), adjacency, eps)
}
