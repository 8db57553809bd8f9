package graft.index

import java.io.File
import java.util.concurrent.ConcurrentHashMap
import graft.core.{GraphIndex, DiskannFormat, DiskannMmapIndex, HnswFormat}

/** A loaded shard: the graph plus its label→external-id mapping. */
final case class LoadedShard(index: GraphIndex, ids: Array[Long])

/**
 * Executor-JVM-wide cache of loaded shards, keyed by path+mtime+size.
 * The reference mmaps `.diskann` files once per process
 * (rust_lib/src/disk_provider.rs:182-279); on the JVM we cache the decoded
 * in-memory graph so repeated queries against the same index (the dominant
 * serving pattern) skip deserialization. Entries are soft-referenced so the
 * executor can shed them under memory pressure instead of OOMing.
 */
object ShardCache {
  private val cache = new ConcurrentHashMap[String, java.lang.ref.SoftReference[LoadedShard]]()

  /** Shards at or above this size serve disk-resident via mmap
   *  (DiskannMmapIndex) instead of decoding into heap — the reference's
   *  DiskProvider behavior (rust_lib/src/disk_provider.rs:182-279). Small
   *  shards still decode: heap search has no page-fault jitter and the
   *  footprint is trivial. Override with -Dgraft.ann.mmapThreshold=<bytes>
   *  (0 = always mmap). */
  def mmapThreshold: Long =
    sys.props.get("graft.ann.mmapThreshold").map(_.toLong).getOrElse(64L << 20)

  def get(diskannPath: String, idsPath: String, cosine: Boolean): LoadedShard = {
    val f = new File(diskannPath)
    val key = s"$diskannPath:${f.lastModified}:${f.length}:$cosine"
    val ref = cache.get(key)
    val hit = if (ref != null) ref.get() else null
    if (hit != null) hit
    else {
      val graph: GraphIndex =
        if (diskannPath.endsWith(".hnsw")) HnswFormat.readFile(diskannPath)
        else if (f.length() >= mmapThreshold) {
          // SQ8 shards serve quantized from the mapped appendix; null only
          // on a malformed appendix — the heap reader then raises the
          // descriptive parse error
          val mapped = DiskannMmapIndex.open(diskannPath, cosineMetadata = cosine)
          if (mapped != null) mapped
          else DiskannFormat.readFile(diskannPath, cosineMetadata = cosine)
        }
        else DiskannFormat.readFile(diskannPath, cosineMetadata = cosine)
      val loaded = LoadedShard(graph, IndexCatalog.readIds(idsPath))
      cache.put(key, new java.lang.ref.SoftReference(loaded))
      loaded
    }
  }

  def invalidate(): Unit = cache.clear()
}
