package graft.core;

import java.nio.ByteBuffer;
import java.nio.ByteOrder;

import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * SIMD distance kernels over {@code float[]} via {@code jdk.incubator.vector}
 * — the JVM replacement for the reference engine's AVX2/NEON kernels
 * (rust_lib/src/distance.rs:1-25) and its GPU batch-distance backend.
 *
 * Offset variants operate directly on the flat shard storage
 * ({@code vecs[node*dim ..]}) so the beam search never copies a vector to
 * compute a distance. Requires {@code --add-modules=jdk.incubator.vector} at
 * runtime; {@link graft.core.Simd} probes availability and falls back to
 * scalar loops, so the module flag is an optimization, not a requirement.
 *
 * NOT used by the SQL-facing double-precision expressions: those keep
 * sequential summation order to stay bit-comparable with the DuckDB oracle
 * (SIMD lane reduction reassociates the sum).
 */
public final class SimdKernels {
  private static final VectorSpecies<Float> SP = FloatVector.SPECIES_PREFERRED;

  private SimdKernels() {}

  /** Dot product of a[ao..ao+len) and b[bo..bo+len). */
  public static float dot(float[] a, int ao, float[] b, int bo, int len) {
    int i = 0;
    FloatVector acc0 = FloatVector.zero(SP);
    FloatVector acc1 = FloatVector.zero(SP);
    int step = SP.length();
    int upper2 = len - 2 * step;
    for (; i <= upper2; i += 2 * step) {
      acc0 = FloatVector.fromArray(SP, a, ao + i).fma(FloatVector.fromArray(SP, b, bo + i), acc0);
      acc1 = FloatVector.fromArray(SP, a, ao + i + step).fma(FloatVector.fromArray(SP, b, bo + i + step), acc1);
    }
    int upper = SP.loopBound(len);
    for (; i < upper; i += step) {
      acc0 = FloatVector.fromArray(SP, a, ao + i).fma(FloatVector.fromArray(SP, b, bo + i), acc0);
    }
    float s = acc0.add(acc1).reduceLanes(VectorOperators.ADD);
    for (; i < len; i++) s += a[ao + i] * b[bo + i];
    return s;
  }

  /** Squared L2 distance of a[ao..ao+len) and b[bo..bo+len). */
  public static float l2Sq(float[] a, int ao, float[] b, int bo, int len) {
    int i = 0;
    FloatVector acc0 = FloatVector.zero(SP);
    FloatVector acc1 = FloatVector.zero(SP);
    int step = SP.length();
    int upper2 = len - 2 * step;
    for (; i <= upper2; i += 2 * step) {
      FloatVector d0 = FloatVector.fromArray(SP, a, ao + i).sub(FloatVector.fromArray(SP, b, bo + i));
      FloatVector d1 = FloatVector.fromArray(SP, a, ao + i + step).sub(FloatVector.fromArray(SP, b, bo + i + step));
      acc0 = d0.fma(d0, acc0);
      acc1 = d1.fma(d1, acc1);
    }
    int upper = SP.loopBound(len);
    for (; i < upper; i += step) {
      FloatVector d = FloatVector.fromArray(SP, a, ao + i).sub(FloatVector.fromArray(SP, b, bo + i));
      acc0 = d.fma(d, acc0);
    }
    float s = acc0.add(acc1).reduceLanes(VectorOperators.ADD);
    for (; i < len; i++) { float d = a[ao + i] - b[bo + i]; s += d * d; }
    return s;
  }

  /** Cosine similarity (raw cosine, higher = closer); 0 when either norm is 0. */
  public static float cosine(float[] a, int ao, float[] b, int bo, int len) {
    int i = 0;
    FloatVector accAb = FloatVector.zero(SP);
    FloatVector accAa = FloatVector.zero(SP);
    FloatVector accBb = FloatVector.zero(SP);
    int step = SP.length();
    int upper = SP.loopBound(len);
    for (; i < upper; i += step) {
      FloatVector va = FloatVector.fromArray(SP, a, ao + i);
      FloatVector vb = FloatVector.fromArray(SP, b, bo + i);
      accAb = va.fma(vb, accAb);
      accAa = va.fma(va, accAa);
      accBb = vb.fma(vb, accBb);
    }
    float ab = accAb.reduceLanes(VectorOperators.ADD);
    float aa = accAa.reduceLanes(VectorOperators.ADD);
    float bb = accBb.reduceLanes(VectorOperators.ADD);
    for (; i < len; i++) {
      ab += a[ao + i] * b[bo + i];
      aa += a[ao + i] * a[ao + i];
      bb += b[bo + i] * b[bo + i];
    }
    double den = Math.sqrt(aa) * Math.sqrt(bb);
    return den == 0.0 ? 0.0f : (float) (ab / den);
  }

  // ---- gemm-shaped batch kernels: one call computes a whole hop's worth of
  // candidate distances over a contiguous gathered block (the CPU analog of
  // the reference's lock-step batch distance dispatch,
  // rust_lib/src/provider.rs:386-421 + metal_multi_batch_distances). Each
  // row i of `block` (n rows x dim floats) is scored against the query
  // `qmap[i]` inside `queriesFlat` (nq rows x dim floats). Per-row math is
  // the SAME kernel as the single-pair calls, so batch and per-pair searches
  // return bit-identical distances.

  /** out[i] = l2Sq(block row i, queriesFlat row qmap[i]) for i in [0, n). */
  public static void l2SqBatch(float[] block, float[] queriesFlat, int[] qmap,
      int n, int dim, float[] out) {
    for (int i = 0; i < n; i++) {
      out[i] = l2Sq(block, i * dim, queriesFlat, qmap[i] * dim, dim);
    }
  }

  /** out[i] = -dot(block row i, queriesFlat row qmap[i]) — negated inner
   *  product, matching the engine's IP/cosine distance convention. */
  public static void negDotBatch(float[] block, float[] queriesFlat, int[] qmap,
      int n, int dim, float[] out) {
    for (int i = 0; i < n; i++) {
      out[i] = -dot(block, i * dim, queriesFlat, qmap[i] * dim, dim);
    }
  }

  // ---- zero-copy variants over a mapped ByteBuffer (mmap shard serving,
  // the analog of rust_lib/src/disk_provider.rs reading distances straight
  // from the mapped image). Absolute reads only: thread-safe on a shared
  // buffer. The buffer must be little-endian-backed (.diskann layout).

  /**
   * Squared L2 between buf[byteOff..) (dim floats LE) and q. The loop
   * structure (2×-unrolled dual accumulators) EXACTLY mirrors
   * {@link #l2Sq(float[],int,float[],int,int)} so mmap-served and
   * heap-decoded shards produce bit-identical distances.
   */
  public static float l2SqBB(ByteBuffer buf, int byteOff, float[] q) {
    int len = q.length;
    int i = 0;
    FloatVector acc0 = FloatVector.zero(SP);
    FloatVector acc1 = FloatVector.zero(SP);
    int step = SP.length();
    int upper2 = len - 2 * step;
    for (; i <= upper2; i += 2 * step) {
      FloatVector d0 = FloatVector.fromByteBuffer(SP, buf, byteOff + i * 4, ByteOrder.LITTLE_ENDIAN)
          .sub(FloatVector.fromArray(SP, q, i));
      FloatVector d1 = FloatVector.fromByteBuffer(SP, buf, byteOff + (i + step) * 4, ByteOrder.LITTLE_ENDIAN)
          .sub(FloatVector.fromArray(SP, q, i + step));
      acc0 = d0.fma(d0, acc0);
      acc1 = d1.fma(d1, acc1);
    }
    int upper = SP.loopBound(len);
    for (; i < upper; i += step) {
      FloatVector d = FloatVector.fromByteBuffer(SP, buf, byteOff + i * 4, ByteOrder.LITTLE_ENDIAN)
          .sub(FloatVector.fromArray(SP, q, i));
      acc0 = d.fma(d, acc0);
    }
    float s = acc0.add(acc1).reduceLanes(VectorOperators.ADD);
    for (; i < len; i++) { float d = buf.getFloat(byteOff + i * 4) - q[i]; s += d * d; }
    return s;
  }

  /** Dot product between buf[byteOff..) (dim floats LE) and q — loop
   *  structure mirrors {@link #dot(float[],int,float[],int,int)} for
   *  bit-identical results across serving modes. */
  public static float dotBB(ByteBuffer buf, int byteOff, float[] q) {
    int len = q.length;
    int i = 0;
    FloatVector acc0 = FloatVector.zero(SP);
    FloatVector acc1 = FloatVector.zero(SP);
    int step = SP.length();
    int upper2 = len - 2 * step;
    for (; i <= upper2; i += 2 * step) {
      acc0 = FloatVector.fromByteBuffer(SP, buf, byteOff + i * 4, ByteOrder.LITTLE_ENDIAN)
          .fma(FloatVector.fromArray(SP, q, i), acc0);
      acc1 = FloatVector.fromByteBuffer(SP, buf, byteOff + (i + step) * 4, ByteOrder.LITTLE_ENDIAN)
          .fma(FloatVector.fromArray(SP, q, i + step), acc1);
    }
    int upper = SP.loopBound(len);
    for (; i < upper; i += step) {
      acc0 = FloatVector.fromByteBuffer(SP, buf, byteOff + i * 4, ByteOrder.LITTLE_ENDIAN)
          .fma(FloatVector.fromArray(SP, q, i), acc0);
    }
    float s = acc0.add(acc1).reduceLanes(VectorOperators.ADD);
    for (; i < len; i++) s += buf.getFloat(byteOff + i * 4) * q[i];
    return s;
  }
}
