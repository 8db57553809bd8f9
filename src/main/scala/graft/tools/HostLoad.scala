package graft.tools

/**
 * /proc/stat sampler: fraction of CPU time busy and stolen between two
 * samples, recorded per scale-smoke op so growth ratios across octaves are
 * separable from noisy-neighbor load by artifact (the round-12 1000×
 * spread — 748–1096 s with ~11% steal observed — was adjudicated by prose;
 * this makes it a field). Whole-host counters: on a shared box they include
 * other tenants, which is exactly the signal wanted.
 */
object HostLoad {
  final case class Sample(total: Long, idle: Long, steal: Long)

  def sample(): Sample = try {
    val src = scala.io.Source.fromFile("/proc/stat")
    try {
      // "cpu  user nice system idle iowait irq softirq steal guest gnice"
      // guest/guest_nice (fields 8-9) are ALREADY folded into user/nice by
      // the kernel — summing them double-counts VM time and deflates the
      // busy/steal fractions on virtualized hosts; total = first 8 fields
      val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
      val idle = f(3) + (if (f.length > 4) f(4) else 0L)
      val steal = if (f.length > 7) f(7) else 0L
      Sample(f.take(8).sum, idle, steal)
    } finally src.close()
  } catch { case _: Throwable => Sample(0L, 0L, 0L) }

  /** (busy_frac, steal_frac) over [a, b]; (-1, -1) when unreadable. */
  def frac(a: Sample, b: Sample): (Double, Double) = {
    val dt = (b.total - a.total).toDouble
    if (dt <= 0) (-1.0, -1.0)
    else (1.0 - (b.idle - a.idle) / dt, (b.steal - a.steal) / dt)
  }
}
