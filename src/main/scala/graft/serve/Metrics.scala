package graft.serve

import java.util.concurrent.atomic.{AtomicLong, DoubleAdder}

import scala.collection.concurrent.TrieMap
import scala.collection.immutable.ListMap

/** Process-local operational metrics (reference analog: the Prometheus
  * `rows_synced_total` / `error_rate` counters and `sync_duration_seconds`
  * histogram, readwise_vector_db/api/routes.py:224-247). Exposition is a
  * plain snapshot map — wire to any scraper at the serving edge; executor-
  * side metrics belong in Spark's own metric system, this covers the
  * driver/serving plane. */
object Metrics {

  final class Counter private[Metrics] (v: AtomicLong = new AtomicLong()) {
    def inc(n: Long = 1): Unit = v.addAndGet(n)
    def get: Long = v.get()
  }

  /** Count/sum/max summary — the histogram quantities the reference's
    * gates actually read. */
  final class Timer private[Metrics] () {
    private[Metrics] val count = new AtomicLong()
    private[Metrics] val sum = new DoubleAdder()
    private[Metrics] val max = new AtomicLong() // bits of a double
    def observe(seconds: Double): Unit = {
      count.incrementAndGet()
      sum.add(seconds)
      var done = false
      while (!done) {
        val cur = max.get()
        if (seconds <= java.lang.Double.longBitsToDouble(cur)) done = true
        else done = max.compareAndSet(cur, java.lang.Double.doubleToLongBits(seconds))
      }
    }
    def time[T](f: => T): T = {
      val t0 = System.nanoTime()
      try f finally observe((System.nanoTime() - t0) / 1e9)
    }
  }

  private val counters = TrieMap.empty[String, Counter]
  private val timers = TrieMap.empty[String, Timer]

  def counter(name: String): Counter =
    counters.getOrElseUpdate(name, new Counter())
  def timer(name: String): Timer =
    timers.getOrElseUpdate(name, new Timer())

  /** Flat exposition snapshot. */
  def snapshot: Map[String, Any] = {
    val c = counters.toSeq.sortBy(_._1).map { case (k, v) => k -> v.get }
    val t = timers.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      Seq(s"${k}_count" -> v.count.get(),
        s"${k}_sum" -> v.sum.sum(),
        s"${k}_max" -> java.lang.Double.longBitsToDouble(v.max.get())) }
    ListMap((c ++ t): _*)
  }

  /** Prometheus text exposition (format 0.0.4) — what a scraper pointed at
    * `GET /metrics` parses (reference: `prometheus_client` via
    * Instrumentator, api/routes.py:224-247). Counters expose as `counter`;
    * timers as `summary` (`_count`/`_sum`) plus a non-standard `_max`
    * gauge. Names are code-controlled ASCII identifiers, so no label or
    * help-text escaping is needed. */
  def prometheusExposition: String = {
    val sb = new StringBuilder
    def num(d: Double): String =
      if (d == d.toLong.toDouble && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    counters.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append("# HELP ").append(k).append(' ').append(k).append('\n')
      sb.append("# TYPE ").append(k).append(" counter\n")
      sb.append(k).append(' ').append(v.get).append('\n')
    }
    timers.toSeq.sortBy(_._1).foreach { case (k, t) =>
      sb.append("# HELP ").append(k).append(' ').append(k).append('\n')
      sb.append("# TYPE ").append(k).append(" summary\n")
      sb.append(k).append("_count ").append(t.count.get()).append('\n')
      sb.append(k).append("_sum ").append(num(t.sum.sum())).append('\n')
      sb.append("# HELP ").append(k).append("_max ").append(k).append("_max\n")
      sb.append("# TYPE ").append(k).append("_max gauge\n")
      sb.append(k).append("_max ")
        .append(num(java.lang.Double.longBitsToDouble(t.max.get()))).append('\n')
    }
    sb.toString
  }

  /** Test hook. */
  private[graft] def reset(): Unit = { counters.clear(); timers.clear() }
}
