package graft.serve

import java.util.concurrent.atomic.{AtomicLong, DoubleAdder}

import scala.collection.concurrent.TrieMap
import scala.collection.immutable.ListMap

/** Process-local operational metrics (reference analog: the Prometheus
  * `rows_synced_total` / `error_rate` counters, `sync_duration_seconds`
  * histogram, and the Instrumentator-exported per-route HTTP request
  * series, readwise_vector_db/api/routes.py:224-247). Counters and timers
  * carry optional Prometheus labels (`handler`, `method`, `status`, ...);
  * exposition is the text format a scraper parses plus a flat JSON
  * snapshot. Executor-side metrics belong in Spark's own metric system;
  * this covers the driver/serving plane. */
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

  private type Key = (String, Seq[(String, String)])
  private val counters = TrieMap.empty[Key, Counter]
  private val timers = TrieMap.empty[Key, Timer]

  def counter(name: String, labels: (String, String)*): Counter =
    counters.getOrElseUpdate((name, labels.sortBy(_._1)), new Counter())
  def timer(name: String, labels: (String, String)*): Timer =
    timers.getOrElseUpdate((name, labels.sortBy(_._1)), new Timer())

  /** `name{k="v",...}` series key (Prometheus line syntax); metric names
    * are code-controlled identifiers, label values get minimal escaping. */
  private def series(name: String, labels: Seq[(String, String)]): String =
    if (labels.isEmpty) name
    else labels.map { case (k, v) =>
      s"""$k="${v.replace("\\", "\\\\").replace("\"", "\\\"")}""""
    }.mkString(s"$name{", ",", "}")

  /** Flat exposition snapshot (labeled series key by their full
    * `name{...}` form). */
  def snapshot: Map[String, Any] = {
    val c = counters.toSeq
      .map { case ((n, l), v) => series(n, l) -> (v.get: Any) }
    val t = timers.toSeq.flatMap { case ((n, l), v) =>
      Seq(series(s"${n}_count", l) -> (v.count.get(): Any),
        series(s"${n}_sum", l) -> (v.sum.sum(): Any),
        series(s"${n}_max", l) ->
          (java.lang.Double.longBitsToDouble(v.max.get()): Any)) }
    ListMap((c ++ t).sortBy(_._1): _*)
  }

  /** Prometheus text exposition (format 0.0.4) — what a scraper pointed at
    * `GET /metrics` parses. One HELP/TYPE header per metric name, one line
    * per label set under it. Counters expose as `counter`; timers as
    * `summary` (`_count`/`_sum`) plus a non-standard `_max` gauge. */
  def prometheusExposition: String = {
    val sb = new StringBuilder
    def num(d: Double): String =
      if (d == d.toLong.toDouble && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    def grouped[T](m: TrieMap[Key, T]): Seq[(String, Seq[(Seq[(String, String)], T)])] =
      m.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (name, es) =>
        name -> es.map { case ((_, l), v) => l -> v }.sortBy(_._1.toString)
      }
    grouped(counters).foreach { case (name, es) =>
      sb.append("# HELP ").append(name).append(' ').append(name).append('\n')
      sb.append("# TYPE ").append(name).append(" counter\n")
      es.foreach { case (l, v) =>
        sb.append(series(name, l)).append(' ').append(v.get).append('\n') }
    }
    grouped(timers).foreach { case (name, es) =>
      sb.append("# HELP ").append(name).append(' ').append(name).append('\n')
      sb.append("# TYPE ").append(name).append(" summary\n")
      es.foreach { case (l, t) =>
        sb.append(series(s"${name}_count", l)).append(' ')
          .append(t.count.get()).append('\n')
        sb.append(series(s"${name}_sum", l)).append(' ')
          .append(num(t.sum.sum())).append('\n')
      }
      sb.append("# HELP ").append(name).append("_max ").append(name).append("_max\n")
      sb.append("# TYPE ").append(name).append("_max gauge\n")
      es.foreach { case (l, t) =>
        sb.append(series(s"${name}_max", l)).append(' ')
          .append(num(java.lang.Double.longBitsToDouble(t.max.get()))).append('\n')
      }
    }
    sb.toString
  }

  /** Test hook. */
  private[graft] def reset(): Unit = { counters.clear(); timers.clear() }
}
