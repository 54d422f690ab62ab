package graft.api

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{DoubleAdder, LongAdder}
import scala.jdk.CollectionConverters._

/** Minimal Prometheus-text-format metrics registry: request counts,
  * latency histogram and response-size sums per route pattern — the
  * reference's PrometheusMiddleware (`api_request_duration_seconds`,
  * `api_response_size_bytes`; /root/reference/pkg/api/prometheus.go,
  * router.go:18-28). Served from GET /metrics on the API port (the
  * reference uses a separate :2112 listener — same exposition format,
  * one fewer socket; documented deviation). */
final class Metrics {
  private val latencyBuckets = Array(0.005, 0.025, 0.1, 0.25, 0.5, 1, 2.5, 5, 10)

  private final class RouteStats {
    val count = new LongAdder
    val durationSum = new DoubleAdder
    val bucketCounts = Array.fill(latencyBuckets.length)(new LongAdder)
    val responseBytes = new LongAdder
  }

  // (route, method, status) -> stats
  private val stats = new ConcurrentHashMap[(String, String, Int), RouteStats]()

  def observe(route: String, method: String, status: Int,
              durationSeconds: Double, responseBytes: Long): Unit = {
    val s = stats.computeIfAbsent((route, method, status), _ => new RouteStats)
    s.count.increment()
    s.durationSum.add(durationSeconds)
    var i = 0
    while (i < latencyBuckets.length) {
      if (durationSeconds <= latencyBuckets(i)) s.bucketCounts(i).increment()
      i += 1
    }
    s.responseBytes.add(responseBytes)
  }

  /** Prometheus text exposition. */
  def render: String = {
    val sb = new StringBuilder
    sb.append("# TYPE graft_api_requests_total counter\n")
    sb.append("# TYPE graft_api_request_duration_seconds histogram\n")
    sb.append("# TYPE graft_api_response_size_bytes_total counter\n")
    stats.asScala.toSeq.sortBy { case ((r, m, c), _) => (r, m, c) }.foreach {
      case ((route, method, status), s) =>
        val base = s"""route="$route",method="$method",status="$status""""
        sb.append(s"graft_api_requests_total{$base} ${s.count.sum}\n")
        var i = 0
        while (i < latencyBuckets.length) {
          sb.append(s"""graft_api_request_duration_seconds_bucket{$base,le="${latencyBuckets(i)}"} ${s.bucketCounts(i).sum}""").append('\n')
          i += 1
        }
        sb.append(s"""graft_api_request_duration_seconds_bucket{$base,le="+Inf"} ${s.count.sum}""").append('\n')
        sb.append(s"graft_api_request_duration_seconds_sum{$base} ${s.durationSum.sum}\n")
        sb.append(s"graft_api_request_duration_seconds_count{$base} ${s.count.sum}\n")
        sb.append(s"graft_api_response_size_bytes_total{$base} ${s.responseBytes.sum}\n")
    }
    sb.result()
  }
}
