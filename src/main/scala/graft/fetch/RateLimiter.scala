package graft.fetch

/** Token-bucket rate limiter, the per-task half of the reference's global
  * "batches of rate_limit + sleep(1 - elapsed)" loop
  * (`client.py:257,266-277`). Steady-state throughput ≤ `ratePerSec`;
  * burst capacity 1 second's worth of tokens (matching the reference's
  * 1-second batch window).
  */
final class RateLimiter(ratePerSec: Double) {
  require(ratePerSec > 0, "rate must be positive")
  private val capacity: Double = math.max(ratePerSec, 1.0)
  private var tokens: Double = capacity
  private var lastNs: Long = System.nanoTime()

  /** Block until a token is available, then consume it. */
  def acquire(): Unit = synchronized {
    refill()
    while (tokens < 1.0) {
      val needed = (1.0 - tokens) / ratePerSec
      Thread.sleep(math.max((needed * 1000).toLong, 1L))
      refill()
    }
    tokens -= 1.0
  }

  private def refill(): Unit = {
    val now = System.nanoTime()
    tokens = math.min(capacity, tokens + (now - lastNs) / 1e9 * ratePerSec)
    lastNs = now
  }
}
