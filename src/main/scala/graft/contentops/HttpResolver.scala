package graft.contentops

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset}

/** A3 in its production shape: resolve pre-signed-URL payload indirections
  * with a REAL HTTP client (`/root/reference/docs/user-guide.md:17-44` —
  * oversized documents land in S3 and the wire record carries a pre-signed
  * URL; the consumer fetches it, gunzips, and must skip — not crash — on
  * a failed fetch).
  *
  * Client lifecycle is the scale story: `client` is a JVM-wide lazy
  * singleton, so on a 1000-executor cluster each executor JVM opens ONE
  * pooled `java.net.http.HttpClient` (HTTP/1.1 keep-alive + HTTP/2
  * multiplexing) that every task and partition on that executor reuses —
  * connection setup amortizes across the whole executor lifetime instead
  * of being paid per record or even per partition. The resolve itself runs
  * in `mapPartitions` purely so the row loop is a plain iterator over the
  * shared client (no per-row UDF serialization), mirroring the reference's
  * per-shard consumer loop.
  *
  * Error tolerance (A19): a non-200 status, a connect/read timeout, a DNS
  * failure, or a corrupt (non-gzip) body all resolve to null, and the
  * caller's `filter(raw.isNotNull)` skips the record — the exact
  * log-and-skip contract of the reference loop (user-guide.md:34-39).
  * ContentOpsSpec drives this against an in-JVM HTTP fixture server:
  * 200+gzip, 404, timeout, and corrupt-body paths, proving the output
  * row-identical to the broadcast-map stand-in on the same wire fixture.
  */
object HttpResolver {

  /** One pooled client per JVM (per executor, in cluster terms). Objects
    * are re-initialized on each executor, so this is never serialized. */
  lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(5))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  /** GET `url`; Some(body) on 200, None on any HTTP error status or
    * transport failure (timeout, refused, DNS). Never throws. */
  def fetch(url: String, timeoutMs: Long): Option[Array[Byte]] =
    try {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMs)).GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
      if (resp.statusCode() == 200) Some(resp.body()) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The resolve stage: decoded payload strings `(shard, seq, payload)` →
    * `(shard, seq, raw)` where `raw` is the envelope JSON — fetched and
    * gunzipped when the payload is a pre-signed URL (`isUrl`, the
    * reference's `payload[0:5] == 'https'` branch), passed through when
    * inline, null (⇒ caller skips) when the fetch or decode fails.
    *
    * `isUrl` is a parameter only so tests can point at a plain-http
    * in-JVM fixture server; production uses the default per the spec. */
  def resolve(
      decoded: Dataset[(Int, String, String)],
      timeoutMs: Long = 10000L,
      isUrl: String => Boolean = _.startsWith("https")): DataFrame = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions { it =>
      it.map { case (shard, seq, p) =>
        val raw =
          if (p == null) null
          else if (isUrl(p))
            try fetch(p, timeoutMs)
              .map(b => new String(Fixture.gunzip(b), UTF_8)).orNull
            catch { case scala.util.control.NonFatal(_) => null } // corrupt body ⇒ skip
          else p
        (shard, seq, raw)
      }
    }.toDF("shard", "seq", "raw")
  }
}
