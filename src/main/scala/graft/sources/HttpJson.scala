package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Driver-side HTTP JSON source (SURVEY.md §2.1 S1–S4, E1).
  *
  * Spark has no built-in HTTP source; for a once-a-day O(10²)-record API
  * fetch a driver-side GET is the right tool (a DataSource V2 TableProvider
  * would add complexity with zero scale benefit — the payload is one HTTP
  * response). The fetched body lands in a DataFrame via the declared schema,
  * never via inference, so missing keys stay typed nulls.
  *
  * Retry policy mirrors the reference (3 retries, fixed delay — reference
  * dags/etl.py:43-44); the fallback mirrors the try/except static-substitute
  * pattern (reference dags/exampledag.py:49-70). Both take the fetch as a
  * function so tests inject failures without a network.
  */
object HttpJson {

  /** GET a URL body (real network path; unused in offline tests). */
  def fetchUrl(url: String, timeout: Duration = Duration.ofSeconds(30)): String = {
    val client = HttpClient.newBuilder().connectTimeout(timeout).build()
    val req = HttpRequest.newBuilder(URI.create(url)).GET().timeout(timeout).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"HTTP ${resp.statusCode()} from $url")
    resp.body()
  }

  /** Retry with fixed delay (reference: retries=3, retry_delay=5min). */
  def fetchWithRetry(fetch: () => String, retries: Int = 3,
                     delayMs: Long = 1000L): Try[String] = {
    var last: Try[String] = Try(fetch())
    var attempt = 0
    while (last.isFailure && attempt < retries) {
      Thread.sleep(delayMs)
      attempt += 1
      last = Try(fetch())
    }
    last
  }

  /** Fetch → DataFrame with declared schema; on total failure use the
    * static fallback rows (E1 pattern). Returns the frame plus whether the
    * live fetch succeeded (for logging/lineage). */
  def readWithFallback(spark: SparkSession, schema: StructType,
                       fetch: () => String, fallbackBody: String,
                       retries: Int = 3, delayMs: Long = 1000L): (DataFrame, Boolean) = {
    import spark.implicits._
    fetchWithRetry(fetch, retries, delayMs) match {
      case Success(body) =>
        (spark.read.schema(schema).json(spark.createDataset(Seq(body))), true)
      case Failure(_) =>
        (spark.read.schema(schema).json(spark.createDataset(Seq(fallbackBody))), false)
    }
  }
}
