package graft.sources

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets
import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.util.concurrent.{ConcurrentLinkedQueue, Executors}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S1 end-to-end over a REAL HTTP transport: a loopback server speaks
  * the reference's Socrata paging protocol (`src/extract.py:18-31` —
  * `$limit`/`$offset`/`$select`/`$where`, CSV body) and the engine
  * reads it through `option("fetcher", HttpPageFetcher)`. Proves the
  * full pipeline: pushdown → PageRequest → HTTP query params →
  * server-side filtering → CSV parse → InternalRow, plus the O3 retry
  * story against a flaky endpoint (first request per page 500s; the
  * local[4, 2] session's task retry re-issues the idempotent GET).
  */
class HttpPagedSourceSpec extends SparkSpecBase {
  import HttpFeedServer._

  private val TotalRows = 1000L

  private var server: HttpServer = _
  private var port: Int = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    val s = start(TotalRows)
    server = s._1
    port = s._2
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  // monotonicDates=true: the stub serves the generator feed verbatim,
  // so date→offset page pruning is sound here. A real endpoint leaves
  // it unset and pages the full range (tested separately below).
  private def httpRead(pageSize: Int = 100,
      monotonicDates: Boolean = true): DataFrame =
    spark.read.format("graft.sources.PagedProvider")
      .option("totalRows", TotalRows.toString)
      .option("pageSize", pageSize.toString)
      .option("fetcher", "graft.sources.HttpPageFetcher")
      .option("monotonicDates", monotonicDates.toString)
      .option("endpoint", s"http://127.0.0.1:$port/feed")
      .load()

  private def builtinRead(): DataFrame =
    spark.read.format("graft.sources.PagedProvider")
      .option("totalRows", TotalRows.toString)
      .option("pageSize", "100")
      .load()

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("full HTTP read is row-identical to the built-in generator feed") {
    reset()
    assert(canon(httpRead()) == canon(builtinRead()))
    val offsets = requests.toArray(Array.empty[Req]).map(_.offset).sorted
    assert(offsets.toSeq == (0L until TotalRows by 100L).toSeq) // one GET per page
    assert(requests.toArray(Array.empty[Req]).forall(_.limit == 100))
  }

  test("pushed date bounds narrow the page range AND reach the endpoint as $where") {
    reset()
    val cutoff = "2020-01-05 00:00:00"
    val got = httpRead().where(col("date") >= lit(cutoff).cast("timestamp"))
    val want = builtinRead().where(col("date") >= lit(cutoff).cast("timestamp"))
    assert(canon(got) == canon(want))
    val reqs = requests.toArray(Array.empty[Req])
    // 2020-01-05 = day 4, 10 rows/day -> first needed row index is 40:
    // pages below were never requested (pushdown pruned them pre-HTTP)
    assert(reqs.nonEmpty && reqs.map(_.offset).min == 40L)
    assert(reqs.forall(_.where.exists(_.contains("date >= '2020-01-05T00:00:00'"))))
  }

  test("without monotonicDates, date filters page the FULL range (no offset math)") {
    reset()
    val cutoff = "2020-01-05 00:00:00"
    val got = httpRead(monotonicDates = false)
      .where(col("date") >= lit(cutoff).cast("timestamp"))
    val want = builtinRead().where(col("date") >= lit(cutoff).cast("timestamp"))
    assert(canon(got) == canon(want))
    val reqs = requests.toArray(Array.empty[Req])
    // generator offset math must NOT apply to an arbitrary endpoint:
    // all pages requested, $where still forwarded for server pruning
    assert(reqs.map(_.offset).min == 0L)
    assert(reqs.forall(_.where.nonEmpty))
  }

  test("external transport schema is nullable; empty endpoint fields become NULLs") {
    reset()
    nullSaleDollarsEvery = 7
    try {
      val df = httpRead()
      assert(df.schema.forall(_.nullable), "fetcher-backed schema must be nullable")
      val n = df.where(col("sale_dollars").isNull).count()
      assert(n == TotalRows / 7 + (if (TotalRows % 7 > 0) 1 else 0))
      // isNotNull must actually filter (Catalyst would elide it on a
      // nullable=false schema and surface garbage)
      assert(df.where(col("sale_dollars").isNotNull).count() == TotalRows - n)
    } finally nullSaleDollarsEvery = 0
  }

  test("CRLF line endings (real-endpoint framing) parse identically") {
    reset()
    crlf = true
    try assert(canon(httpRead()) == canon(builtinRead()))
    finally crlf = false
  }

  test("pruned columns reach the endpoint as $select") {
    reset()
    val got = httpRead().select("store", "sale_dollars")
    assert(canon(got) == canon(builtinRead().select("store", "sale_dollars")))
    val reqs = requests.toArray(Array.empty[Req])
    assert(reqs.forall(r =>
      r.select.contains("store") && r.select.contains("sale_dollars")
        && !r.select.contains("invoice_line_no")))
  }

  test("flaky endpoint: task retry re-fetches pages, output still exact") {
    reset()
    flaky = true
    try assert(canon(httpRead()) == canon(builtinRead()))
    finally flaky = false
    // every page's first attempt 500'd, so each offset was requested twice
    val byOffset = requests.toArray(Array.empty[Req]).groupBy(_.offset)
    assert(byOffset.values.forall(_.length == 2))
  }

  test("external transport disables closed-form aggregate pushdown") {
    reset()
    val agg = httpRead().groupBy().count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("PagedAggScan"), plan)
    assert(agg.collect().head.getLong(0) == TotalRows) // counted from real rows
    assert(!requests.isEmpty) // the endpoint actually served them
  }
}

/** Loopback Socrata-protocol stub: serves the deterministic generator
  * feed as CSV-with-header, honoring `$limit`/`$offset`/`$select`/
  * `$where date bounds`, recording every request; `flaky` makes the
  * FIRST request per offset return 500 (transient-failure injection).
  */
object HttpFeedServer {
  case class Req(offset: Long, limit: Int, select: Seq[String], where: Option[String])

  val requests = new ConcurrentLinkedQueue[Req]()
  val seenOffsets: java.util.Set[Long] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
  @volatile var flaky = false
  /** >0: every Nth row (by index, 0-based) serves an EMPTY sale_dollars. */
  @volatile var nullSaleDollarsEvery = 0
  /** Serve CRLF line endings (what a real HTTP endpoint emits). */
  @volatile var crlf = false

  def reset(): Unit = {
    requests.clear(); seenOffsets.clear(); flaky = false
    nullSaleDollarsEvery = 0; crlf = false
  }

  private val Iso = DateTimeFormatter.ISO_LOCAL_DATE_TIME

  private def isoOf(micros: Long): String =
    Iso.format(LocalDateTime.ofInstant(
      Instant.ofEpochSecond(micros / 1000000L, micros % 1000000L * 1000L),
      ZoneOffset.UTC))

  private def microsOf(iso: String): Long = {
    val t = LocalDateTime.parse(iso, Iso).toInstant(ZoneOffset.UTC)
    t.getEpochSecond * 1000000L + t.getNano / 1000L
  }

  def start(totalRows: Long): (HttpServer, Int) = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/feed", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val params = Option(ex.getRequestURI.getRawQuery).getOrElse("")
          .split("&").filter(_.nonEmpty).map { kv =>
            val Array(k, v) = kv.split("=", 2)
            URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8")
          }.toMap
        val offset = params.getOrElse("$offset", "0").toLong
        val limit = params.getOrElse("$limit", "50000").toInt
        val select = params.get("$select")
          .map(_.split(",").map(_.trim).toSeq)
          .getOrElse(Seq("invoice_line_no", "date", "store", "sale_dollars"))
        val where = params.get("$where")
        requests.add(Req(offset, limit, select, where))

        if (flaky && seenOffsets.add(offset)) {
          ex.sendResponseHeaders(500, -1)
          ex.close()
          return
        }

        // parse "date >= 'ISO' and date <= 'ISO'" bounds (either side optional)
        def bound(op: String): Option[Long] =
          where.flatMap { w =>
            val m = (java.util.regex.Pattern
              .compile(java.util.regex.Pattern.quote(op) + "\\s*'([^']+)'")
              .matcher(w))
            if (m.find()) Some(microsOf(m.group(1))) else None
          }
        val gte = bound("date >=")
        val lte = bound("date <=")

        val eol = if (crlf) "\r\n" else "\n"
        val sb = new StringBuilder
        sb.append(select.mkString(",")).append(eol)
        var i = offset
        val end = math.min(offset + limit, totalRows)
        while (i < end) {
          val d = PagedSource.dateMicros(i)
          if (gte.forall(d >= _) && lte.forall(d <= _)) {
            val nullSale =
              nullSaleDollarsEvery > 0 && i % nullSaleDollarsEvery == 0
            sb.append(select.map {
              case "invoice_line_no" => PagedSource.invoice(i)
              case "date" => isoOf(d)
              case "store" => PagedSource.store(i)
              case "sale_dollars" =>
                if (nullSale) "" else PagedSource.saleDollars(i).toString
              case other => throw new IllegalArgumentException(other)
            }.mkString(",")).append(eol)
          }
          i += 1
        }
        val bytes = sb.toString.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "text/csv")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.setExecutor(Executors.newFixedThreadPool(4))
    server.start()
    (server, server.getAddress.getPort)
  }
}
