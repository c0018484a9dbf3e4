package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LIVE threat-intel receivers — the MISP and OTX pollers (reference
  * `NERDd/misp_receiver.py:265–345`, `NERDd/otx_receiver.py:152–174`)
  * as env-gated [[EnrichmentSource]] connectors in the established
  * taxonomy ([[HttpBlacklistSource]]): the transport lives inside the
  * connector, the fetched feed is feed-sized (one poll returns the whole
  * recent attribute/pulse set, so the fetch is driver-side and bounded,
  * and the feed ships to executors as a broadcast), a MISCONFIGURATION
  * throws (bad URL scheme — it will never succeed on retry), a TRANSIENT
  * failure (network, HTTP status, timeout, over-limit body) degrades to
  * the `fallback` fixture with a warn, and gated-off never opens a
  * connection.
  *
  * The ENGINE surface each feed row drives is unchanged: a MISP attribute
  * row is the `array_upsert misp_events {misp_instance, event_id}` analog
  * and an OTX (entity, pulse_id) row the `array_upsert otx_pulses
  * {pulse_id}` analog — [[Intel.threatIntelSummary]] consumes either the
  * live feeds or the fixtures identically.
  */
object IntelLive {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Validate scheme OUTSIDE the degrade path (throws — permanent error),
    * then fetch the body; None on transient failure. `post` carries the
    * request body for MISP's restSearch (GET when None).
    */
  private[graft] def fetchJson(url: String, headers: Seq[(String, String)],
                                 post: Option[String], timeoutMs: Int,
                                 maxBytes: Int): Option[String] = {
    val uri = new java.net.URI(url)
    uri.getScheme match {
      case "http" | "https" => ()
      case other => throw new IllegalArgumentException(
        s"unsupported intel URL scheme '$other' in $url")
    }
    try {
      val conn = uri.toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      try {
        post.foreach { body =>
          conn.setRequestMethod("POST")
          conn.setDoOutput(true)
          val b = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          conn.getOutputStream.write(b)
        }
        val code = conn.getResponseCode
        if (code != 200) {
          log.warn(s"intel fetch from $url failed (HTTP $code); serving fallback")
          return None
        }
        // a JSON body can't be line-truncated like a blacklist feed — an
        // over-limit response is unusable as a whole and degrades
        val bytes = conn.getInputStream.readNBytes(maxBytes + 1)
        if (bytes.length > maxBytes) {
          log.warn(s"intel fetch from $url exceeded $maxBytes bytes; serving fallback")
          None
        } else Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      } finally conn.disconnect()
    } catch {
      case e: java.io.IOException =>
        log.warn(s"intel fetch from $url failed (${e.getMessage}); serving fallback")
        None
    }
  }

  /** The reference's attribute→ip extraction (`misp_receiver.py:229–242`
    * `get_ip_address`): `domain|ip` values carry the ip AFTER the pipe,
    * `ip-src|port`/`ip-dst|port` BEFORE it. Returns None on a value that
    * isn't a parseable IPv4 (skip the row, like the blacklist line parser
    * skips garbage).
    */
  private[graft] def attributeIp(attrType: String, value: String): Option[Long] = {
    val raw =
      if (attrType.startsWith("domain")) value.split('|').lift(1).getOrElse("")
      else value.split('|').head
    val parts = raw.trim.split('.')
    if (parts.length != 4) return None
    try {
      val octets = parts.map(_.toInt)
      if (octets.exists(o => o < 0 || o > 255)) None
      else Some(octets.foldLeft(0L)((acc, o) => (acc << 8) | o))
    } catch { case _: NumberFormatException => None }
  }
}

/** LIVE MISP receiver: polls the instance's REST attribute search
  * (`POST {url}/attributes/restSearch`, the documented MISP API the
  * reference's PyMISP `search(controller='attributes')` call wraps) for
  * recent ip attributes, mapping each to one feed row
  * (entity, pulse_id = event_id, day) — the `misp_events` upsert stream.
  * Sighting multiplicity rides row multiplicity, exactly how the fixture
  * feed expresses it ([[Intel.threatIntelSummary]] counts rows as
  * `n_sightings`).
  *
  * Gated off by default (`GRAFT_LIVE_MISP=1`); the `fallback` fixture
  * serves unchanged when gated, on transient failure, or on a response
  * that isn't the documented shape.
  */
final case class LiveMispSource(
    spark: SparkSession, url: String, apiKey: String, fallback: DataFrame,
    enabled: Boolean = sys.env.get("GRAFT_LIVE_MISP").contains("1"),
    lastDays: Int = 30, timeoutMs: Int = 10000,
    maxBytes: Int = 64 << 20) extends EnrichmentSource {
  val name = "misp_receiver"

  /** One poll serves BOTH surfaces (feed rows and typed ops) — the
    * reference receiver processes each fetched attribute once, too.
    * `includeSightings` asks the instance to inline each attribute's
    * `Sighting` list so the per-event sighting counters need no second
    * round-trip.
    */
  private lazy val body: Option[String] =
    if (!enabled) None
    else IntelLive.fetchJson(s"$url/attributes/restSearch",
      Seq("Authorization" -> apiKey, "Accept" -> "application/json",
        "Content-Type" -> "application/json"),
      Some(s"""{"returnFormat":"json","type":["ip-src","ip-dst","ip-src|port","ip-dst|port","domain|ip"],"last":"${lastDays}d","includeSightings":1,"includeContext":1}"""),
      timeoutMs, maxBytes)

  /** The feed rows: (entity, pulse_id, day) — fetched when live, the
    * fallback otherwise. The request narrows server-side to the ip
    * attribute types and the recency window (`last`), the reference
    * receiver's own filter set.
    */
  lazy val feed: DataFrame = {
    body.flatMap(parseAttributes) match {
      case Some(rows) =>
        import spark.implicits._
        rows.toDF("entity", "pulse_id", "day")
          .withColumn("day", org.apache.spark.sql.functions.to_date(
            org.apache.spark.sql.functions.from_unixtime(
              org.apache.spark.sql.functions.col("day"))))
      case None => fallback
    }
  }

  /** `{"response":{"Attribute":[{event_id, type, value, timestamp}]}}` →
    * (ip, event_id, epoch) rows; deleted attributes are skipped (the
    * reference checks `attrib['deleted']`), unparseable values are
    * skipped, a response without the documented envelope degrades (None).
    */
  private[graft] def parseAttributes(body: String): Option[Seq[(Long, Long, Long)]] =
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      val attrs = root.path("response").path("Attribute")
      if (!attrs.isArray) return None
      import scala.jdk.CollectionConverters._
      Some(attrs.elements().asScala.flatMap { a =>
        if (a.path("deleted").asBoolean(false)) None
        else IntelLive.attributeIp(a.path("type").asText(""),
          a.path("value").asText("")).map { ip =>
          (ip, a.path("event_id").asLong(0L), a.path("timestamp").asLong(0L))
        }
      }.toSeq)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The update-op surface of one poll, per entity ip, mirroring the
    * reference receiver's queue (`misp_receiver.py:180–214,272–311,417–424`):
    * a DELETED ip attribute maps to
    * `array_remove misp_events {misp_instance, event_id}`
    * (`remove_misp_event`); a live one to
    * `array_upsert misp_events {misp_instance, event_id}` whose actions set
    * the role, the per-event sighting counters — the attribute's inlined
    * `Sighting` list counted by type (`get_sightings_for_nerd`: "0" →
    * positive, "1" → false positive, "2" → expired attribute) — and, when
    * the poll's `includeContext` inlined the attribute's `Event`, the
    * event-level fields `create_new_event` sets (org_created from
    * `Orgc.name`, info, date, threat_level from `threat_level_id` via the
    * High/Medium/Low/Undefined map, last_change from the event timestamp),
    * PLUS the companion `setmax _ttl.misp` (event date +
    * `record_life_length.misp`, reference default 180 d) and
    * `setmax last_activity` (event date) that `upsert_new_event` always
    * queues alongside the upsert. Modeled SUBSET, stated plainly: tag_list
    * and the tlp-from-tags refinement (`misp_receiver.py:207–213`) are not
    * fetched (restSearch context carries no Tag list; tlp defaults to
    * "green" like the reference's initializer), and a response WITHOUT the
    * Event context degrades those attributes to the role+sightings upsert
    * with no setmax pair — the date the ttl anchors on simply isn't in the
    * message. Empty when gated off or degraded (the fallback FIXTURE feed
    * has no op stream — un-consumed removals must not be invented).
    */
  lazy val ops: Seq[(Long, graft.ops.UpdateAlgebra.UpdateOp)] =
    body.flatMap(parseOps).getOrElse(Seq.empty)

  /** `record_life_length.misp` (reference default 180 d,
    * `misp_receiver.py:74`): how long past its event date an ip stays
    * alive in the misp TTL lane. */
  private val inactiveIpLifetimeDays = 180L

  private val threatLevels =
    Map("1" -> "High", "2" -> "Medium", "3" -> "Low", "4" -> "Undefined")

  private[graft] def parseOps(body: String): Option[Seq[(Long, graft.ops.UpdateAlgebra.UpdateOp)]] =
    try {
      import graft.ops.UpdateAlgebra._
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      val attrs = root.path("response").path("Attribute")
      if (!attrs.isArray) return None
      import scala.jdk.CollectionConverters._
      Some(attrs.elements().asScala.flatMap { a =>
        IntelLive.attributeIp(a.path("type").asText(""),
          a.path("value").asText("")).toSeq.flatMap { ip =>
          val eventId = a.path("event_id").asLong(0L)
          val query = Seq[(String, Any)]("misp_instance" -> url, "event_id" -> eventId)
          if (a.path("deleted").asBoolean(false))
            Seq(ip -> ArrayRemove("misp_events", query))
          else {
            var pos, fp, exp = 0L
            a.path("Sighting").elements().asScala.foreach { s =>
              s.path("type").asText("") match {
                case "0" => pos += 1
                case "1" => fp += 1
                case "2" => exp += 1
                case _ => ()
              }
            }
            val sightings = newRec()
            sightings.update("positive", pos)
            sightings.update("false positive", fp)
            sightings.update("expired attribute", exp)
            val role = if (a.path("type").asText("").contains("src")) "src" else "dst"
            val sets = Seq.newBuilder[UpdateOp]
            sets += SetVal("role", role)
            sets += SetVal("sightings", sightings)
            // event-level fields from the includeContext-inlined Event
            // (create_new_event, misp_receiver.py:180–214); absent context
            // degrades to the role+sightings subset — see the ops doc
            val ev = a.path("Event")
            val evDate: Option[Long] =
              Option(ev.path("date").asText("")).filter(_.nonEmpty)
                .flatMap(d => scala.util.Try(
                  java.time.LocalDate.parse(d).atStartOfDay(
                    java.time.ZoneOffset.UTC).toEpochSecond).toOption)
            if (!ev.isMissingNode && !ev.isNull) {
              val org = ev.path("Orgc").path("name").asText("")
              if (org.nonEmpty) sets += SetVal("org_created", org)
              sets += SetVal("tlp", "green")
              val info = ev.path("info").asText("")
              if (info.nonEmpty) sets += SetVal("info", info)
              evDate.foreach(d => sets += SetVal("date", d))
              threatLevels.get(ev.path("threat_level_id").asText(""))
                .foreach(tl => sets += SetVal("threat_level", tl))
              val ts = ev.path("timestamp").asLong(0L)
              if (ts > 0L) sets += SetVal("last_change", ts)
            }
            val upsert = ip -> (ArrayUpsert("misp_events", query,
              sets.result()): UpdateOp)
            evDate match {
              case Some(d) => Seq(upsert,
                ip -> SetMax("_ttl.misp", d + inactiveIpLifetimeDays * 86400L),
                ip -> SetMax("last_activity", d))
              case None => Seq(upsert)
            }
          }
        }
      }.toSeq)
    } catch { case scala.util.control.NonFatal(_) => None }

  def feeds: Seq[DataFrame] = Seq(feed)

  /** Per-entity MISP summary onto the given entity frame — the misp half
    * of [[Intel.threatIntelSummary]], left-joined so un-sighted entities
    * keep zero counts.
    */
  def enrich(ips: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val agg = feed.groupBy(col("entity")).agg(
      size(collect_set(col("pulse_id"))).cast("long").as("n_misp_events"),
      count(lit(1)).as("n_sightings"),
      max(col("day")).as("last_misp_day"))
    ips.join(broadcast(agg), Seq("entity"), "left")
      .na.fill(0L, Seq("n_misp_events", "n_sightings"))
  }
}

object LiveOtxSource {
  /** One IPv4 indicator of one pulse — the unit the reference receiver
    * upserts (`otx_receiver.py:116–133` `create_new_pulse`). Dates are
    * epoch seconds; None = absent or unparseable in the response.
    */
  final case class OtxRow(ip: Long, pulseId: Long, pulseName: String,
                          author: String, pulseCreated: Option[Long],
                          pulseModified: Option[Long], indCreated: Option[Long],
                          indExpiration: Option[Long], role: String,
                          title: String)

  /** OTX date strings arrive as ISO local datetimes with optional
    * fractional seconds and optional zone ("2017-06-15T17:22:00.000000",
    * "2023-11-14T12:00:00Z"); absent/garbage → None. Zoneless values are
    * UTC (the reference's naive `datetime.strptime` + utcnow comparisons
    * assume the same).
    */
  private[graft] def parseEpoch(s: String): Option[Long] = {
    if (s == null || s.isEmpty || s == "null") return None
    try Some(java.time.OffsetDateTime.parse(s).toEpochSecond)
    catch { case _: java.time.format.DateTimeParseException =>
      try Some(java.time.LocalDateTime.parse(s)
        .toEpochSecond(java.time.ZoneOffset.UTC))
      catch { case _: java.time.format.DateTimeParseException => None }
    }
  }
}

/** LIVE OTX receiver: polls the subscribed-pulses endpoint
  * (`GET {url}/api/v1/pulses/subscribed`, the documented OTX API the
  * reference's OTXv2 `getall` wraps) with the `X-OTX-API-KEY` header,
  * follows the response's `next` pagination link (bounded by `maxPages` —
  * an unbounded crawl of a hostile `next` chain must not hang the poll),
  * and maps every IPv4 indicator to one (entity, pulse_id) feed row — the
  * `otx_pulses` upsert stream.
  *
  * Gated off by default (`GRAFT_LIVE_OTX=1`); fallback semantics as
  * [[LiveMispSource]].
  */
final case class LiveOtxSource(
    spark: SparkSession, url: String, apiKey: String, fallback: DataFrame,
    enabled: Boolean = sys.env.get("GRAFT_LIVE_OTX").contains("1"),
    modifiedSince: Option[String] = None, maxPages: Int = 20,
    timeoutMs: Int = 10000, maxBytes: Int = 64 << 20,
    freshDays: Int = 30, inactivePulseDays: Int = 30,
    nowEpochSec: () => Long = () => System.currentTimeMillis() / 1000L)
  extends EnrichmentSource {
  val name = "otx_receiver"

  lazy val feed: DataFrame = {
    fetchedRows match {
      case Some(rows) =>
        import spark.implicits._
        rows.map(r => (r.ip, r.pulseId)).toDF("entity", "pulse_id")
      case None => fallback
    }
  }

  private lazy val fetchedRows: Option[Seq[LiveOtxSource.OtxRow]] =
    if (!enabled) None else fetchAllPages()

  /** The full update-op surface of one poll, per entity ip — the task the
    * reference receiver queues per fresh IPv4 indicator
    * (`otx_receiver.py:136–175` `upsert_new_pulse` + `process_pulses`):
    * `array_upsert otx_pulses {pulse_id}` setting the pulse/indicator
    * fields, `setmax _ttl.otx` (expiration, or poll time, plus the
    * inactive-pulse grace — `record_life_length.otx`, reference default 30 d,
    * `otx_receiver.py:94`), `setmax last_activity`. Indicators created
    * before the freshness cutoff (`freshDays`, reference's
    * `time_for_upsert` = now − 30 d) are skipped — a pulse that keeps
    * adding IPs must not re-upsert its stale ones. Empty when gated off or
    * degraded.
    */
  lazy val ops: Seq[(Long, Seq[graft.ops.UpdateAlgebra.UpdateOp])] = {
    import graft.ops.UpdateAlgebra._
    val now = nowEpochSec()
    val cutoff = now - freshDays * 86400L
    fetchedRows.getOrElse(Seq.empty).collect {
      case r if r.indCreated.forall(_ >= cutoff) =>
        val sets = Seq.newBuilder[UpdateOp]
        sets += SetVal("pulse_id", r.pulseId)
        sets += SetVal("pulse_name", r.pulseName)
        sets += SetVal("author_name", r.author)
        r.pulseCreated.foreach(v => sets += SetVal("pulse_created", v))
        r.pulseModified.foreach(v => sets += SetVal("pulse_modified", v))
        r.indCreated.foreach(v => sets += SetVal("indicator_created", v))
        sets += SetVal("indicator_role", r.role)
        sets += SetVal("indicator_title", r.title)
        r.indExpiration.foreach(v => sets += SetVal("indicator_expiration", v))
        val liveTill = r.indExpiration.getOrElse(now) + inactivePulseDays * 86400L
        r.ip -> Seq[UpdateOp](
          ArrayUpsert("otx_pulses", Seq("pulse_id" -> r.pulseId), sets.result()),
          SetMax("_ttl.otx", liveTill),
          SetMax("last_activity", now))
    }
  }

  /** Walk the pagination chain. A transient failure on ANY page degrades
    * the whole poll (a half-fetched pulse set would under-count
    * visibility silently); a `next` pointing off-host is refused (the
    * chain must not be able to redirect the poller elsewhere).
    */
  private[graft] def fetchAllPages(): Option[Seq[LiveOtxSource.OtxRow]] = {
    val sinceParam = modifiedSince.map(s => "&modified_since=" +
      java.net.URLEncoder.encode(s, "UTF-8")).getOrElse("")
    val first = s"$url/api/v1/pulses/subscribed?limit=50$sinceParam"
    val host = new java.net.URI(url).getHost
    val out = Seq.newBuilder[LiveOtxSource.OtxRow]
    var page = Option(first)
    var n = 0
    while (page.isDefined && n < maxPages) {
      val body = IntelLive.fetchJson(page.get,
        Seq("X-OTX-API-KEY" -> apiKey, "Accept" -> "application/json"),
        None, timeoutMs, maxBytes)
      body.flatMap(parsePulsePage) match {
        case None => return None
        case Some((rows, next)) =>
          out ++= rows
          page = next.filter(u =>
            try new java.net.URI(u).getHost == host
            catch { case scala.util.control.NonFatal(_) => false })
          n += 1
      }
    }
    Some(out.result())
  }

  /** `{"results":[{id, name, author_name, created, modified, indicators:
    * [{type, indicator, created, expiration, role, title}]}], "next":
    * url?}` → the page's rows + the next-page link. Only `IPv4` indicators
    * map to entities (`otx_receiver.py:195–204` selects the IPv4
    * parameter); a response without `results` degrades. Missing/garbage
    * dates parse to None (the op builder treats an unparseable
    * indicator-created as fresh, like the reference's KeyError-free dict
    * access treats the field as present-or-crash — we degrade per-field,
    * not per-poll).
    */
  private[graft] def parsePulsePage(body: String): Option[(Seq[LiveOtxSource.OtxRow], Option[String])] =
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      val results = root.path("results")
      if (!results.isArray) return None
      import scala.jdk.CollectionConverters._
      val rows = results.elements().asScala.flatMap { pulse =>
        val pid = pulse.path("id").asLong(0L)
        val pName = pulse.path("name").asText("")
        val pAuthor = pulse.path("author_name").asText("")
        val pCreated = LiveOtxSource.parseEpoch(pulse.path("created").asText(""))
        val pModified = LiveOtxSource.parseEpoch(pulse.path("modified").asText(""))
        pulse.path("indicators").elements().asScala.flatMap { ind =>
          if (ind.path("type").asText("") != "IPv4") None
          else IntelLive.attributeIp("ip-src", ind.path("indicator").asText(""))
            .map(ip => LiveOtxSource.OtxRow(ip, pid, pName, pAuthor,
              pCreated, pModified,
              LiveOtxSource.parseEpoch(ind.path("created").asText("")),
              LiveOtxSource.parseEpoch(ind.path("expiration").asText("")),
              ind.path("role").asText(""), ind.path("title").asText("")))
        }
      }.toSeq
      // a JSON `null` next is end-of-chain, only a non-empty string links on
      val nextNode = root.path("next")
      val next = if (nextNode.isTextual && nextNode.asText().nonEmpty)
        Some(nextNode.asText()) else None
      Some((rows, next))
    } catch { case scala.util.control.NonFatal(_) => None }

  def feeds: Seq[DataFrame] = Seq(feed)

  /** Per-entity OTX visibility onto the given entity frame — the otx half
    * of [[Intel.threatIntelSummary]].
    */
  def enrich(ips: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val agg = feed.groupBy(col("entity")).agg(
      size(collect_set(col("pulse_id"))).cast("long").as("n_otx_pulses"))
    ips.join(broadcast(agg), Seq("entity"), "left")
      .na.fill(0L, Seq("n_otx_pulses"))
  }
}
