package graft.sources

import org.apache.spark.sql.DataFrame

/** Pluggable enrichment connectors.
  *
  * The reference's live enrichment modules (whois
  * `NERDd/modules/whois.py:77–549`, DNSBL `dnsbl.py:89–249`, Shodan
  * `shodan.py:30–118`, passive DNS `passive_dns.py:34–144`, BGP rank
  * `bgp_rank.py:16–83`, geolocation `geolocation.py`, PTR `dns.py:27–77`)
  * each register a callable with the update manager; the network transport
  * lives inside the module. The engine-side restatement of that seam is this
  * trait: a connector produces the cycle's FEED TABLES (`feeds`) — for a live
  * implementation, the materialized batch of its lookups; paging, rate
  * limits, and retries stay connector-internal — and applies its join +
  * update semantics to the entity frame (`enrich`).
  *
  * The fixture implementations below delegate to [[Intel]]'s broadcast
  * joins unchanged, so the suite's oracle rows exercise the exact same
  * shapes through the seam. A user wiring a real whois/DNS/Shodan source
  * implements the trait instead of editing Intel.scala; EnrichmentSpec
  * demonstrates a connector defined entirely outside this file plugging in.
  *
  * Scale contract every implementation inherits: every `feeds` entry must be
  * feed-sized (broadcastable — blacklists, scan dbs, rank feeds are
  * millions of rows at most), never corpus-sized; `enrich` must be a
  * broadcast join against the entity frame, so enrichment never shuffles
  * the 100-TB side.
  */
trait EnrichmentSource {
  /** Connector id — the reference's module name (`shodan`, `dnsbl`, …). */
  def name: String

  /** The feed table(s) this cycle resolves against — EVERY table `enrich`
    * joins, so the scale contract above is checkable per connector
    * (EnrichmentSpec asserts each stays feed-sized and broadcastable).
    */
  def feeds: Seq[DataFrame]

  /** Join the feed onto the entity frame with this source's update
    * semantics (attribute upserts, miss/404 removals, query budgets).
    */
  def enrich(entities: DataFrame): DataFrame
}

/** Shodan InternetDB (`shodan.py:30–118`): hit upserts ports/tags, miss is
  * the 404-removal path.
  */
final case class ShodanSource(scanDb: DataFrame) extends EnrichmentSource {
  val name = "shodan"
  def feeds: Seq[DataFrame] = Seq(scanDb)
  def enrich(ips: DataFrame): DataFrame = Intel.shodanEnrich(ips, scanDb)
}

/** DNSBL zones with the reference's daily request budget (`dnsbl.py`). */
final case class DnsblSource(zoneLists: DataFrame, zoneSuffix: String,
                             budget: Int) extends EnrichmentSource {
  val name = "dnsbl"
  def feeds: Seq[DataFrame] = Seq(zoneLists)
  def enrich(ips: DataFrame): DataFrame =
    Intel.dnsblLookups(ips, zoneLists, zoneSuffix, budget)
}

/** Redis-cached blacklists: ip sets + prefix intervals (`redis_bl.py`). */
final case class RedisBlSource(setLists: DataFrame, prefixLists: DataFrame)
    extends EnrichmentSource {
  val name = "redis_bl"
  def feeds: Seq[DataFrame] = Seq(setLists, prefixLists)
  def enrich(ips: DataFrame): DataFrame =
    Intel.redisBlHits(ips, setLists, prefixLists)
}

/** ASN rank feeds: CIRCL BGP rank + email rank (`bgp_rank.py`,
  * `eml_asn_rank.py`).
  */
final case class AsnRankSource(ranks: DataFrame) extends EnrichmentSource {
  val name = "bgp_rank"
  def feeds: Seq[DataFrame] = Seq(ranks)
  def enrich(ipsWithAsn: DataFrame): DataFrame = Intel.asnRanks(ipsWithAsn, ranks)
}

/** Geolocation db (`geolocation.py`): MaxMind-style lookup table. */
final case class GeoSource(geoDb: DataFrame) extends EnrichmentSource {
  val name = "geo"
  def feeds: Seq[DataFrame] = Seq(geoDb)
  def enrich(keyed: DataFrame): DataFrame = Intel.geoEnrich(keyed, geoDb)
}

/** DNS PTR resolver (`dns.py:27–77`): NXDOMAIN removes stored hostnames. */
final case class PtrSource(ptrDb: DataFrame) extends EnrichmentSource {
  val name = "dns_ptr"
  def feeds: Seq[DataFrame] = Seq(ptrDb)
  def enrich(ips: DataFrame): DataFrame = Intel.ptrEnrich(ips, ptrDb)
}

/** LIVE blacklist fetcher — the reference's downloader pipeline
  * (`NERDd/blacklists.py:120–188` `download_blacklist`/`get_blacklist`):
  * fetch the list over `http(s)://` or `file://`, parse one IPv4 record
  * per line ([[Feeds.parseBlacklistLines]], the same parser the fixture
  * feeds go through), and serve the result as the cycle's set-list feed
  * table. This is the one REFERENCE IMPLEMENTATION of a non-fixture
  * [[EnrichmentSource]]: the transport lives inside the connector (the
  * trait's contract), the fetched feed is feed-sized by nature, and
  * `enrich` stays a broadcast membership join.
  *
  * GATED OFF by default: the fetch runs only when `enabled` — the default
  * reads `GRAFT_LIVE_FEEDS=1`, so CI and zero-egress environments never
  * open a connection and serve the `fallback` fixture unchanged. A fetch
  * FAILURE also degrades to the fallback (the reference degrades to an
  * empty list on ConnectionError, `blacklists.py:133–135`; for a batch
  * engine the standing fixture — operationally, the previous successful
  * download — is the equivalent safe state). The fetch itself is
  * driver-side and bounded (`maxBytes`) — a feed table ships to executors
  * as a broadcast either way, so there is nothing to distribute.
  */
final case class HttpBlacklistSource(
    spark: org.apache.spark.sql.SparkSession,
    url: String, blId: String, fallback: DataFrame,
    enabled: Boolean = sys.env.get("GRAFT_LIVE_FEEDS").contains("1"),
    timeoutMs: Int = 10000,
    maxBytes: Int = 64 << 20) extends EnrichmentSource {
  val name = "blacklists"

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The raw feed lines, or None when gated off / fetch failed.
    *
    * Error taxonomy matters here: a MISCONFIGURATION (malformed URI,
    * unsupported scheme) is validated OUTSIDE the degrade path and throws —
    * it will never succeed on retry, and silently serving the fallback
    * forever would hide the typo behind a warn log (the reference degrades
    * only on ConnectionError, `blacklists.py:133–135`). Only genuinely
    * TRANSIENT fetch failures (network, HTTP status, timeout) degrade to
    * the fallback feed.
    */
  private[sources] def fetchLines(): Option[Seq[String]] = {
    if (!enabled) return None
    // config validation: throws on a bad URL/scheme regardless of `enabled`
    // timing — a permanent error must surface, not degrade
    val uri = new java.net.URI(url)
    val scheme = uri.getScheme match {
      case s @ ("file" | "http" | "https") => s
      case other =>
        throw new IllegalArgumentException(
          s"unsupported blacklist URL scheme '$other' in $url")
    }
    try {
      val text = scheme match {
        case "file" =>
          new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(uri)), java.nio.charset.StandardCharsets.UTF_8)
        case _ =>
          val conn = uri.toURL.openConnection()
            .asInstanceOf[java.net.HttpURLConnection]
          conn.setConnectTimeout(timeoutMs)
          conn.setReadTimeout(timeoutMs)
          try {
            require(conn.getResponseCode == 200,
              s"HTTP ${conn.getResponseCode} from $url")
            // read maxBytes + 1 so truncation is DETECTED: a feed cut
            // mid-line can leave a prefix that still parses as a valid but
            // WRONG address ('203.0.113.250' cut to '203.0.113.2'), so an
            // over-limit body drops its final partial line and warns
            val bytes = conn.getInputStream.readNBytes(maxBytes + 1)
            if (bytes.length > maxBytes) {
              val cut = new String(bytes, 0, maxBytes,
                java.nio.charset.StandardCharsets.UTF_8)
              val safe = cut.lastIndexOf('\n')
              log.warn(s"blacklist '$blId' feed exceeded $maxBytes bytes; " +
                "truncated at the last complete line (partial tail dropped)")
              if (safe >= 0) cut.substring(0, safe) else ""
            } else new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          } finally conn.disconnect()
      }
      Some(text.split("\n", -1).toSeq)
    } catch {
      case e: java.io.IOException =>
        log.warn(s"blacklist '$blId' fetch from $url failed " +
          s"(${e.getMessage}); serving fallback feed")
        None
      case e: IllegalArgumentException => // require(HTTP status) failures
        log.warn(s"blacklist '$blId' fetch from $url failed " +
          s"(${e.getMessage}); serving fallback feed")
        None
    }
  }

  /** The set-list feed: (ip, bl_id) — fetched+parsed when live, the
    * fallback fixture otherwise.
    */
  lazy val setList: DataFrame = fetchLines() match {
    case Some(lines) =>
      import spark.implicits._
      Feeds.parseBlacklistLines(lines.toDF("line"))
        .withColumn("bl_id", org.apache.spark.sql.functions.lit(blId))
    case None => fallback
  }

  def feeds: Seq[DataFrame] = Seq(setList)

  /** Membership join: one (entity, bl_id) row per hit — the set half of
    * [[Intel.blMembership]]'s shape.
    */
  def enrich(ips: DataFrame): DataFrame =
    ips.join(org.apache.spark.sql.functions.broadcast(setList),
        Seq("ip"))
      .select(org.apache.spark.sql.functions.col("entity"),
        org.apache.spark.sql.functions.col("bl_id"))
}

/** LIVE DNS PTR resolver — the second live [[EnrichmentSource]]
  * (reference `NERDd/modules/dns.py:27–77`: resolve the PTR record for
  * each entity ip; NXDOMAIN removes any stored hostname). Resolution runs
  * EXECUTOR-side over the budget-bounded ip batch: each partition opens
  * ONE JNDI DNS context (`jdk.naming.dns`, JVM-builtin — no native
  * resolver libs) and streams its rows through it, so lookup parallelism
  * scales with partitions and context setup amortizes per partition, not
  * per row — the same partition-batched discipline as the multimodal
  * decoders. The daily budget takes the deterministic
  * `orderBy(entity).limit(budget)` cut [[Intel.dnsblLookups]] uses;
  * beyond-budget ips pass through with no-op semantics (hostname "",
  * nxdomain 0 — "not queried" must not look like "NXDOMAIN", which is a
  * REMOVAL signal).
  *
  * GATED OFF by default (`GRAFT_LIVE_DNS=1`), serving the `fallback`
  * fixture through [[Intel.ptrEnrich]] unchanged — the same gate shape as
  * [[HttpBlacklistSource]]. Failure taxonomy likewise mirrors it:
  * NXDOMAIN (`NameNotFoundException`) is a real answer and emits the
  * removal flag; a TRANSIENT failure (timeout, server unreachable) emits
  * the no-op row — the reference only deletes a stored hostname on a
  * definitive NXDOMAIN, never on a lookup error.
  */
final case class LiveDnsPtrSource(
    fallback: DataFrame,
    enabled: Boolean = sys.env.get("GRAFT_LIVE_DNS").contains("1"),
    budget: Int = 1000,
    timeoutMs: Int = 3000,
    dnsUrl: String = "dns:") extends EnrichmentSource {
  val name = "dns_ptr"

  def feeds: Seq[DataFrame] = Seq(fallback)

  def enrich(ips: DataFrame): DataFrame =
    if (!enabled) Intel.ptrEnrich(ips, fallback)
    else {
      import org.apache.spark.sql.functions._
      val resolved = resolvePtr(ips)
      // beyond-budget ips re-attach with the no-op row; the resolved set is
      // ≤ budget rows, so the re-attach join broadcasts it
      ips.join(broadcast(resolved.drop("ip")), Seq("entity"), "left")
        .select(col("entity"), col("ip"),
          coalesce(col("hostname"), lit("")).as("hostname"),
          coalesce(col("nxdomain"), lit(0L)).as("nxdomain"))
    }

  /** Live-resolve the budget cut of the batch: (entity, ip, hostname,
    * nxdomain). Executor-side; one DNS context per partition.
    */
  private[sources] def resolvePtr(ips: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = ips.sparkSession
    import spark.implicits._
    val (tms, url) = (timeoutMs, dnsUrl) // avoid serializing `this`
    ips.orderBy(col("entity")).limit(budget)
      .select(col("entity"), col("ip")).as[(Long, Long)]
      .mapPartitions { rows =>
        // the `dns://host:port/name` URL-IN-NAME form, resolved through a
        // plain InitialDirContext, NOT an explicit
        // INITIAL_CONTEXT_FACTORY=com.sun.jndi.dns.DnsContextFactory: the
        // jdk.naming.dns module exports only its URL-context package to
        // java.naming, so naming the factory class works from the main
        // thread's classloader but dies with IllegalAccessException under
        // an executor task thread's context classloader — the URL form is
        // the supported path and works from any thread
        val env = new java.util.Hashtable[String, String]()
        env.put("com.sun.jndi.dns.timeout.initial", tms.toString)
        env.put("com.sun.jndi.dns.timeout.retries", "1")
        // a context that fails to CONSTRUCT (no resolver reachable) is
        // transient for every row in the partition: all no-op, never throw
        val ctx =
          try new javax.naming.directory.InitialDirContext(env)
          catch { case scala.util.control.NonFatal(_) => null }
        val it = rows.map { case (entity, ip) =>
          if (ctx == null) (entity, ip, "", 0L)
          else
            try {
              val attrs = ctx.getAttributes(
                url + "/" + LiveDnsPtrSource.reverseName(ip), Array("PTR"))
              Option(attrs.get("PTR")).filter(_.size > 0) match {
                case Some(a) =>
                  (entity, ip, a.get(0).toString.stripSuffix("."), 0L)
                // a definitive empty answer: no PTR record == NXDOMAIN
                // for the stored-hostname lifecycle
                case None => (entity, ip, "", 1L)
              }
            } catch {
              case _: javax.naming.NameNotFoundException =>
                (entity, ip, "", 1L) // NXDOMAIN: the removal signal
              case scala.util.control.NonFatal(_) =>
                (entity, ip, "", 0L) // transient: keep stored state
            }
        }
        it // context has no close() requirement beyond GC; JNDI DirContext
           // close is advisory — still, be tidy when the iterator drains
      }.toDF("entity", "ip", "hostname", "nxdomain")
  }
}

object LiveDnsPtrSource {
  /** `a.b.c.d` → `d.c.b.a.in-addr.arpa.` — the PTR query name (RFC 1035
    * §3.5). Pure and JVM-side so the executor loop and tests share it; the
    * Column-side twin is `reverseLabels(int2ipstr(ip))` in
    * [[Intel.dnsblZoneLookups]].
    */
  def reverseName(ip: Long): String = {
    val b = new StringBuilder(32)
    b.append(ip & 255).append('.').append((ip >> 8) & 255).append('.')
      .append((ip >> 16) & 255).append('.').append((ip >> 24) & 255)
      .append(".in-addr.arpa.")
    b.toString
  }
}

/** LIVE geolocation feed fetcher (`NERDd/modules/geolocation.py` — the
  * MaxMind GeoLite2 db the reference loads): fetch a GeoLite2-style
  * COUNTRY CSV (`network,country[,city[,tz]]` rows, CIDR networks, `#`
  * comments skipped) once per cycle over the shared bounded transport and
  * serve it as (first, last, ctry, city, tz) ip RANGES — so live `enrich`
  * is the broadcast range join `ip BETWEEN first AND last`, the same
  * shape as the prefix-blacklist and IANA range rows. Stated plainly: the
  * reference reads MaxMind's BINARY .mmdb via libmaxminddb; the engine
  * consumes the equivalent data in the CSV form MaxMind also publishes —
  * same information, a parse this container can actually do. Gated off by
  * default (`GRAFT_LIVE_GEO=1`), serving the keyed `fallback` through
  * [[Intel.geoEnrich]] unchanged.
  */
final case class HttpGeoSource(
    spark: org.apache.spark.sql.SparkSession,
    url: String, fallback: DataFrame,
    enabled: Boolean = sys.env.get("GRAFT_LIVE_GEO").contains("1"),
    timeoutMs: Int = 10000,
    maxBytes: Int = 256 << 20) extends EnrichmentSource {
  val name = "geo"

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The fetched range table (first, last, ctry, city, tz), or None when
    * gated off / fetch failed.
    */
  lazy val ranges: Option[DataFrame] =
    HttpBlacklistSource(spark, url, name, fallback, enabled, timeoutMs,
        maxBytes).fetchLines().map { lines =>
      import spark.implicits._
      val rows = lines.iterator
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .flatMap { l =>
          val c = l.split(',')
          HttpGeoSource.cidrRange(c(0).trim).collect {
            case (first, last) if c.length >= 2 && c(1).trim.nonEmpty =>
              (first, last, c(1).trim,
                if (c.length >= 3) c(2).trim else "",
                if (c.length >= 4) c(3).trim else "")
          }
        }.toSeq
      log.info(s"geo feed: ${rows.size} ranges from $url")
      rows.toDF("first", "last", "ctry", "city", "tz")
    }

  def feeds: Seq[DataFrame] = Seq(ranges.getOrElse(fallback))

  /** Live: broadcast range join on the int ip. Gated off: the keyed
    * fixture join ([[Intel.geoEnrich]] — entities carry `gk`). Degrade
    * (enabled but fetch failed) with LIVE-shaped input: the keyed fixture
    * cannot be joined from an ip (`gk` is not a function of ip), so the
    * connector serves NO geo rows for that cycle — the same shape every
    * out-of-range ip takes under a healthy feed — instead of throwing an
    * unresolved-column error from inside the degrade path.
    */
  def enrich(entities: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    ranges match {
      case Some(r) =>
        entities.join(broadcast(r),
            col("ip").between(col("first"), col("last")))
          .select(col("entity"), col("ctry"), col("city"), col("tz"))
      case None if entities.columns.contains("gk") =>
        Intel.geoEnrich(entities, fallback)
      case None =>
        this.log.warn("geo feed unavailable and entities carry no gk key; " +
          "serving no geo rows this cycle")
        entities.select(col("entity"), lit("").as("ctry"),
          lit("").as("city"), lit("").as("tz")).limit(0)
    }
  }
}

object HttpGeoSource {
  /** `a.b.c.d/n` → inclusive int range; None for malformed input. */
  private[graft] def cidrRange(cidr: String): Option[(Long, Long)] = {
    val slash = cidr.split('/')
    if (slash.length != 2) None
    else {
      val q = slash(0).split('.')
      if (q.length != 4) None
      else
        for {
          octets <- scala.util.Try(q.map(_.trim.toLong)).toOption
          // per-octet bound, not just the final 32-bit bound: "10.0.0.300"
          // would otherwise overflow into the third octet and parse as the
          // WRONG range instead of being dropped as malformed
          if octets.forall(o => o >= 0 && o <= 255)
          ip = octets.reduceLeft((a, b) => (a << 8) | b)
          n <- scala.util.Try(slash(1).trim.toInt).toOption
          if n >= 0 && n <= 32
        } yield {
          val mask = if (n == 0) 0L else (0xFFFFFFFFL << (32 - n)) & 0xFFFFFFFFL
          val first = ip & mask
          (first, first | (~mask & 0xFFFFFFFFL))
        }
    }
  }
}

/** LIVE passive-DNS connector (`NERDd/modules/passive_dns.py:34–144` —
  * the CESNET PassiveDNS query per ip): one HTTP GET per entity ip under
  * the budget cut, returning a JSON array of resolution records whose
  * `domain` fields are extracted and fed to the SAME downstream the
  * fixture path uses ([[Intel.pdnsDomainBl]] — domain-blacklist suffix
  * matching). Answer taxonomy per the standing connector rules: 200
  * yields domains (possibly none — a definitive empty answer), 404 is
  * definitive no-data, transport failure drops the entity from the
  * result (no-op — never a spurious "no domains" claim). Gated off by
  * default (`GRAFT_LIVE_PDNS=1`), resolving domains from the `fallback`
  * (entity, domain) fixture instead.
  */
final case class HttpPdnsSource(
    fallback: DataFrame,
    dblSuffixes: Seq[(String, String)],
    enabled: Boolean = sys.env.get("GRAFT_LIVE_PDNS").contains("1"),
    budget: Int = 500,
    baseUrl: String = "https://passivedns.cesnet.cz/api/query",
    timeoutMs: Int = 5000) extends EnrichmentSource {
  val name = "pdns"

  def feeds: Seq[DataFrame] = Seq(fallback)

  def enrich(ips: DataFrame): DataFrame =
    Intel.pdnsDomainBl(
      if (!enabled) fallback else resolveDomains(ips), dblSuffixes)

  /** Live-resolve the budget cut to (entity, domain) rows — one row per
    * resolved domain, entities with transport failures absent.
    */
  private[sources] def resolveDomains(ips: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = ips.sparkSession
    import spark.implicits._
    val (base, tms) = (baseUrl, timeoutMs)
    ips.orderBy(col("entity")).limit(budget)
      .select(col("entity"), col("ip")).as[(Long, Long)]
      .mapPartitions { rows =>
        rows.flatMap { case (entity, ip) =>
          try {
            val conn = java.net.URI
              .create(s"$base/${LiveWhoisSource.queryName(ip)}")
              .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
            conn.setConnectTimeout(tms)
            conn.setReadTimeout(tms)
            try {
              if (conn.getResponseCode != 200) Nil
              else {
                val body = new String(conn.getInputStream.readNBytes(1 << 20),
                  java.nio.charset.StandardCharsets.UTF_8)
                HttpPdnsSource.domainFields(body).map(d => (entity, d))
              }
            } finally conn.disconnect()
          } catch { case scala.util.control.NonFatal(_) => Nil }
        }
      }.toDF("entity", "domain")
  }
}

object HttpPdnsSource {
  /** Every `"domain": "<value>"` field in a JSON array of flat records —
    * the one field the reference consumes; no JSON library needed for a
    * flat scan, and malformed tail content simply stops the scan.
    */
  private[graft] def domainFields(json: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val key = "\"domain\""
    var i = json.indexOf(key)
    while (i >= 0) {
      val colon = json.indexOf(':', i + key.length)
      val q1 = if (colon < 0) -1 else json.indexOf('"', colon)
      val q2 = if (q1 < 0) -1 else json.indexOf('"', q1 + 1)
      if (q2 > q1 && q1 > 0) {
        out += json.substring(q1 + 1, q2)
        i = json.indexOf(key, q2)
      } else i = -1
    }
    out.toSeq
  }
}

/** LIVE Redis blacklist connector (`NERDd/modules/redis_bl.py:47–56` +
  * the writer `scripts/blacklists2redis.py`): the reference caches
  * blacklists in Redis as ip SETS and prefix-interval SORTED SETS
  * (begin/end entries, score = int ip) and queries them per entity; the
  * engine-side restatement reads each structure WHOLE once per cycle —
  * `SMEMBERS` per set key, `ZRANGE 0 -1 WITHSCORES` per interval key —
  * over a minimal RESP2 client (plain sockets, no driver dependency) and
  * serves them as the cycle's broadcast feed tables, so `enrich` stays
  * [[Intel.redisBlHits]]'s membership + range joins unchanged. Feeds are
  * feed-sized by nature (they ARE blacklists), so the whole-structure
  * read is the right scale shape: one bounded driver-side fetch instead
  * of per-entity round trips from every executor.
  *
  * Interval encoding: zset members pair as `<token>:B` (begin) /
  * `<token>:E` (end) with score = int ip; intervals reconstruct by score
  * order. Gated off by default (`GRAFT_LIVE_REDIS=1`); connection failure
  * degrades to the fallback fixtures, per the standing connector
  * taxonomy.
  */
final case class LiveRedisBlSource(
    spark: org.apache.spark.sql.SparkSession,
    host: String, port: Int,
    setKeys: Seq[(String, String)],    // (redis set key, bl_id)
    prefixKeys: Seq[(String, String)], // (redis zset key, bl_id)
    fallbackSets: DataFrame, fallbackPrefixes: DataFrame,
    enabled: Boolean = sys.env.get("GRAFT_LIVE_REDIS").contains("1"),
    timeoutMs: Int = 5000) extends EnrichmentSource {
  val name = "redis_bl"

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** (setLists, prefixLists) — fetched when live, fixtures otherwise. */
  lazy val lists: (DataFrame, DataFrame) = {
    import spark.implicits._
    if (!enabled) (fallbackSets, fallbackPrefixes)
    else
      try {
        val sock = new java.net.Socket()
        try {
          sock.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
          sock.setSoTimeout(timeoutMs)
          val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(sock.getInputStream))
          val out = sock.getOutputStream
          val sets = setKeys.flatMap { case (key, blId) =>
            LiveRedisBlSource.command(in, out, Seq("SMEMBERS", key)) match {
              case ms: Seq[_] => ms.collect { case s: String =>
                scala.util.Try(s.trim.toLong).toOption }.flatten
                .map(ip => (ip, blId))
              case _ => Nil
            }
          }
          val prefixes = prefixKeys.flatMap { case (key, blId) =>
            LiveRedisBlSource.command(in, out,
              Seq("ZRANGE", key, "0", "-1", "WITHSCORES")) match {
              case ms: Seq[_] =>
                val entries = ms.grouped(2).collect {
                  case Seq(m: String, s: String) => (m, s.toDouble.toLong)
                }.toSeq
                // reconstruct intervals by pairing each token's :B with ITS
                // :E — a score-ordered open/close walk would mispair nested
                // or overlapping ranges (a:B@100, b:B@200, a:E@250, b:E@300
                // closes a at b's begin and drops [100,250] silently)
                val begins = entries.collect {
                  case (m, sc) if m.endsWith(":B") => (m.dropRight(2), sc)
                }.toMap
                val ends = entries.collect {
                  case (m, sc) if m.endsWith(":E") => (m.dropRight(2), sc)
                }.toMap
                begins.toSeq.sortBy(_._2).flatMap { case (tok, b) =>
                  ends.get(tok).map(e => (b, e, blId))
                }
              case _ => Nil
            }
          }
          log.info(s"redis bl feed: ${sets.size} set rows, " +
            s"${prefixes.size} intervals from $host:$port")
          (sets.toDF("ip", "bl_id"), prefixes.toDF("first", "last", "bl_id"))
        } finally sock.close()
      } catch {
        case scala.util.control.NonFatal(e) =>
          log.warn(s"redis bl fetch from $host:$port failed " +
            s"(${e.getMessage}); serving fallback feeds")
          (fallbackSets, fallbackPrefixes)
      }
  }

  def feeds: Seq[DataFrame] = Seq(lists._1, lists._2)

  def enrich(ips: DataFrame): DataFrame =
    Intel.redisBlHits(ips, lists._1, lists._2)
}

object LiveRedisBlSource {
  /** One RESP2 round trip: send `args` as an array of bulk strings, parse
    * the reply (simple string / integer / bulk / array; `-ERR` throws —
    * a protocol error is a failed fetch, handled by the caller's degrade
    * path). This is the complete client the connector needs; recursion
    * depth equals reply nesting (flat for SMEMBERS/ZRANGE).
    */
  private[graft] def command(in: java.io.DataInputStream,
                             out: java.io.OutputStream,
                             args: Seq[String]): Any = {
    val sb = new StringBuilder
    sb.append('*').append(args.length).append("\r\n")
    args.foreach { a =>
      sb.append('$').append(a.getBytes("UTF-8").length).append("\r\n")
        .append(a).append("\r\n")
    }
    out.write(sb.toString.getBytes("UTF-8"))
    out.flush()
    parseReply(in)
  }

  private def readLine(in: java.io.DataInputStream): String = {
    val b = new java.io.ByteArrayOutputStream(32)
    var c = in.read()
    while (c != '\r' && c >= 0) { b.write(c); c = in.read() }
    if (c == '\r') in.read() // consume \n
    new String(b.toByteArray, "UTF-8")
  }

  private def parseReply(in: java.io.DataInputStream): Any = {
    val t = in.read()
    if (t < 0) throw new java.io.EOFException("redis reply truncated")
    val line = readLine(in)
    t.toChar match {
      case '+' => line
      case '-' => throw new java.io.IOException(s"redis error: $line")
      case ':' => line.toLong
      case '$' =>
        val n = line.toInt
        if (n < 0) null
        else {
          val b = new Array[Byte](n)
          in.readFully(b)
          in.read(); in.read() // trailing \r\n
          new String(b, "UTF-8")
        }
      case '*' =>
        val n = line.toInt
        if (n < 0) null else Seq.fill(n)(parseReply(in))
      case other =>
        throw new java.io.IOException(s"unexpected RESP type byte '$other'")
    }
  }
}

/** LIVE ASN-rank feed fetcher (`NERDd/modules/bgp_rank.py:16–83` — the
  * CIRCL BGP Ranking feed — and `eml_asn_rank.py`'s rank CSV): download
  * the whole rank table once per cycle as CSV (`asn,rank` rows; `#`
  * comments and malformed lines skipped, "AS" prefixes tolerated) and
  * serve it as the cycle's broadcast feed — a FEED-shaped live source
  * like [[HttpBlacklistSource]] (one bounded driver-side fetch, feed-sized
  * by nature), in contrast to the per-entity query connectors
  * (PTR/whois/Shodan). Gated off by default (`GRAFT_LIVE_ASN_RANKS=1`);
  * fetch failure degrades to the `fallback` fixture (the previous
  * successful download, operationally), misconfiguration throws — the
  * same error taxonomy as the blacklist fetcher.
  */
final case class HttpAsnRankSource(
    spark: org.apache.spark.sql.SparkSession,
    url: String, rankCol: String, fallback: DataFrame,
    enabled: Boolean = sys.env.get("GRAFT_LIVE_ASN_RANKS").contains("1"),
    timeoutMs: Int = 10000,
    maxBytes: Int = 64 << 20) extends EnrichmentSource {
  val name = "bgp_rank"

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The rank feed: (asn, `rankCol`) — fetched+parsed when live, the
    * fallback fixture otherwise. Fetch transport is shared with
    * [[HttpBlacklistSource]] (same schemes, truncation detection, and
    * degrade rules).
    */
  lazy val ranks: DataFrame =
    HttpBlacklistSource(spark, url, name, fallback, enabled, timeoutMs,
        maxBytes).fetchLines() match {
      case Some(lines) =>
        import spark.implicits._
        val parsed = lines.iterator
          .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
          .flatMap { l =>
            val cols = l.split(',')
            if (cols.length < 2) None
            else for {
              asn <- scala.util.Try(
                cols(0).trim.toUpperCase.stripPrefix("AS").toLong).toOption
              rank <- scala.util.Try(cols(1).trim.toDouble).toOption
            } yield (asn, rank)
          }.toSeq
        log.info(s"asn rank feed: ${parsed.size} rows from $url")
        parsed.toDF("asn", rankCol)
      case None => fallback
    }

  def feeds: Seq[DataFrame] = Seq(ranks)

  def enrich(ipsWithAsn: DataFrame): DataFrame =
    Intel.asnRanks(ipsWithAsn, ranks)
}

/** LIVE Shodan InternetDB connector (`NERDd/modules/shodan.py:30–118`):
  * one HTTP GET per ip against the InternetDB endpoint
  * (`https://internetdb.shodan.io/<ip>` — the unauthenticated bulk-scan
  * api the reference module queries), parsed for the fields the reference
  * stores (`ports[]`, `tags[]`). The reference's three-way answer
  * taxonomy is preserved exactly: 200 upserts ports/tags, **404 is the
  * REMOVAL path** (`shodan.py`'s miss clears stored scan data — a
  * definitive "not scanned" answer, `removed = 1`), and a transport
  * failure is a NO-OP (neither upsert nor removal — a timeout must never
  * clear state). Runs EXECUTOR-side under the deterministic budget cut
  * like the DNS/whois connectors; gated off by default
  * (`GRAFT_LIVE_SHODAN=1`), serving the `fallback` scan-db fixture
  * through [[Intel.shodanEnrich]] unchanged.
  */
final case class LiveShodanSource(
    fallback: DataFrame,
    enabled: Boolean = sys.env.get("GRAFT_LIVE_SHODAN").contains("1"),
    budget: Int = 500,
    baseUrl: String = "https://internetdb.shodan.io",
    timeoutMs: Int = 5000) extends EnrichmentSource {
  val name = "shodan"

  def feeds: Seq[DataFrame] = Seq(fallback)

  def enrich(ips: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    if (!enabled) Intel.shodanEnrich(ips, fallback)
    else {
      val resolved = resolveScan(ips)
      // beyond-budget ips re-attach as no-op rows (not removal — same
      // not-queried-vs-definitive-miss distinction as the PTR connector)
      ips.join(broadcast(resolved.drop("ip")), Seq("entity"), "left")
        .select(col("entity"), col("ip"),
          coalesce(col("ports"), lit("")).as("ports"),
          coalesce(col("n_open"), lit(0L)).as("n_open"),
          coalesce(col("tags"), lit("")).as("tags"),
          coalesce(col("removed"), lit(0L)).as("removed"))
    }
  }

  /** Live-query the budget cut: (entity, ip, ports, n_open, tags,
    * removed). Executor-side, one GET per row; per-partition connections
    * amortize nothing here (HTTP keep-alive is handled by the JVM's
    * connection cache per host, which IS per-executor).
    */
  private[sources] def resolveScan(ips: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = ips.sparkSession
    import spark.implicits._
    val (base, tms) = (baseUrl, timeoutMs)
    ips.orderBy(col("entity")).limit(budget)
      .select(col("entity"), col("ip")).as[(Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (entity, ip) =>
          val r: (Int, String) =
            try {
              val conn = java.net.URI
                .create(s"$base/${LiveWhoisSource.queryName(ip)}")
                .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
              conn.setConnectTimeout(tms)
              conn.setReadTimeout(tms)
              try {
                val code = conn.getResponseCode
                val body =
                  if (code == 200)
                    new String(conn.getInputStream.readNBytes(1 << 20),
                      java.nio.charset.StandardCharsets.UTF_8)
                  else ""
                (code, body)
              } finally conn.disconnect()
            } catch { case scala.util.control.NonFatal(_) => (-1, "") }
          r match {
            case (200, body) =>
              val ports = LiveShodanSource.jsonNumArray(body, "ports")
              val tags = LiveShodanSource.jsonStrArray(body, "tags")
              (entity, ip, ports.mkString(","), ports.length.toLong,
                tags.mkString(","), 0L)
            case (404, _) => (entity, ip, "", 0L, "", 1L) // definitive miss
            case _        => (entity, ip, "", 0L, "", 0L) // transient no-op
          }
        }
      }.toDF("entity", "ip", "ports", "n_open", "tags", "removed")
  }
}

object LiveShodanSource {
  /** Extract a JSON number array field (`"ports": [22, 80]`) without a
    * JSON library dependency — InternetDB's response is a single flat
    * object, and only the two array fields the reference stores are read.
    * Returns elements in document order; absent/empty field → empty.
    */
  private[graft] def jsonNumArray(json: String, field: String): Seq[Long] =
    jsonArrayBody(json, field).toSeq.flatMap(_.split(',').toSeq
      .map(_.trim).filter(_.nonEmpty)
      .flatMap(s => scala.util.Try(s.toLong).toOption))

  /** Extract a JSON string array field (`"tags": ["vpn"]`). */
  private[graft] def jsonStrArray(json: String, field: String): Seq[String] =
    jsonArrayBody(json, field).toSeq.flatMap(_.split(',').toSeq
      .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty))

  private def jsonArrayBody(json: String, field: String): Option[String] = {
    val key = "\"" + field + "\""
    val k = json.indexOf(key)
    if (k < 0) None
    else {
      val open = json.indexOf('[', k + key.length)
      val close = if (open < 0) -1 else json.indexOf(']', open)
      if (open < 0 || close < 0) None
      else Some(json.substring(open + 1, close))
    }
  }
}

/** LIVE whois connector — the reference's highest-value enrichment flow
  * (`NERDd/modules/whois.py:77–549`): a `!NEW` ip queries RIR whois over
  * TCP port 43 (RFC 3912 — one query per connection, by protocol), the
  * record is parsed for the fields the reference extracts (origin ASN,
  * inetnum/NetRange block, netname), and the result drives CROSS-ENTITY
  * record creation: the ip record gains its `asn`/`ipblock` foreign keys
  * and the referenced `asn`/`ipblock` records materialize with
  * ref-counters ([[LiveWhoisSource.crossEntityTasks]] — `whois.py:245–247,
  * 349–355,374` restated as [[graft.fold.EntityFold]] task folds, so
  * record creation and `_ref_cnt` increments ride the SAME op algebra as
  * every other write in the engine).
  *
  * Resolution runs EXECUTOR-side over the deterministic budget cut (the
  * [[LiveDnsPtrSource]] discipline): whois is one short TCP exchange per
  * query, so per-row connections are the protocol, and partition
  * parallelism is the throughput lever. GATED OFF by default
  * (`GRAFT_LIVE_WHOIS=1`), serving the `fallback` parsed-record fixture
  * (`(ip, asn, inetnum, netname)`) through the same join; failure
  * taxonomy: a definitive no-match RESPONSE is an answer (found = 0, the
  * reference's record-less path), a transient failure (timeout, refused)
  * yields the not-queried no-op row — never a spurious removal.
  */
final case class LiveWhoisSource(
    fallback: DataFrame,
    enabled: Boolean = sys.env.get("GRAFT_LIVE_WHOIS").contains("1"),
    budget: Int = 500,
    host: String = "whois.ripe.net", port: Int = 43,
    timeoutMs: Int = 5000) extends EnrichmentSource {
  val name = "whois"

  def feeds: Seq[DataFrame] = Seq(fallback)

  def enrich(ips: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    if (!enabled)
      ips.join(broadcast(fallback), Seq("ip"), "left")
        .select(col("entity"), col("ip"), col("asn"), col("inetnum"),
          col("netname"),
          when(col("netname").isNull, 0L).otherwise(1L).as("found"))
    else {
      val resolved = resolveWhois(ips)
      ips.join(broadcast(resolved.drop("ip")), Seq("entity"), "left")
        .select(col("entity"), col("ip"), col("asn"), col("inetnum"),
          col("netname"), coalesce(col("found"), lit(0L)).as("found"))
    }
  }

  /** Live-resolve the budget cut: (entity, ip, asn, inetnum, netname,
    * found). Executor-side; one TCP exchange per row (RFC 3912).
    */
  private[sources] def resolveWhois(ips: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = ips.sparkSession
    import spark.implicits._
    val (h, p, tms) = (host, port, timeoutMs)
    ips.orderBy(col("entity")).limit(budget)
      .select(col("entity"), col("ip")).as[(Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (entity, ip) =>
          val text =
            try {
              val sock = new java.net.Socket()
              try {
                sock.connect(new java.net.InetSocketAddress(h, p), tms)
                sock.setSoTimeout(tms)
                val outw = sock.getOutputStream
                outw.write((LiveWhoisSource.queryName(ip) + "\r\n")
                  .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
                outw.flush()
                new String(sock.getInputStream.readAllBytes(),
                  java.nio.charset.StandardCharsets.UTF_8)
              } finally sock.close()
            } catch { case scala.util.control.NonFatal(_) => null }
          if (text == null) (entity, ip, None: Option[Long], None: Option[String],
            None: Option[String], 0L) // transient: indistinguishable from
                                      // not-queried, deliberately
          else {
            val (asn, inetnum, netname) = LiveWhoisSource.parseRecord(text)
            (entity, ip, asn, inetnum, netname,
              if (asn.isDefined || inetnum.isDefined || netname.isDefined) 1L
              else 0L)
          }
        }
      }.toDF("entity", "ip", "asn", "inetnum", "netname", "found")
  }
}

object LiveWhoisSource {
  /** Dotted-quad query name for an int ip. */
  def queryName(ip: Long): String =
    s"${(ip >> 24) & 255}.${(ip >> 16) & 255}.${(ip >> 8) & 255}.${ip & 255}"

  /** Parse the RIR `key: value` record for the three fields the reference
    * extracts (`whois.py:306–374`): origin ASN (`origin`/`OriginAS`,
    * "AS"-prefix stripped), the address block (`inetnum`/`NetRange`), and
    * `netname`. Comment lines (`%`, `#`) are skipped — a no-match response
    * is all comments and parses to (None, None, None). First occurrence
    * wins, as the reference takes the first record of a multi-record
    * answer.
    */
  def parseRecord(text: String): (Option[Long], Option[String], Option[String]) = {
    var asn: Option[Long] = None
    var inetnum: Option[String] = None
    var netname: Option[String] = None
    text.linesIterator.foreach { line =>
      val t = line.trim
      if (t.nonEmpty && t.charAt(0) != '%' && t.charAt(0) != '#') {
        val i = t.indexOf(':')
        if (i > 0) {
          val key = t.substring(0, i).trim.toLowerCase
          val v = t.substring(i + 1).trim
          if (v.nonEmpty) key match {
            case "origin" | "originas" if asn.isEmpty =>
              asn = scala.util.Try(
                v.toUpperCase.stripPrefix("AS").trim.toLong).toOption
            case "inetnum" | "netrange" if inetnum.isEmpty =>
              inetnum = Some(v)
            case "netname" if netname.isEmpty => netname = Some(v)
            case _ => ()
          }
        }
      }
    }
    (asn, inetnum, netname)
  }

  /** Start-of-block ip for an `inetnum`/`NetRange` value
    * (`"10.0.0.0 - 10.0.255.255"`): the ipblock entity id.
    */
  def blockStart(inetnum: String): Option[Long] = {
    val s = inetnum.split('-').head.trim
    val parts = s.split('.')
    if (parts.length != 4) None
    else scala.util.Try(parts.map(_.trim.toLong)).toOption
      // per-octet bound (same reason as HttpGeoSource.cidrRange): a
      // malformed "10.0.0.300" must be dropped, not overflow into octet 3
      .filter(_.forall(o => o >= 0 && o <= 255))
      .map(_.reduceLeft((a, b) => (a << 8) | b))
  }

  /** The CROSS-ENTITY record-creation flow (`whois.py:245–247,349–355,374`):
    * from each found whois answer, emit the fold tasks that (a) stamp the
    * `asn`/`ipblock` foreign keys onto the ip record and (b) materialize
    * the referenced `asn` and `ipblock` records with a `_ref_cnt`
    * increment and their names — record creation IS the fold of these
    * tasks, exactly as the reference's `g.um.update` calls enqueue tasks
    * for the other entities rather than writing them directly.
    */
  def crossEntityTasks(resolved: DataFrame)
      : org.apache.spark.sql.Dataset[graft.fold.TypedTask] = {
    import graft.fold.EntityFold
    import graft.ops.UpdateAlgebra._
    val spark = resolved.sparkSession
    import spark.implicits._
    implicit val enc = EntityFold.typedTaskEncoder
    resolved
      .filter(org.apache.spark.sql.functions.col("found") === 1L)
      .select("entity", "ip", "asn", "inetnum", "netname")
      .as[(Long, Long, Option[Long], Option[String], Option[String])]
      .flatMap { case (entity, _, asn, inetnum, netname) =>
        val block = inetnum.flatMap(blockStart)
        val ipOps = asn.map(a => SetVal("asn", a)).toSeq ++
          block.map(b => SetVal("ipblock", b)).toSeq
        val ipTask =
          if (ipOps.isEmpty) Nil
          else Seq(graft.fold.TypedTask("ip", entity, entity, "whois", ipOps))
        val asnTask = asn.map(a =>
          graft.fold.TypedTask("asn", a, entity, "whois",
            Seq(AddNum("_ref_cnt", 1L)))).toSeq
        val blockTask = block.map(b =>
          graft.fold.TypedTask("ipblock", b, entity, "whois",
            AddNum("_ref_cnt", 1L) +:
              netname.map(n => SetVal("name", n)).toSeq)).toSeq
        ipTask ++ asnTask ++ blockTask
      }
  }
}

/** whois RIR delegation boundaries (`whois.py:166–177,220–237`): an as-of
  * join of each fact's ASN against the sorted delegation starts.
  * `boundaries`: (start, rir).
  */
final case class WhoisRirSource(boundaries: DataFrame) extends EnrichmentSource {
  val name = "whois"
  def feeds: Seq[DataFrame] = Seq(boundaries)
  def enrich(factsWithAsn: DataFrame): DataFrame =
    graft.query.AsOf.asOfJoin(factsWithAsn, "asn", boundaries)
}
