package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Funcs

/** Threat-intel receivers and enrichment callables (SURVEY §2.1 / §2.10):
  * the reference's network-bound pollers (MISP, OTX, Redis blacklists, DNSBL,
  * Shodan, passive DNS, CIRCL BGP rank) re-expressed as broadcast joins
  * against feed tables. The live-lookup transports are an application-edge
  * concern; the ENGINE surface is the join shape + the update semantics each
  * feed applies to the entity record (upserts, 404-removals, TTL tokens,
  * daily budgets), which is exactly what these operators implement.
  */
object Intel {

  /** MISP + OTX receiver summary (reference `NERDd/misp_receiver.py:265–345`,
    * `NERDd/otx_receiver.py:152–174`): each feed row is an
    * `array_upsert misp_events {misp_instance, event_id}` / `otx_pulses`
    * analog; relationally the per-entity record fragment is one groupBy with
    * distinct-pulse sets and sighting counts. `misp` rows carry
    * (entity, pulse_id, day); `otx` rows carry (entity, pulse_id).
    * Output: entity, n_misp_events, n_sightings, misp_ids (sorted CSV),
    * last_misp_day, n_otx_pulses, visibility (the detail-page count,
    * `nerd_main.py:1159–1171` analog).
    */
  def threatIntelSummary(misp: DataFrame, otx: DataFrame): DataFrame = {
    val m = misp.groupBy(col("entity")).agg(
      size(collect_set(col("pulse_id"))).cast("long").as("n_misp_events"),
      count(lit(1)).as("n_sightings"),
      array_join(transform(sort_array(collect_set(col("pulse_id"))),
        _.cast("string")), ",").as("misp_ids"),
      max(col("day")).as("last_misp_day"))
    val o = otx.groupBy(col("entity")).agg(
      size(collect_set(col("pulse_id"))).cast("long").as("n_otx_pulses"))
    m.join(o, Seq("entity"), "full_outer")
      .na.fill(0L, Seq("n_misp_events", "n_sightings", "n_otx_pulses"))
      .na.fill("", Seq("misp_ids"))
      .withColumn("visibility", col("n_misp_events") + col("n_otx_pulses"))
  }

  /** Redis-cached blacklist reader (reference `NERDd/modules/redis_bl.py:28–61`
    * + loader `scripts/blacklists2redis.py`): plain lists are ip-set
    * membership (`bl:<id>:list`), prefix lists are sorted-set INTERVAL
    * membership (`pbl:<id>` begin/end entries scored by int IP). Both become
    * broadcast joins — an equi-join for the sets, a range join for the
    * prefixes — unioned into one per-entity hit list.
    * `setLists`: (bl_id, ip); `prefixLists`: (bl_id, first, last).
    */
  def redisBlHits(ips: DataFrame, setLists: DataFrame, prefixLists: DataFrame): DataFrame = {
    val setHits = ips.join(broadcast(setLists), Seq("ip"))
      .select(col("entity"), col("ip"), col("bl_id"))
    val prefixHits = ips.join(broadcast(prefixLists),
        col("ip").between(col("first"), col("last")))
      .select(col("entity"), col("ip"), col("bl_id"))
    setHits.unionByName(prefixHits)
      .groupBy(col("entity"), col("ip"))
      .agg(
        array_join(sort_array(collect_set(col("bl_id"))), ",").as("bl_hits"),
        size(collect_set(col("bl_id"))).cast("long").as("n_hits"))
  }

  /** Watched-blacklist membership rows — the materialization the FMP
    * updater's one-hots read (`NERDd/fmp_updater.py:371–382` consumes the
    * record's `bl[]` array, which the blacklist module filled from exactly
    * these set/prefix feeds). Same join shapes as [[redisBlHits]] but emitting
    * one (entity, bl_id) row per hit, un-aggregated, so consumers choose
    * their own shape (one-hot pivot, set collection, counts).
    */
  def blMembership(ips: DataFrame, setLists: DataFrame, prefixLists: DataFrame): DataFrame = {
    val setHits = ips.join(broadcast(setLists), Seq("ip"))
      .select(col("entity"), col("bl_id"))
    val prefixHits = ips.join(broadcast(prefixLists),
        col("ip").between(col("first"), col("last")))
      .select(col("entity"), col("bl_id"))
    setHits.unionByName(prefixHits)
  }

  /** DNSBL lookups (reference `NERDd/modules/dnsbl.py:73–86,89–249`): the
    * query name is the octet-reversed IP prefixed to the zone; the daily
    * request budget (`dnsbl.max_requests`, 150k/day) caps how many entities
    * are queried per cycle — a global ORDER BY/LIMIT, the scalable form of
    * the reference's counter. Un-queried entities keep `queried = 0` and an
    * empty listing. `zoneLists`: (zone, ip).
    */
  def dnsblLookups(ips: DataFrame, zoneLists: DataFrame, zoneSuffix: String,
                   budget: Int): DataFrame = {
    val queried = ips.orderBy(col("entity")).limit(budget)
    val hits = queried.join(broadcast(zoneLists), Seq("ip"))
      .groupBy(col("entity"))
      .agg(array_join(sort_array(collect_set(col("zone"))), ",").as("zones"),
        size(collect_set(col("zone"))).cast("long").as("n_listed"))
    ips
      .join(queried.select(col("entity"), lit(1).as("queried")), Seq("entity"), "left")
      .join(hits, Seq("entity"), "left")
      .select(col("entity"), col("ip"),
        concat(Funcs.reverseLabels(Funcs.int2ipstr(col("ip"))), lit("." + zoneSuffix)).as("qname"),
        coalesce(col("queried"), lit(0)).cast("long").as("queried"),
        coalesce(col("zones"), lit("")).as("zones"),
        coalesce(col("n_listed"), lit(0L)).as("n_listed"))
  }

  /** DNSBL lookups against a ZONE FILE keyed by the reversed query name —
    * the reference protocol shape (`NERDd/modules/dnsbl.py:73–86`: a lookup
    * resolves `<reversed-octets>.<zone>.<suffix>`; the zone's records ARE
    * those names). Unlike [[dnsblLookups]] (which joins the fixture on the
    * raw ip and only REPORTS the qname), here the octet reversal is
    * LOAD-BEARING: the engine constructs each probe name with
    * `reverseLabels(int2ipstr(ip))` and equi-joins it against the zone
    * records' `name` column — a wrong reversal finds nothing. Same daily
    * budget semantics. `zoneRecords`: (zone, name) — the record names as the
    * zone publishes them; `zones`: the configured zone list (tiny, exploded
    * per queried ip like the reference's per-zone query loop).
    * Output: (entity, ip, queried, zones, n_listed).
    */
  def dnsblZoneLookups(ips: DataFrame, zoneRecords: DataFrame,
                       zones: Seq[String], zoneSuffix: String,
                       budget: Int): DataFrame = {
    val queried = ips.orderBy(col("entity")).limit(budget)
    val probes = queried
      .withColumn("zone", explode(array(zones.map(lit): _*)))
      .withColumn("qname", concat(
        Funcs.reverseLabels(Funcs.int2ipstr(col("ip"))),
        lit("."), col("zone"), lit("." + zoneSuffix)))
    val hits = probes
      .join(broadcast(zoneRecords), probes("qname") === zoneRecords("name"))
      .groupBy(probes("entity"))
      .agg(array_join(sort_array(collect_set(probes("zone"))), ",").as("zones"),
        size(collect_set(probes("zone"))).cast("long").as("n_listed"))
    ips
      .join(queried.select(col("entity"), lit(1).as("queried")), Seq("entity"), "left")
      .join(hits, Seq("entity"), "left")
      .select(col("entity"), col("ip"),
        coalesce(col("queried"), lit(0)).cast("long").as("queried"),
        coalesce(col("zones"), lit("")).as("zones"),
        coalesce(col("n_listed"), lit(0L)).as("n_listed"))
  }

  /** Shodan InternetDB enrichment (reference `NERDd/modules/shodan.py:30–118`):
    * broadcast left join against the scan-db table; a hit upserts
    * `shodan.{ports,tags}`, a miss is the 404 path which REMOVES any stored
    * shodan subrecord (`removed = 1`). `scanDb`: (ip, ports CSV, tags CSV).
    */
  def shodanEnrich(ips: DataFrame, scanDb: DataFrame): DataFrame =
    ips.join(broadcast(scanDb), Seq("ip"), "left")
      .select(col("entity"), col("ip"),
        coalesce(col("ports"), lit("")).as("ports"),
        when(col("ports").isNotNull,
          size(split(col("ports"), ",")).cast("long")).otherwise(0L).as("n_open"),
        coalesce(col("tags"), lit("")).as("tags"),
        when(col("ports").isNull, 1L).otherwise(0L).as("removed"))

  /** Passive DNS + domain blacklists (reference
    * `NERDd/modules/passive_dns.py:34–144`): resolve the entity's domains
    * (fixture column), match each against the domain-blacklist suffix table,
    * emit `dbl[]` upserts. `dblSuffixes`: (suffix, dbl_id).
    */
  def pdnsDomainBl(domains: DataFrame, dblSuffixes: Seq[(String, String)]): DataFrame = {
    val hits = dblSuffixes.map { case (suffix, id) =>
      when(col("domain").endsWith(suffix), lit(id))
    }
    domains
      .withColumn("dbl_arr", filter(array(hits: _*), h => h.isNotNull))
      .select(col("entity"), col("domain"),
        array_join(sort_array(col("dbl_arr")), ",").as("dbl"),
        size(col("dbl_arr")).cast("long").as("n_dbl"))
  }

  /** ASN-level rank enrichment (reference `NERDd/modules/bgp_rank.py:16–83`
    * CIRCL BGP rank + `modules/eml_asn_rank.py:11–67`): group the ip records
    * by ASN, broadcast-join the rank feed. `ranks`: (asn, bgprank, eml_rank).
    */
  def asnRanks(ipsWithAsn: DataFrame, ranks: DataFrame): DataFrame =
    ipsWithAsn.groupBy(col("asn"))
      .agg(count(lit(1)).as("n_ips"))
      .join(broadcast(ranks), Seq("asn"), "left")

  /** Geolocation enrichment (reference `NERDd/modules/geolocation.py`):
    * broadcast join against a MaxMind-style db keyed by `gk`.
    * `geoDb`: (gk, ctry, city, tz).
    */
  def geoEnrich(keyed: DataFrame, geoDb: DataFrame): DataFrame =
    keyed.join(broadcast(geoDb), Seq("gk"))
      .select(col("entity"), col("ctry"), col("city"), col("tz"))

  /** DNS PTR enrichment (reference `NERDd/modules/dns.py:27–77`): broadcast
    * left join against the resolver table; a miss is the NXDOMAIN path,
    * which REMOVES any stored hostname. `ptrDb`: (ip, hostname).
    */
  def ptrEnrich(ips: DataFrame, ptrDb: DataFrame): DataFrame =
    ips.join(broadcast(ptrDb), Seq("ip"), "left")
      .select(col("entity"), col("ip"),
        coalesce(col("hostname"), lit("")).as("hostname"),
        when(col("hostname").isNull, 1L).otherwise(0L).as("nxdomain"))
}
