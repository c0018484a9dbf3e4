package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** NERD's scalar-function surface (SURVEY §2.9) as pure Column expressions —
  * every one stays inside whole-stage codegen (no UDFs).
  */
object Funcs {

  /** Dotted-quad → int (reference `common/utils.py:9–13` `ipstr2int`). */
  def ipstr2int(ip: Column): Column = {
    val p = split(ip, "\\.")
    p.getItem(0).cast("long") * 16777216L +
      p.getItem(1).cast("long") * 65536L +
      p.getItem(2).cast("long") * 256L +
      p.getItem(3).cast("long")
  }

  /** Int → dotted-quad (reference `common/utils.py:15–18` `int2ipstr`). */
  def int2ipstr(ip: Column): Column =
    concat_ws(".",
      shiftright(ip, 24).bitwiseAND(255),
      shiftright(ip, 16).bitwiseAND(255),
      shiftright(ip, 8).bitwiseAND(255),
      ip.bitwiseAND(255))

  /** /24 prefix of an int IP (reference `NERDd/fmp_updater.py:224–226`). */
  def int2ipprefix24(ip: Column): Column = ip.bitwiseAND(0xFFFFFF00L)

  /** Label-reversed hostname — the reference STORES hostnames reversed so
    * suffix search becomes a range scan (`core/mongodb.py:91–93,116–117`);
    * columnar storage makes the trick unnecessary (`endswith` pushes down),
    * but the function itself is part of the API surface, and doubles as the
    * DNSBL v4 octet reversal (`modules/dnsbl.py:73–79`).
    */
  def reverseLabels(host: Column): Column =
    array_join(reverse(split(host, "\\.")), ".")

  /** Hostname suffix predicate (`NERDweb/nerd_main.py:990–993` does this as
    * a reversed-string range scan).
    */
  def hasSuffix(host: Column, suffix: String): Column = host.endsWith(suffix)

  /** Approximate substring match (reference
    * `common/threat_categorization.py:187–195` `match_str`): ignore case,
    * `_`, `.`, `-`, and surrounding whitespace, then containment.
    */
  private def simplify(c: Column): Column = translate(lower(trim(c)), "_.-", "")
  def matchStr(needle: Column, haystack: Column): Column =
    simplify(haystack).contains(simplify(needle))

  /** `next_step` scheduling arithmetic (reference
    * `NERDd/core/update_manager.py:174–179`): smallest `base + k·step`
    * strictly greater than `minimum`.
    */
  def nextStep(base: Column, minimum: Column, step: Column): Column =
    base + (floor((minimum - base).cast("double") / step) + 1) * step

  /** Node-name pseudonymization (reference `NERDweb/nerd_main.py:398–402`
    * hashes node names for non-privileged users).
    */
  def pseudonymize(name: Column): Column = sha2(name, 256)

  /** Category-string normalization (reference `warden_receiver.py:507`:
    * `'+'.join(categories).replace('.', '')`).
    */
  def normalizeCategories(cats: Column): Column =
    translate(array_join(cats, "+"), ".", "")

  /** Reserved/special-use IPv4 ranges (reference
    * `modules/reserved_ip.py:14–74` keeps a prefix list + regexes over the
    * dotted quad; on an int IP they are pure range predicates — no regex
    * needed, fully codegen'd and row-group-prunable).
    */
  val ReservedRanges: Seq[(String, Long, Long)] = Seq(
    ("this-net", 0L, 16777215L),                  // 0.0.0.0/8
    ("private-10", 167772160L, 184549375L),       // 10.0.0.0/8
    ("cgn", 1681915904L, 1686110207L),            // 100.64.0.0/10
    ("loopback", 2130706432L, 2147483647L),       // 127.0.0.0/8
    ("link-local", 2851995648L, 2852061183L),     // 169.254.0.0/16
    ("private-172", 2886729728L, 2887778303L),    // 172.16.0.0/12
    ("private-192", 3232235520L, 3232301055L),    // 192.168.0.0/16
    ("benchmark", 3323068416L, 3323199487L),      // 198.18.0.0/15
    ("multicast", 3758096384L, 4026531839L),      // 224.0.0.0/4
    ("reserved-240", 4026531840L, 4294967295L))   // 240.0.0.0/4

  /** The matched reserved-range name, or null for globally routable IPs. */
  def reservedRange(ip: Column): Column =
    ReservedRanges.foldRight(lit(null).cast("string")) { case ((name, lo, hi), acc) =>
      when(ip.between(lo, hi), lit(name)).otherwise(acc)
    }

  /** Hostname classification (reference `modules/hostname.py:56–121`):
    * walk a suffix→class dict (longest suffix wins by evaluation order) and
    * flag hostnames embedding their IP's octets (the reference's "ip in
    * hostname" heuristic: ≥50% of octets appear in the name).
    */
  def hostnameClass(host: Column, suffixClasses: Seq[(String, String)]): Column =
    suffixClasses.foldRight(lit(null).cast("string")) { case ((suffix, cls), acc) =>
      when(host.endsWith(suffix), lit(cls)).otherwise(acc)
    }

  /** Regex tag rules (`modules/hostname.py:103–115` + the
    * `hostname_tagging.regex_tagging` config pairs): unlike the suffix walk
    * (first hit wins), EVERY matching regex contributes its tag, in rule
    * order, deduplicated. `rlike` is a search (Python `re.search`), not a
    * full match.
    */
  def hostnameRegexTags(host: Column, rules: Seq[(String, String)]): Column =
    array_distinct(filter(
      array(rules.map { case (re, tag) => when(host.rlike(re), lit(tag)) }: _*),
      x => x.isNotNull))

  def ipInHostname(host: Column, ip: Column): Column = {
    val octets = Seq(
      shiftright(ip, 24).bitwiseAND(255),
      shiftright(ip, 16).bitwiseAND(255),
      shiftright(ip, 8).bitwiseAND(255),
      ip.bitwiseAND(255))
    val hits = octets.map(o => when(host.contains(o.cast("string")), 1).otherwise(0))
      .reduce(_ + _)
    hits >= 2 // >= 50% of the 4 octets
  }
}
