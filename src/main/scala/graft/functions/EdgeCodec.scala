package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

/** Application-edge codecs — the two wire formats SURVEY §2.9 scopes to the
  * external boundary, implemented for completeness so a reference user can
  * move the boundary too:
  *
  *  - the task-queue JSON type envelope (`common/task_queue.py:84–113`):
  *    datetimes travel as `{"$datetime": "%Y-%m-%dT%H:%M:%S.%f"}` (naive
  *    UTC by policy), timedeltas as `{"$timedelta": "days,seconds,micros"}`.
  *    Inside the engine both are plain numbers (epoch/duration micros);
  *    these functions (un)wrap at parse/render time.
  *
  *  - the bulk-reputation binary format (`NERDweb/nerd_main.py:2427–2468`):
  *    requests carry big-endian 4-byte IPs (`struct.unpack('!I')`),
  *    responses native-order packed doubles (`struct.pack('d')` — little
  *    endian on the reference's x86 deployment).
  */
object EdgeCodec {

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  // ---- $datetime / $timedelta envelope ----

  /** Envelope → epoch MICROSECONDS (UTC, naive per reference policy). */
  def parseDatetime(s: String): Long = {
    val dt = LocalDateTime.parse(s, fmt)
    dt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + dt.getNano / 1000L
  }

  /** Epoch microseconds → the envelope's datetime string. */
  def renderDatetime(epochMicros: Long): String = {
    val secs = Math.floorDiv(epochMicros, 1000000L)
    val micros = Math.floorMod(epochMicros, 1000000L)
    LocalDateTime.ofEpochSecond(secs, micros.toInt * 1000, java.time.ZoneOffset.UTC)
      .format(fmt)
  }

  /** `"days,seconds,microseconds"` → total microseconds. */
  def parseTimedelta(s: String): Long = {
    val Array(d, sec, us) = s.split(",").map(_.trim.toLong)
    (d * 86400L + sec) * 1000000L + us
  }

  /** Total microseconds → the envelope's `"days,seconds,micros"` triple
    * (normalized like Python's timedelta: seconds in [0, 86400)).
    */
  def renderTimedelta(totalMicros: Long): String = {
    val us = Math.floorMod(totalMicros, 1000000L)
    val totalSecs = Math.floorDiv(totalMicros, 1000000L)
    val d = Math.floorDiv(totalSecs, 86400L)
    val sec = Math.floorMod(totalSecs, 86400L)
    s"$d,$sec,$us"
  }

  /** Recursively strip envelopes from a parsed JSON tree: any object whose
    * single special key is `$datetime`/`$timedelta` becomes a numeric node
    * (epoch/duration micros) — `conv_from_json`'s object hook. Feed the
    * result to `TaskCodec.parse`/`parseRec` for envelope-bearing wire input.
    */
  def stripEnvelopes(n: JsonNode): JsonNode = n match {
    case o: ObjectNode if o.has("$datetime") =>
      o.numberNode(parseDatetime(o.get("$datetime").asText()))
    case o: ObjectNode if o.has("$timedelta") =>
      o.numberNode(parseTimedelta(o.get("$timedelta").asText()))
    case o: ObjectNode =>
      val it = o.fieldNames()
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) names += it.next()
      names.foreach(f => o.set[JsonNode](f, stripEnvelopes(o.get(f))))
      o
    case a: com.fasterxml.jackson.databind.node.ArrayNode =>
      (0 until a.size()).foreach(i => a.set(i, stripEnvelopes(a.get(i))))
      a
    case other => other
  }

  // ---- bulk-API binary IP / double codec ----

  /** Concatenated big-endian 4-byte addresses → int IPs (`unpack('!I')`). */
  def unpackIps(payload: Array[Byte]): Array[Long] = {
    require(payload.length % 4 == 0, s"payload not a multiple of 4: ${payload.length}")
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
    Array.fill(payload.length / 4)(buf.getInt() & 0xffffffffL)
  }

  /** Int IPs → the request wire format. The wire is 4 bytes per address by
    * protocol (IPv4), so an out-of-range id would otherwise wrap SILENTLY
    * to a different address — fail loudly instead.
    */
  def packIps(ips: Array[Long]): Array[Byte] = {
    require(ips.forall(ip => ip >= 0L && ip <= 0xffffffffL),
      "bulk request ids must fit the 4-byte IPv4 wire format")
    val buf = ByteBuffer.allocate(ips.length * 4).order(ByteOrder.BIG_ENDIAN)
    ips.foreach(ip => buf.putInt((ip & 0xffffffffL).toInt))
    buf.array()
  }

  /** Reputation doubles → packed native-order response (`pack('d')`). */
  def packDoubles(vals: Array[Double]): Array[Byte] = {
    val buf = ByteBuffer.allocate(vals.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    vals.foreach(buf.putDouble)
    buf.array()
  }

  def unpackDoubles(payload: Array[Byte]): Array[Double] = {
    require(payload.length % 8 == 0, s"payload not a multiple of 8: ${payload.length}")
    val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(payload.length / 8)(buf.getDouble())
  }
}
