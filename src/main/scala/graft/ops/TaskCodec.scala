package graft.ops

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import UpdateAlgebra._

/** JSON wire codec for update tasks, mirroring the reference wire format
  * (`common/task_queue.py:203–216`; FIXTURES.md §3): ops are JSON arrays
  * `["op", "key", params...]`, weak ops prefix the op name with `"*"`.
  * Datetimes travel as epoch seconds (the reference's `$datetime` envelope is
  * an external-boundary concern; see SURVEY §2.9).
  *
  * Uses Jackson (already on Spark's classpath) — one parse per task at ingest,
  * the same cost profile as the reference's JSON task queue.
  */
object TaskCodec {
  private val mapper = new ObjectMapper()

  private def value(n: JsonNode): Any = {
    if (n == null || n.isNull) null
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else if (n.isTextual) n.asText()
    else if (n.isArray) {
      val b = mutable.ArrayBuffer.empty[Any]
      n.elements().asScala.foreach(e => b += value(e))
      b
    } else if (n.isObject) {
      val r = newRec()
      n.fields().asScala.foreach(e => r.update(e.getKey, value(e.getValue)))
      r
    } else throw new IllegalArgumentException(s"unsupported JSON node: $n")
  }

  private def queryPairs(n: JsonNode): Seq[(String, Any)] =
    n.fields().asScala.map(e => e.getKey -> value(e.getValue)).toSeq

  private def seqOf(n: JsonNode): Seq[Any] =
    n.elements().asScala.map(value).toSeq

  private def op(n: JsonNode): UpdateOp = {
    val arr = n.asInstanceOf[ArrayNode]
    val rawName = arr.get(0).asText()
    val weak = rawName.startsWith("*")
    val name = if (weak) rawName.substring(1) else rawName
    val key = arr.get(1).asText()
    name match {
      case "set"          => SetVal(key, value(arr.get(2)), weak)
      case "append"       => Append(key, value(arr.get(2)), weak)
      case "add_to_set"   => AddToSet(key, value(arr.get(2)), weak)
      case "extend_set"   => ExtendSet(key, seqOf(arr.get(2)), weak)
      case "rem_from_set" => RemFromSet(key, seqOf(arr.get(2)), weak)
      case "add"          => AddNum(key, value(arr.get(2)), weak)
      case "sub"          => SubNum(key, value(arr.get(2)), weak)
      case "setmax"       => SetMax(key, value(arr.get(2)), weak)
      case "setmin"       => SetMin(key, value(arr.get(2)), weak)
      case "remove"       => RemoveKey(key, weak)
      case "next_step"    => NextStep(key, arr.get(2).asText(), arr.get(3).asLong(), arr.get(4).asLong(), weak)
      case "array_update" => ArrayUpdate(key, queryPairs(arr.get(2)), arr.get(3).elements().asScala.map(op).toSeq, weak)
      case "array_upsert" => ArrayUpsert(key, queryPairs(arr.get(2)), arr.get(3).elements().asScala.map(op).toSeq, weak)
      case "array_remove" => ArrayRemove(key, queryPairs(arr.get(2)), weak)
      case "event"        => Event(key, weak)
      case other          => throw new IllegalArgumentException(s"unknown op: $other")
    }
  }

  /** Parse a JSON op list into the typed algebra. */
  def parse(json: String): Seq[UpdateOp] = {
    val root = mapper.readTree(json)
    root.elements().asScala.map(op).toSeq
  }

  /** Parse wire input that may carry the reference's `$datetime`/`$timedelta`
    * type envelopes (`common/task_queue.py:100–113`): envelopes collapse to
    * epoch/duration-microsecond numbers before op conversion.
    */
  def parseExternal(json: String): Seq[UpdateOp] = {
    val root = graft.functions.EdgeCodec.stripEnvelopes(mapper.readTree(json))
    root.elements().asScala.map(op).toSeq
  }

  /** Parse a JSON object into a dynamic record (snapshot deserialization). */
  def parseRec(json: String): Rec = value(mapper.readTree(json)) match {
    case r: Rec @unchecked if r.isInstanceOf[mutable.LinkedHashMap[_, _]] => r
    case other => throw new IllegalArgumentException(s"snapshot json was not an object: $other")
  }

  // ---- render (for producing wire-format tasks) ----

  private def writeValue(v: Any): JsonNode = v match {
    case null               => mapper.nullNode()
    case l: Long            => mapper.getNodeFactory.numberNode(l)
    case i: Int             => mapper.getNodeFactory.numberNode(i.toLong)
    case d: Double          => mapper.getNodeFactory.numberNode(d)
    case b: Boolean         => mapper.getNodeFactory.booleanNode(b)
    case s: String          => mapper.getNodeFactory.textNode(s)
    case seq: scala.collection.Seq[_] =>
      val a = mapper.createArrayNode(); seq.foreach(x => a.add(writeValue(x))); a
    case m: scala.collection.Map[_, _] =>
      val o = mapper.createObjectNode()
      m.foreach { case (k, x) => o.set[JsonNode](k.toString, writeValue(x)) }
      o
    case other => throw new IllegalArgumentException(s"unsupported value: $other")
  }

  private def writeOp(o: UpdateOp): ArrayNode = {
    val a = mapper.createArrayNode()
    def name(n: String) = a.add(if (o.weak) "*" + n else n)
    o match {
      case SetVal(k, v, _)      => name("set"); a.add(k); a.add(writeValue(v))
      case Append(k, v, _)      => name("append"); a.add(k); a.add(writeValue(v))
      case AddToSet(k, v, _)    => name("add_to_set"); a.add(k); a.add(writeValue(v))
      case ExtendSet(k, v, _)   => name("extend_set"); a.add(k); a.add(writeValue(v))
      case RemFromSet(k, v, _)  => name("rem_from_set"); a.add(k); a.add(writeValue(v))
      case AddNum(k, v, _)      => name("add"); a.add(k); a.add(writeValue(v))
      case SubNum(k, v, _)      => name("sub"); a.add(k); a.add(writeValue(v))
      case SetMax(k, v, _)      => name("setmax"); a.add(k); a.add(writeValue(v))
      case SetMin(k, v, _)      => name("setmin"); a.add(k); a.add(writeValue(v))
      case RemoveKey(k, _)      => name("remove"); a.add(k)
      case NextStep(k, kb, mn, st, _) => name("next_step"); a.add(k); a.add(kb); a.add(mn); a.add(st)
      case ArrayUpdate(k, q, acts, _) =>
        name("array_update"); a.add(k); a.add(writeValue(mutable.LinkedHashMap(q: _*)))
        val inner = mapper.createArrayNode(); acts.foreach(x => inner.add(writeOp(x))); a.add(inner)
      case ArrayUpsert(k, q, acts, _) =>
        name("array_upsert"); a.add(k); a.add(writeValue(mutable.LinkedHashMap(q: _*)))
        val inner = mapper.createArrayNode(); acts.foreach(x => inner.add(writeOp(x))); a.add(inner)
      case ArrayRemove(k, q, _) =>
        name("array_remove"); a.add(k); a.add(writeValue(mutable.LinkedHashMap(q: _*)))
      case Event(k, _)          => name("event"); a.add(k)
    }
    a
  }

  /** Render an op list to the JSON wire format. */
  def render(ops: Seq[UpdateOp]): String = {
    val a = mapper.createArrayNode()
    ops.foreach(o => a.add(writeOp(o)))
    mapper.writeValueAsString(a)
  }

  /** Serialize a folded record to JSON (deterministic key order = insertion
    * order) — the snapshot persistence format for dynamic-schema fields.
    */
  def recToJson(rec: Rec): String = mapper.writeValueAsString(writeValue(rec))
}
