package graft

import org.apache.spark.SparkConf
import org.apache.spark.serializer.KryoSerializer
import org.scalatest.funsuite.AnyFunSuite

import graft.fold.TypedTask
import graft.ops.UpdateAlgebra._

/** Pins [[GraftKryoRegistrator]]: the typed op-algebra shuffle depends on the
  * registered class set staying CLOSED over the `UpdateOp` ADT — an op class
  * added to the ADT but not the registrator silently reverts that op to
  * name-per-record serialization (the exact shuffle bloat the registrator
  * exists to remove).
  */
class KryoRegistratorSpec extends AnyFunSuite {

  private def sparkKryo = {
    val conf = new SparkConf(false)
      .set("spark.kryo.registrator", "graft.GraftKryoRegistrator")
    new KryoSerializer(conf).newInstance()
  }

  test("every concrete UpdateOp subclass is registered") {
    val kryo = new com.esotericsoftware.kryo.Kryo()
    new GraftKryoRegistrator().registerClasses(kryo)
    val mirror = scala.reflect.runtime.currentMirror
    val subclasses = scala.reflect.runtime.universe
      .typeOf[UpdateOp].typeSymbol.asClass.knownDirectSubclasses
    assert(subclasses.nonEmpty, "sealed-trait reflection returned no subclasses")
    subclasses.foreach { sym =>
      val cls = mirror.runtimeClass(sym.asClass)
      val reg = kryo.getClassResolver.getRegistration(cls)
      assert(reg != null, s"UpdateOp subclass not Kryo-registered: ${cls.getName}")
    }
    assert(kryo.getClassResolver.getRegistration(classOf[TypedTask]) != null)
  }

  test("a representative TypedTask round-trips through Spark's KryoSerializer") {
    val ser = sparkKryo
    val task = TypedTask("ip", 42L, 7L, "warden", Seq(
      SetVal("rep", 0.5),
      AddToSet("tags", "scanner", weak = true),
      ExtendSet("bl", Seq("a", "b")),
      NextStep("_nru1d", "ts_added", 100L, 86400L),
      ArrayUpsert("events", Seq("date" -> "2026-08-12", "cat" -> "Test"),
        Seq(AddNum("n", 3L))),
      Event("!DELETE")))
    val back = ser.deserialize[TypedTask](ser.serialize(task))
    assert(back === task)
  }
}
