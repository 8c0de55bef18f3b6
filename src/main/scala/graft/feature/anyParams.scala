package graft.feature

import org.apache.spark.ml.param.{Param, Params}
import org.json4s._
import org.json4s.jackson.JsonMethods.{compact, parse, render}

/** JSON codec for heterogeneous gather keys (String or numeric `Any`).
  * Values carry a type tag so persistence round-trips restore the exact
  * runtime type — the encoder's key lookup is typed equality (`1L` is not
  * `"1"`), so an untagged rendering would silently break loaded models.
  */
private[graft] object AnyJson {

  def encode(v: Any): JValue = v match {
    case null       => JObject("t" -> JString("null"))
    case s: String  => JObject("t" -> JString("str"), "v" -> JString(s))
    case b: Boolean => JObject("t" -> JString("bool"), "v" -> JBool(b))
    case i: Int     => JObject("t" -> JString("int"), "v" -> JString(i.toString))
    case l: Long    => JObject("t" -> JString("long"), "v" -> JString(l.toString))
    case s: Short   => JObject("t" -> JString("short"), "v" -> JString(s.toString))
    case f: Float   => JObject("t" -> JString("float"), "v" -> JString(f.toString))
    case d: Double  => JObject("t" -> JString("double"), "v" -> JString(d.toString))
    case other => throw new IllegalArgumentException(
      s"Unsupported key type for persistence: ${other.getClass.getName}")
  }

  def decode(j: JValue): Any = {
    val fields = j.asInstanceOf[JObject].obj.toMap
    def s = fields("v").asInstanceOf[JString].s
    fields("t").asInstanceOf[JString].s match {
      case "null"   => null
      case "str"    => s
      case "bool"   => fields("v").asInstanceOf[JBool].value
      case "int"    => s.toInt
      case "long"   => s.toLong
      case "short"  => s.toShort
      case "float"  => s.toFloat
      case "double" => s.toDouble
    }
  }
}

/** `Param[Array[Any]]` with a typed JSON codec (default `Param.jsonEncode`
  * rejects non-String/Vector types). Order-preserving — gather key order IS
  * the feature index order.
  */
class AnyArrayParam(parent: Params, name: String, doc: String)
    extends Param[Array[Any]](parent, name, doc) {

  override def jsonEncode(value: Array[Any]): String =
    compact(render(JArray(value.map(AnyJson.encode).toList)))

  override def jsonDecode(json: String): Array[Any] = parse(json) match {
    case JArray(vs) => vs.map(AnyJson.decode).toArray
    case other => throw new IllegalArgumentException(s"Expected JSON array, got $other")
  }
}

/** `Param[Set[Any]]` with a typed JSON codec; elements are sorted by their
  * rendered form so the persisted file is deterministic.
  */
class AnySetParam(parent: Params, name: String, doc: String)
    extends Param[Set[Any]](parent, name, doc) {

  override def jsonEncode(value: Set[Any]): String =
    compact(render(JArray(
      value.toList.sortBy(String.valueOf).map(AnyJson.encode))))

  override def jsonDecode(json: String): Set[Any] = parse(json) match {
    case JArray(vs) => vs.map(AnyJson.decode).toSet
    case other => throw new IllegalArgumentException(s"Expected JSON array, got $other")
  }
}
