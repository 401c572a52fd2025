package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.engine.WireEncoder

/**
 * Reply-encoder contracts that the oracle gates cannot see from the
 * outside: the non-verbose batch-delete tally source, protojson's
 * int64-as-string form, and uuid-vs-plain id encoding.
 */
class WireEncoderSpec extends SparkSpecBase {

  test("batchDeleteReply: non-verbose tally comes from matches, not the id list") {
    // a non-verbose caller never collects ids — the tally must not be 0
    val jv = JsonMethods.parse(WireEncoder.batchDeleteReply(37, Nil, verbose = false))
    assert((jv \ "matches") == JString("37"))
    assert((jv \ "successful") == JString("37"))
    assert((jv \ "failed") == JString("0"))
    assert((jv \ "objects") == JNothing)
  }

  test("batchDeleteReply: verbose objects carry uuid bytes for uuid ids, strings otherwise") {
    val uuid = "00000000-0000-4000-8000-000000000007"
    val jv = JsonMethods.parse(
      WireEncoder.batchDeleteReply(2, Seq(uuid, "42"), verbose = true))
    val objs = (jv \ "objects").asInstanceOf[JArray].arr
    // uuid id → 16 raw bytes base64'd (uuid.MarshalBinary)
    val b = java.util.Base64.getDecoder.decode((objs(0) \ "uuid").values.toString)
    val bb = java.nio.ByteBuffer.wrap(b)
    assert(new java.util.UUID(bb.getLong, bb.getLong).toString == uuid)
    // numeric id (engine divergence) → plain string
    assert((objs(1) \ "uuid") == JString("42"))
    assert(objs.forall(o => (o \ "successful") == JBool(true) && (o \ "error") == JString("")))
  }
}
