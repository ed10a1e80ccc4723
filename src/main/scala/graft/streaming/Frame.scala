package graft.streaming

import scala.collection.mutable.ArrayBuffer

/** TCP wire frame codec (operator P1), byte-compatible with the reference
  * (`/root/reference/src/library/service/util.go:24-49`):
  *
  * {{{ [4B LE contentLen = payload+2][2B LE cmd][payload] }}}
  *
  * plus the incremental reassembly loop every reader uses
  * (`subscribe/node.go:116-147`).
  */
object Frame {

  // Subscribe-service commands (`src/services/subscribe/config.go:13-23`).
  val CMD_SET_PRO = 0
  val CMD_AUTH = 1
  val CMD_ERROR = 2
  val CMD_TICK = 3
  val CMD_EVENT = 4
  /** GRAFT extension (not in the reference protocol): executor-side publish
    * ingress into the push tier — payload `<topic>\t<envelope-json>`. The
    * reference's push tier is fed in-process by its queue; a distributed
    * engine feeds it over a socket from whichever executor holds the rows. */
  val CMD_PUBLISH = 100

  // Control-service commands (`src/library/control/config.go:11-17`).
  val CTRL_ERROR = 0
  val CTRL_TICK = 1
  val CTRL_STOP = 2
  val CTRL_RELOAD = 3
  val CTRL_SHOW_MEMBERS = 4

  /** First byte of a SET_PRO payload (`subscribe/node.go:149-162`). */
  val FlagSetPro: Byte = 0
  val FlagPing: Byte = 1

  def pack(cmd: Int, msg: Array[Byte]): Array[Byte] = {
    val l = msg.length
    val r = new Array[Byte](l + 6)
    val cl = l + 2
    r(0) = cl.toByte
    r(1) = (cl >> 8).toByte
    r(2) = (cl >> 16).toByte
    r(3) = (cl >> 24).toByte
    r(4) = cmd.toByte
    r(5) = (cmd >> 8).toByte
    System.arraycopy(msg, 0, r, 6, l)
    r
  }

  def pack(cmd: Int, msg: String): Array[Byte] = pack(cmd, msg.getBytes("UTF-8"))

  /** Largest contentLen accepted (256 MiB). Frames carry envelope JSON —
    * orders of magnitude smaller — so a length beyond this is garbage (or an
    * attack): without a bound, clen near Int.MaxValue overflows `clen + 4`
    * to negative, turning the "buffer incomplete" checks into a bogus
    * complete frame with an empty payload and a negative-count buffer
    * remove. The bound keeps all downstream `clen + 4` arithmetic exact. */
  val MaxContentLen: Int = 256 * 1024 * 1024

  /** Smallest legal contentLen (the 2 cmd bytes). A prefix below it (or with
    * the sign bit set, or absurdly large) cannot be a frame: treating it as
    * one would slice a frame end INSIDE the 6-byte header and desynchronize
    * every subsequent frame, or feed a negative length into buffer ops. Fail
    * loudly — the reference likewise drops a connection on garbage rather
    * than guessing. */
  private def checkLen(clen: Int): Unit = {
    require(clen >= 2, s"malformed frame: contentLen $clen (must be >= 2)")
    require(clen <= MaxContentLen,
      s"malformed frame: contentLen $clen exceeds the $MaxContentLen cap")
  }

  /** One-shot unpack; None if the buffer does not yet hold a full frame. */
  def unpack(data: Array[Byte]): Option[(Int, Array[Byte])] = {
    if (data.length < 6) return None
    def u(b: Byte): Int = b & 0xFF
    val clen = u(data(0)) | (u(data(1)) << 8) | (u(data(2)) << 16) | (u(data(3)) << 24)
    checkLen(clen)
    if (data.length < clen + 4) None
    else Some((u(data(4)) | (u(data(5)) << 8), data.slice(6, clen + 4)))
  }

  /** Streaming reassembler: feed arbitrary byte chunks, emit complete frames
    * (`node.go:116-147`'s recvBuf loop). Not thread-safe; one per connection. */
  final class Reassembler {
    private val buf = ArrayBuffer.empty[Byte]

    def feed(chunk: Array[Byte], len: Int = -1): Seq[(Int, Array[Byte])] = {
      buf ++= (if (len < 0) chunk else chunk.take(len))
      val out = Seq.newBuilder[(Int, Array[Byte])]
      var continue = true
      while (continue) {
        if (buf.length < 6) { continue = false }
        else {
          def u(i: Int): Int = buf(i) & 0xFF
          val clen = u(0) | (u(1) << 8) | (u(2) << 16) | (u(3) << 24)
          checkLen(clen)
          if (buf.length < clen + 4) { continue = false }
          else {
            val cmd = u(4) | (u(5) << 8)
            out += ((cmd, buf.slice(6, clen + 4).toArray))
            buf.remove(0, clen + 4)
          }
        }
      }
      out.result()
    }
  }
}
