package graft.cdc

/** Binary position-cache serde (operator ST1), byte-compatible with the
  * reference's pos file (`/root/reference/src/library/binlog/util.go:11-57`):
  *
  * {{{
  *   [2B little-endian length l = 16 + len(file)]
  *   [8B little-endian pos]
  *   [8B little-endian eventIndex]
  *   [file name bytes]
  * }}}
  *
  * `unpack` mirrors the reference's validation: a header that is too short or
  * longer than the payload yields the zero value ("", 0, 0) instead of
  * throwing (`util.go:51-56`).
  */
object Offsets {

  def packPos(binFile: String, pos: Long, eventIndex: Long): Array[Byte] = {
    val name = binFile.getBytes("UTF-8")
    val l = 16 + name.length
    val r = new Array[Byte](l + 2)
    r(0) = l.toByte
    r(1) = (l >> 8).toByte
    var i = 0
    while (i < 8) { r(2 + i) = (pos >> (8 * i)).toByte; i += 1 }
    i = 0
    while (i < 8) { r(10 + i) = (eventIndex >> (8 * i)).toByte; i += 1 }
    System.arraycopy(name, 0, r, 18, name.length)
    r
  }

  def unpackPos(data: Array[Byte]): (String, Long, Long) = {
    if (data.length < 18) return ("", 0L, 0L)
    def u(b: Byte): Long = b.toLong & 0xFF
    val dl = u(data(0)) | (u(data(1)) << 8)
    val pos = (0 until 8).map(i => u(data(2 + i)) << (8 * i)).reduce(_ | _)
    val idx = (0 until 8).map(i => u(data(10 + i)) << (8 * i)).reduce(_ | _)
    if (dl + 2 < 18 || dl > data.length - 2) ("", 0L, 0L)
    else (new String(data.slice(18, (dl + 2).toInt), "UTF-8"), pos, idx)
  }
}
