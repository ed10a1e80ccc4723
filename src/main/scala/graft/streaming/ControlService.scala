package graft.streaming

import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.util.concurrent.atomic.AtomicBoolean

/** Control-plane service (operator P2): stop / reload / status over a
  * localhost TCP socket speaking the frame codec, mirroring
  * `/root/reference/src/library/control/control.go:10-66` + `node.go:96-113`:
  * `CTRL_STOP` invokes the stop hook and acks "ok"; `CTRL_RELOAD <name>`
  * invokes the reload hook for that service; `CTRL_SHOW_MEMBERS` returns the
  * status text (for us: the active Spark streaming queries). */
final class ControlService(port: Int = 0,
                           onStop: () => Unit,
                           onReload: String => Unit,
                           members: () => String) {

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress("127.0.0.1", port))
  def boundPort: Int = server.getLocalPort
  private val running = new AtomicBoolean(true)

  private val acceptor = {
    val t = new Thread(() => {
      while (running.get && !server.isClosed) {
        try {
          val sock = server.accept()
          handle(sock)
        } catch { case _: Throwable =>
          // transient accept failure (e.g. fd exhaustion): back off rather
          // than busy-spin a core; a closed server socket ends the loop
          if (running.get && !server.isClosed) Thread.sleep(100)
        }
      }
    }, "control-accept")
    t.setDaemon(true)
    t.start()
    t
  }

  private def handle(sock: Socket): Unit = {
    val t = new Thread(() => {
      val re = new Frame.Reassembler
      val buf = new Array[Byte](1024)
      try {
        var n = sock.getInputStream.read(buf)
        while (n >= 0 && running.get) {
          re.feed(buf, n).foreach {
            case (Frame.CTRL_STOP, _) =>
              sock.getOutputStream.write(Frame.pack(Frame.CTRL_STOP, "ok"))
              onStop()
            case (Frame.CTRL_RELOAD, payload) =>
              onReload(new String(payload, "UTF-8"))
              sock.getOutputStream.write(Frame.pack(Frame.CTRL_RELOAD, "ok"))
            case (Frame.CTRL_SHOW_MEMBERS, _) =>
              sock.getOutputStream.write(Frame.pack(Frame.CTRL_SHOW_MEMBERS, members()))
            case (cmd, _) =>
              sock.getOutputStream.write(
                Frame.pack(Frame.CTRL_ERROR, s"unknown cmd: $cmd"))
          }
          n = sock.getInputStream.read(buf)
        }
      } catch { case _: Throwable => () }
      scala.util.Try(sock.close())
    }, "control-node")
    t.setDaemon(true)
    t.start()
  }

  def stop(): Unit = if (running.compareAndSet(true, false)) scala.util.Try(server.close())
}

/** CLI-side client (`control/client.go:16-60`). */
object ControlClient {
  def send(port: Int, cmd: Int, payload: String = "",
           timeoutMs: Int = 10000): (Int, String) = {
    val sock = new Socket("127.0.0.1", port)
    try {
      // bounded read: a server that accepts but never answers (a deadlocked
      // reload hook) must time the CLI out, not hang it forever
      sock.setSoTimeout(timeoutMs)
      sock.getOutputStream.write(Frame.pack(cmd, payload))
      sock.getOutputStream.flush()
      val re = new Frame.Reassembler
      val buf = new Array[Byte](1024)
      var res: Option[(Int, Array[Byte])] = None
      while (res.isEmpty) {
        val n = sock.getInputStream.read(buf)
        if (n < 0) throw new java.io.EOFException("control server closed")
        res = re.feed(buf, n).headOption
      }
      (res.get._1, new String(res.get._2, "UTF-8"))
    } finally sock.close()
  }

  def stop(port: Int): String = send(port, Frame.CTRL_STOP)._2
  def reload(port: Int, service: String): String = send(port, Frame.CTRL_RELOAD, service)._2
  def showMembers(port: Int): String = send(port, Frame.CTRL_SHOW_MEMBERS)._2
}
