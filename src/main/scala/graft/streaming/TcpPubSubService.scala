package graft.streaming

import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.util.concurrent.{ConcurrentHashMap, LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean
import scala.jdk.CollectionConverters._

import graft.cdc.TopicFilter

/** TCP pub/sub sink service (operator K1 + R2/R3 over real sockets), the
  * Spark-side analogue of the reference's subscribe service
  * (`/root/reference/src/services/subscribe/tcp.go:150-190`,
  * `node.go:16-204`):
  *
  *  - clients connect, send `CMD_SET_PRO` frames (flag 0 + topic pattern) to
  *    register topics (trim/lowercase/dedup, acked with "ok");
  *  - every published envelope is offered to every client and delivered iff
  *    any of its patterns matches the event topic (F1 semantics; no topics ⇒
  *    everything);
  *  - per-client bounded async send queue (cap 10000 like `tcpMaxSendQueue`);
  *    a full queue blocks the publisher (the reference busy-waits — we block
  *    on the queue, same backpressure, no spin);
  *  - `CMD_TICK` keepalive is answered with "ok".
  *
  * Scale note: like the reference, this is a single-node push tier fed by the
  * engine — the 100 TB fan-out path is the Kafka-shaped sink; this service
  * exists for protocol/behavior parity and local consumers.
  */
final class TcpPubSubService(port: Int = 0, keepaliveMs: Long = 3000) {

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress("127.0.0.1", port))
  def boundPort: Int = server.getLocalPort

  private val running = new AtomicBoolean(true)
  private val nodes = ConcurrentHashMap.newKeySet[Node]()

  private final class Node(sock: Socket) {
    val topics = new java.util.concurrent.CopyOnWriteArrayList[String]()
    // Patterns compile ONCE, on SET_PRO — never per delivered event. The
    // reference recompiles per event (`groups.go:41-51` via MatchFilters →
    // regexp.MatchString); SURVEY §4 promised strictly better, so the compiled
    // set is cached here and swapped atomically on registration.
    @volatile private var compiled: Array[java.util.regex.Pattern] = Array.empty
    // F1: NO registered filters ⇒ match-all, but an INVALID filter never
    // matches — a node whose only patterns are invalid receives nothing, so
    // "no filters" must be judged on the registered set, not the compiled one.
    @volatile private var hasFilters: Boolean = false
    // A connection that publishes is a data feed, not a subscriber: a
    // filterless publisher would otherwise match every topic and have its own
    // events echoed into its send queue — it never reads, so the queue fills,
    // the blocking put wedges this node's reader thread, and the publish
    // socket stops draining (deterministic deadlock past ~10k envelopes).
    @volatile var isPublisher: Boolean = false
    private val sendQueue = new LinkedBlockingQueue[Array[Byte]](10000)
    private val open = new AtomicBoolean(true)

    def recompile(): Unit = {
      val fs = TopicFilter.normalizeTopics(topics.asScala.toSeq)
      compiled = fs.flatMap(f =>
        scala.util.Try(java.util.regex.Pattern.compile(f)).toOption).toArray
      hasFilters = fs.nonEmpty
    }

    def matches(topic: String): Boolean =
      !hasFilters || compiled.exists(_.matcher(topic).find())

    /** Blocking enqueue: publisher waits when the queue is full
      * (`node.go:84-89` busy-waits; blocking put is the same contract). */
    def asyncSend(data: Array[Byte]): Unit = if (open.get) sendQueue.put(data)

    /** Non-blocking enqueue for liveness frames: one slow subscriber must not
      * stall the shared keepalive thread for every other node; a full queue
      * already implies pending traffic, so dropping the tick loses nothing. */
    def trySend(data: Array[Byte]): Unit = if (open.get) { sendQueue.offer(data); () }

    private val writer = thread(s"pubsub-writer") {
      // A write failure (peer gone without FIN — power loss, NAT drop) must
      // CLOSE the node: an uncaught exception would kill this thread while
      // the node stays registered, its capped queue fills, and every
      // publisher's blocking asyncSend wedges forever on a zombie.
      try {
        while (open.get) {
          val d = sendQueue.poll(100, TimeUnit.MILLISECONDS)
          if (d != null) sock.getOutputStream.write(d)
        }
      } catch { case _: Throwable => () }
      close()
    }

    private val reader = thread(s"pubsub-reader") {
      val re = new Frame.Reassembler
      val buf = new Array[Byte](1024) // reference read buffer size
      try {
        var n = sock.getInputStream.read(buf)
        while (n >= 0 && open.get) {
          re.feed(buf, n).foreach {
            case (Frame.CMD_SET_PRO, payload) if payload.nonEmpty =>
              payload(0) match {
                case Frame.FlagSetPro =>
                  val t = new String(payload.drop(1), "UTF-8").trim.toLowerCase
                  if (t.nonEmpty && !topics.contains(t)) { topics.add(t); recompile() }
                  asyncSend(Frame.pack(Frame.CMD_SET_PRO, "ok"))
                case _ => close()
              }
            case (Frame.CMD_TICK, _) => asyncSend(Frame.pack(Frame.CMD_TICK, "ok"))
            case (Frame.CMD_PUBLISH, payload) =>
              // Publish ingress (executor → push tier): "<topic>\t<json>".
              // The connection is a data feed, not a subscriber — no ack, so
              // a publisher can stream frames without round-trips.
              isPublisher = true
              val msg = new String(payload, "UTF-8")
              val tab = msg.indexOf('\t')
              if (tab > 0) sendAll(msg.substring(0, tab), msg.substring(tab + 1))
            case (cmd, _) =>
              asyncSend(Frame.pack(Frame.CMD_ERROR, s"tcp service does not support cmd: $cmd"))
          }
          n = sock.getInputStream.read(buf)
        }
      } catch { case _: Throwable => () }
      close()
    }

    def close(): Unit = if (open.compareAndSet(true, false)) {
      scala.util.Try(sock.close())
      nodes.remove(this)
      sendQueue.clear() // frees any publisher blocked in put() on a full queue
    }
  }

  private def thread(name: String)(body: => Unit): Thread = {
    val t = new Thread(() => body, name)
    t.setDaemon(true)
    t.start()
    t
  }

  private val acceptor = thread("pubsub-accept") {
    while (running.get && !server.isClosed) {
      try nodes.add(new Node(server.accept()))
      catch { case _: Throwable =>
        // transient accept failure (e.g. EMFILE): back off instead of
        // busy-spinning a core; a closed server socket exits the loop
        if (running.get && !server.isClosed) Thread.sleep(100)
      }
    }
  }

  // Server→client keepalive tick (P3), reference ticks every 3 s
  // (`subscribe/tcp.go:230-245`).
  private val keepalive = thread("pubsub-keepalive") {
    val frame = Frame.pack(Frame.CMD_TICK, "ok")
    while (running.get) {
      Thread.sleep(keepaliveMs)
      nodes.asScala.foreach(n => if (!n.isPublisher) n.trySend(frame))
    }
  }

  /** Publish one envelope: offered to every node, delivered iff its filter
    * set matches (`groups.go:41-51`); payload framed as CMD_EVENT. */
  def sendAll(topic: String, json: String): Unit = {
    val framed = Frame.pack(Frame.CMD_EVENT, json) // serialize/frame once
    nodes.asScala.foreach(n => if (!n.isPublisher && n.matches(topic)) n.asyncSend(framed))
  }

  def connectionCount: Int = nodes.size()

  def stop(): Unit = if (running.compareAndSet(true, false)) {
    scala.util.Try(server.close())
    nodes.asScala.foreach(_.close())
  }
}
