package graft.sources

import graft.operators.EngineMetrics
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S4 — the RPC fetch stage (etl-rust `docs/extraction.md:3`: "All RPC
  * requests are retried with backoff upon failure"; `src/main.rs:256-272`:
  * one client built once and reused for every request;
  * `docs/environment-variables.md` `ENDPOINT`/`FALLBACK_ENDPOINT`: a
  * second address used when the primary is failing).
  *
  * Spark shape: the index stream partitions across executors (S1/S2), and
  * the fetch is a typed `mapPartitions` — the sanctioned drop out of
  * Column-land, because a network call per row is genuine per-partition
  * imperative logic. One transport is built per partition (the reference's
  * client-per-thread), closed on task completion, and every attempt is
  * metered through [[EngineMetrics]] (the reference's request_count /
  * failed_request_count Prometheus counters).
  *
  * The wire itself is injectable ([[BlockTransport]]): offline tests and
  * the registry query use deterministic synthetic transports; a production
  * deployment supplies an HTTP JSON-RPC implementation with the same
  * contract. Retry policy: linear backoff (sleep k·unit after the k-th
  * failure), bounded at maxRetries per endpoint, then the fallback
  * endpoint gets its own bounded retry loop, then the task fails (Spark
  * task retry + idempotent sinks give at-least-once, same policy as the
  * queue sinks).
  */
trait BlockTransport extends AutoCloseable {
  /** Fetch one block's payload (JSON) from an endpoint. Throws on failure. */
  def fetchBlock(endpoint: String, blockNumber: Long): String
  override def close(): Unit = ()
}

object FetchStage {

  final case class FetchConfig(
      endpoint: String,
      fallbackEndpoint: Option[String] = None,
      maxRetries: Int = 3,
      backoffMillis: Long = 10)

  /** ids(block_number) → (block_number, payload). `transport` is a
    * serializable factory invoked once per partition. */
  def fetchBlocks(
      ids: DataFrame,
      cfg: FetchConfig,
      transport: (() => BlockTransport) with Serializable,
      metrics: Option[EngineMetrics] = None): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("block_number")).as[Long]
      .mapPartitions { it =>
        val t = transport()
        Option(TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => t.close()))
        it.map(bn => (bn, fetchOne(t, cfg, bn, metrics)))
      }
      .toDF("block_number", "payload")
  }

  /** Primary with bounded linear-backoff retry, then fallback likewise. */
  private def fetchOne(t: BlockTransport, cfg: FetchConfig, bn: Long,
      metrics: Option[EngineMetrics]): String = {
    def attemptLoop(endpoint: String): String = {
      var attempt = 0
      while (true) {
        try return metered(metrics)(t.fetchBlock(endpoint, bn))
        catch {
          case e: Throwable =>
            attempt += 1
            if (attempt > cfg.maxRetries) throw e
            Thread.sleep(cfg.backoffMillis * attempt)
        }
      }
      throw new IllegalStateException("unreachable")
    }
    try attemptLoop(cfg.endpoint)
    catch {
      case primary: Throwable =>
        cfg.fallbackEndpoint match {
          case Some(fb) => attemptLoop(fb)
          case None => throw primary
        }
    }
  }

  private def metered[T](metrics: Option[EngineMetrics])(body: => T): T =
    metrics match {
      case Some(m) => m.countRequest(body)
      case None => body
    }

  /** Shared synthetic-chain arithmetic (S1 generator's constants, so
    * every transport's fetch→parse path lands on the same DuckDB
    * oracle). */
  private[sources] def syntheticNTx(bn: Long): Int = ((bn * 2654435761L) % 97 % 7).toInt
  private[sources] def syntheticFee(bn: Long, i: Int): Long =
    ((bn * 31 + i) * 1103515245L + 12345L) % 1000003L

  /** Offline stand-in wire: synthesizes the reference-shaped block JSON
    * deterministically from the block number (same arithmetic as the S1
    * generator, so the fetch→parse path is DuckDB-oracle-verifiable). */
  final class SyntheticRpcTransport extends BlockTransport {
    override def fetchBlock(endpoint: String, bn: Long): String = {
      val txs = (0 until syntheticNTx(bn))
        .map(i => s"""{"fee":${syntheticFee(bn, i)}}""").mkString("[", ",", "]")
      s"""{"block_number":$bn,"txs":$txs}"""
    }
  }

  // ---- REST transport shape (reference Cargo.toml:185-189 REST feature) ----

  /** The wire below a REST transport: one method per HTTP GET the
    * reference's REST source variant would issue — a path-param block
    * resource and a paginated transaction sub-resource
    * (`GET {base}/blocks/{bn}` / `GET {base}/blocks/{bn}/txs?page=&limit=`).
    * Injectable for the same reason [[BlockTransport]] is: tests and the
    * registry run a deterministic synthetic wire; production supplies
    * HTTP. */
  trait RestWire extends AutoCloseable {
    /** `GET {endpoint}/blocks/{bn}` → block header JSON. */
    def getBlock(endpoint: String, bn: Long): String
    /** `GET {endpoint}/blocks/{bn}/txs?page={p}&limit={l}` → JSON array
      * of transactions; fewer than `limit` elements marks the last page. */
    def getTxPage(endpoint: String, bn: Long, page: Int, limit: Int): String
    override def close(): Unit = ()
  }

  /** REST-shaped [[BlockTransport]]: header fetch + tx pagination,
    * re-assembled into the SAME payload contract the JSON-RPC transport
    * returns — so the whole fetch stage (pooling, retry, fallback,
    * metering) and everything downstream is transport-agnostic, exactly
    * how the reference feature-gates RPC vs REST behind one source
    * interface. Pagination loops until a short page; the page walk runs
    * inside the executor task (never on the driver). */
  final class RestBlockTransport(wire: RestWire, pageLimit: Int = 2)
      extends BlockTransport {
    require(pageLimit >= 1, "pageLimit must be >= 1")
    override def fetchBlock(endpoint: String, bn: Long): String = {
      val header = wire.getBlock(endpoint, bn)
      val pages = Iterator.from(0)
        .map(p => jsonArrayElements(wire.getTxPage(endpoint, bn, p, pageLimit)))
      var all = Vector.empty[String]
      var done = false
      while (!done) {
        val page = pages.next()
        all ++= page
        done = page.size < pageLimit
      }
      // splice txs into the header object (header is `{...}`)
      header.dropRight(1) + s""","txs":${all.mkString("[", ",", "]")}}"""
    }
    override def close(): Unit = wire.close()
  }

  /** Split a JSON array's top-level elements by brace/bracket depth —
    * dependency-free and sufficient for API payloads without braces in
    * string literals (the modeled wire shape). */
  private[graft] def jsonArrayElements(arr: String): Vector[String] = {
    val body = arr.trim.stripPrefix("[").stripSuffix("]").trim
    if (body.isEmpty) return Vector.empty
    val out = Vector.newBuilder[String]
    var depth = 0
    var start = 0
    for (i <- body.indices) body(i) match {
      case '{' | '[' => depth += 1
      case '}' | ']' => depth -= 1
      case ',' if depth == 0 => out += body.substring(start, i).trim; start = i + 1
      case _ =>
    }
    out += body.substring(start).trim
    out.result()
  }

  /** Synthetic REST wire: same chain arithmetic, sliced per page. */
  final class SyntheticRestWire extends RestWire {
    override def getBlock(endpoint: String, bn: Long): String =
      s"""{"block_number":$bn}"""
    override def getTxPage(endpoint: String, bn: Long, page: Int, limit: Int): String = {
      val n = syntheticNTx(bn)
      val from = math.min(page * limit, n)
      (from until math.min(n, from + limit))
        .map(i => s"""{"fee":${syntheticFee(bn, i)}}""").mkString("[", ",", "]")
    }
  }

  // ---- gRPC transport shape (reference Cargo.toml:186-189 GRPC /
  // ---- APTOS_GRPC call features; tonic is the wire the reference gates in)

  /** The wire below a gRPC transport: one server-streaming call per
    * block, returning the raw response body — a sequence of gRPC
    * length-prefixed message frames (`[flag:1][len:4 BE][protobuf msg]`,
    * the HTTP/2 DATA framing tonic produces). First message is the block
    * header, each subsequent message one transaction (the Proto3 TxRecord
    * this engine already speaks for its sink payloads). Injectable like
    * [[BlockTransport]]/[[RestWire]]: offline the frames come from a
    * deterministic synthetic server; production supplies a real channel
    * with the same framing contract. */
  trait GrpcWire extends AutoCloseable {
    /** `GetBlock(bn)` server-streaming call → concatenated response frames. */
    def callGetBlock(endpoint: String, bn: Long): Array[Byte]
    override def close(): Unit = ()
  }

  /** Split a gRPC response body into its protobuf messages, validating
    * the framing (flag byte 0 = uncompressed, 4-byte big-endian length).
    * Throws on truncated or compressed frames — a malformed response
    * must surface as a fetch failure so the stage's retry/fallback
    * machinery engages, identical to an HTTP error on the other wires. */
  private[graft] def grpcFrames(body: Array[Byte]): Vector[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    var i = 0
    while (i < body.length) {
      require(i + 5 <= body.length, s"truncated frame header at $i")
      require(body(i) == 0, s"compressed frame unsupported (flag=${body(i)})")
      val len = ((body(i + 1) & 0xff) << 24) | ((body(i + 2) & 0xff) << 16) |
        ((body(i + 3) & 0xff) << 8) | (body(i + 4) & 0xff)
      require(i + 5 + len <= body.length, s"truncated frame body at $i (len=$len)")
      out += java.util.Arrays.copyOfRange(body, i + 5, i + 5 + len)
      i += 5 + len
    }
    out.result()
  }

  /** Prefix one protobuf message with gRPC framing. */
  private[graft] def grpcFrame(msg: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + msg.length)
    out(1) = (msg.length >>> 24).toByte; out(2) = (msg.length >>> 16).toByte
    out(3) = (msg.length >>> 8).toByte; out(4) = msg.length.toByte
    System.arraycopy(msg, 0, out, 5, msg.length)
    out
  }

  /** gRPC-shaped [[BlockTransport]]: one streaming call per block, frames
    * decoded with the engine's Proto3 codec and reassembled into the SAME
    * payload contract the JSON-RPC and REST transports return — the whole
    * fetch stage (pooling, retry, fallback, metering) stays
    * transport-agnostic, exactly how the reference feature-gates
    * RPC/REST/GRPC behind one source interface. Frame walk and decode run
    * inside the executor task. */
  final class GrpcBlockTransport(wire: GrpcWire) extends BlockTransport {
    override def fetchBlock(endpoint: String, bn: Long): String = {
      val frames = grpcFrames(wire.callGetBlock(endpoint, bn))
      require(frames.nonEmpty, "empty gRPC response (missing header frame)")
      val header = graft.functions.Proto3.decodeTx(frames.head)
      require(header._1 == bn, s"header block ${header._1} != requested $bn")
      val txs = frames.tail
        .map(f => s"""{"fee":${graft.functions.Proto3.decodeTx(f)._3}}""")
        .mkString("[", ",", "]")
      s"""{"block_number":$bn,"txs":$txs}"""
    }
    override def close(): Unit = wire.close()
  }

  /** Synthetic gRPC server: same chain arithmetic, emitted as framed
    * proto3 messages (header then one TxRecord per tx). */
  final class SyntheticGrpcWire extends GrpcWire {
    override def callGetBlock(endpoint: String, bn: Long): Array[Byte] = {
      import graft.functions.Proto3.encodeTx
      val empty = Array.emptyByteArray
      val frames = Iterator.single(encodeTx(bn, 0L, 0L, empty)) ++
        (0 until syntheticNTx(bn)).iterator
          .map(i => encodeTx(bn, i.toLong, syntheticFee(bn, i), empty))
      frames.map(grpcFrame).reduceLeft(_ ++ _)
    }
  }

  /** S4 registry query: fetch a block range through the full stage
    * (pooled transport, retry policy, metering), parse payloads with
    * from_json, fan transactions out, aggregate — the same values the S1
    * arithmetic generator produces, so q29's oracle shape verifies the
    * fetch→deserialize path end-to-end. */
  def q63FetchStage(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val ids = s.range(0L, 2000L).toDF("block_number")
    val fetched = fetchBlocks(ids,
      FetchConfig("synthetic://primary", Some("synthetic://fallback")),
      new (() => BlockTransport) with Serializable {
        def apply(): BlockTransport = new SyntheticRpcTransport
      })
    fetched
      .withColumn("parsed", from_json(col("payload"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "block_number BIGINT, txs ARRAY<STRUCT<fee: BIGINT>>")))
      .select(col("block_number"), explode(col("parsed.txs")).as("tx"))
      .groupBy((col("block_number") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_txs"),
        countDistinct(col("block_number")).as("n_blocks"),
        sum(col("tx.fee")).cast("long").as("total_fees"))
      .orderBy(col("bucket"))
  }

  /** S4 through the gRPC transport: the SAME fetch stage and downstream
    * parse/fan-out/aggregate as q63, with the wire swapped to framed
    * proto3 streaming — the oracle is q63's, so the hash gate proves the
    * three transports are interchangeable end-to-end, not just in specs. */
  def q120GrpcFetch(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val ids = s.range(0L, 2000L).toDF("block_number")
    val fetched = fetchBlocks(ids,
      FetchConfig("grpc://primary", Some("grpc://fallback")),
      new (() => BlockTransport) with Serializable {
        def apply(): BlockTransport = new GrpcBlockTransport(new SyntheticGrpcWire)
      })
    fetched
      .withColumn("parsed", from_json(col("payload"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "block_number BIGINT, txs ARRAY<STRUCT<fee: BIGINT>>")))
      .select(col("block_number"), explode(col("parsed.txs")).as("tx"))
      .groupBy((col("block_number") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_txs"),
        countDistinct(col("block_number")).as("n_blocks"),
        sum(col("tx.fee")).cast("long").as("total_fees"))
      .orderBy(col("bucket"))
  }

  val q63Sql: String =
    """SELECT block_number % 10 AS bucket, COUNT(*) AS n_txs,
      |  COUNT(DISTINCT block_number) AS n_blocks,
      |  CAST(SUM(fee) AS BIGINT) AS total_fees
      |FROM (
      |  SELECT block_number,
      |    ((block_number * 31 + tx_i) * 1103515245 + 12345) % 1000003 AS fee
      |  FROM (
      |    SELECT block_number,
      |      unnest(range(0, (block_number * 2654435761) % 97 % 7)) AS tx_i
      |    FROM range(0, 2000) t(block_number)))
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
