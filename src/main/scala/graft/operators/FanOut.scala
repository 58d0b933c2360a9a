package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T2 — block→tables fan-out transform, and T3 — derived-entity
  * extraction (etl-rust `docs/etl-infrastructure-architecture.md:13`,
  * `docs/extraction.md:9`).
  *
  * One nested block record becomes N records across child tables: the
  * blocks row itself, one transactions row per element of `txs`, one
  * account-reference row per account pubkey. Declarative `explode`s keep
  * Catalyst in charge (column pruning reaches the scan; no shuffle is
  * introduced by the fan-out itself — children inherit the parent's
  * partitioning).
  *
  * Invariants (spec-enforced): row-count conservation — each child table
  * has exactly Σ size(nested field) rows; the blocks table has one row
  * per input block.
  */
object FanOut {

  import graft.functions.ProtoDescriptor
  import org.apache.spark.sql.types.{ArrayType, StructType}

  /** The per-table DataFrames produced from one nested blocks input. */
  final case class TableSet(blocks: DataFrame, transactions: DataFrame, accountRefs: DataFrame) {
    def asMap: Map[String, DataFrame] =
      Map("blocks" -> blocks, "transactions" -> transactions, "account_refs" -> accountRefs)
  }

  /** The engine's block-record TREE descriptor: nesting, field names,
    * and repetition all come from the checked-in .proto (the reference
    * compiles the same nested per-chain .proto through prost —
    * docs/protobuf.md:3-8, src/example_config/build_proto.rs:216-322).
    * [[tables]] is a projection of [[fromDescriptor]] over this, so a
    * user adding a chain profile edits ONE descriptor file and gets the
    * whole fan-out table tree derived mechanically. */
  val descriptor: ProtoDescriptor.Message =
    ProtoDescriptor.load("/graft/block_record.proto")("BlockRecord")

  private def snake(n: String): String =
    n.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase

  private def singular(n: String): String =
    if (n.length > 1 && n.endsWith("s")) n.dropRight(1) else n + "_value"

  /** Descriptor-driven fan-out: walk a record-tree [[ProtoDescriptor
    * .Message]] and derive one child DataFrame per repeated field —
    * mechanically, with no hand-written schema:
    *
    *   - the root message becomes table `snake(message name)` holding
    *     its non-repeated fields plus `n_<field>` counts for each
    *     repeated field;
    *   - each repeated MESSAGE field `r` becomes table `r.name`: all
    *     ancestor non-repeated fields + the child's non-repeated fields
    *     + counts of the child's own repeated fields (recursing);
    *   - each repeated SCALAR field `l` becomes table `l.name` with the
    *     ancestors' fields + one value column named `singular(l.name)`.
    *
    * Shapes are validated against the input DataFrame (a repeated
    * descriptor field must be an array column, a message field a struct
    * with the declared child fields) so a descriptor/DataFrame drift
    * fails loudly at plan time, not with silent mis-fanned rows.
    * Declarative explodes keep Catalyst in charge — column pruning
    * reaches the scan and the fan-out introduces no shuffle. */
  def fromDescriptor(nested: DataFrame,
      root: ProtoDescriptor.Message): Map[String, DataFrame] = {
    def validate(df: DataFrame, m: ProtoDescriptor.Message): Unit = {
      val bySchema = df.schema.fields.map(f => f.name -> f.dataType).toMap
      m.fields.foreach { f =>
        val dt = bySchema.getOrElse(f.name, throw new IllegalArgumentException(
          s"descriptor field '${f.name}' of message ${m.name} missing from " +
            s"input columns ${df.columns.mkString("[", ",", "]")}"))
        (f.repeated, dt) match {
          case (true, ArrayType(el, _)) =>
            f.message.foreach { cm =>
              el match {
                case st: StructType =>
                  val have = st.fieldNames.toSet
                  val miss = cm.fields.map(_.name).filterNot(have)
                  require(miss.isEmpty, s"repeated message field '${f.name}': " +
                    s"element struct lacks declared fields ${miss.mkString(",")}")
                case other => throw new IllegalArgumentException(
                  s"repeated message field '${f.name}' has non-struct elements: $other")
              }
            }
          case (true, other) => throw new IllegalArgumentException(
            s"repeated descriptor field '${f.name}' is not an array column: $other")
          case (false, _) => () // physical scalar type mapping documented in .proto
        }
      }
    }
    def walk(df: DataFrame, m: ProtoDescriptor.Message, tableName: String,
        inherited: Seq[String]): Map[String, DataFrame] = {
      validate(df, m)
      val carried = m.fields.filterNot(_.repeated).map(_.name)
      val clash = carried.toSet.intersect(inherited.toSet)
      require(clash.isEmpty,
        s"message ${m.name}: fields ${clash.mkString(",")} collide with ancestors")
      val repMsg = m.fields.filter(f => f.repeated && f.message.isDefined)
      val repLeaf = m.fields.filter(f => f.repeated && f.message.isEmpty)
      val keyCols = (inherited ++ carried).map(col)
      val self = df.select(keyCols ++
        (repMsg ++ repLeaf).map(f => size(col(f.name)).as(s"n_${f.name}")): _*)
      val childTables = repMsg.flatMap { f =>
        val cm = f.message.get
        val flat = df
          .select(keyCols :+ explode(col(f.name)).as("_x"): _*)
          .select((inherited ++ carried).map(col) ++
            cm.fields.map(cf => col(s"_x.${cf.name}").as(cf.name)): _*)
        walk(flat, cm, f.name, inherited ++ carried)
      }
      val leafTables = repLeaf.map { f =>
        f.name -> df.select(keyCols :+
          explode(col(f.name)).as(singular(f.name)): _*)
      }
      val all = Map(tableName -> self) ++ childTables ++ leafTables
      require(all.size == 1 + childTables.size + leafTables.size,
        s"fan-out table names collide under message ${m.name}")
      all
    }
    walk(nested, root, snake(root.name), Nil)
  }

  /** Fan a nested blocks DF (schema of BlockSources.blockRange) out into
    * child tables — a projection of the DESCRIPTOR-derived tree (the
    * .proto is the single schema source; see [[fromDescriptor]]).
    * Callers writing all tables should `.persist()` the input first so
    * the scan/fetch runs once (K8 pattern — see FanOutWriter). */
  def tables(nestedBlocks: DataFrame): TableSet = {
    val t = fromDescriptor(nestedBlocks, descriptor)
    val blocks = t("block_record").select(
      col("block_number"), col("block_time"), col("n_txs").as("tx_count"))
    val transactions = t("txs").select(
      col("block_number"), col("block_time"), col("tx_id"), col("fee"),
      col("n_accounts"))
    val accountRefs = t("accounts").select(
      col("block_number"), col("tx_id"), col("account"))
    TableSet(blocks, transactions, accountRefs)
  }

  /** T3: derived-entity keys — the distinct accounts referenced by a batch
    * of blocks, feeding a second-stage keyed fetch/join
    * (`call_getMultipleAccounts` over the collected pubkeys,
    * docs/extraction.md:9). Scale: distinct is the one shuffle here and
    * shrinks data before the expensive external lookup — same reason the
    * reference batches pubkeys. */
  def derivedAccounts(nestedBlocks: DataFrame): DataFrame =
    tables(nestedBlocks).accountRefs.select(col("account")).distinct()

  /** Second stage of T3: enrich derived keys against a keyed service or
    * dimension table (the external account store). Broadcast when the key
    * set is small; otherwise a shuffle join on `account`. */
  def enrichAccounts(derived: DataFrame, accountStore: DataFrame, storeKey: Column): DataFrame =
    derived.join(accountStore, derived("account") === storeKey, "left_outer")
}
