package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the testdata schemas documented in FIXTURES.md §A. If the driver
  * regenerates testdata with different shapes in a later round, this
  * fails first with a readable diff instead of 59 queries failing
  * obscurely. (events.ts is asserted POST-normalization — Tables.events
  * converts the nanos BIGINT to TimestampType.) */
class SchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val expected = Map(
    "region" -> "r_regionkey:int,r_name:string",
    "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
    "customer" -> "c_custkey:bigint,c_name:string,c_nationkey:int,c_acctbal:double,c_mktsegment:string",
    "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
    "part" -> "p_partkey:bigint,p_name:string,p_brand:string,p_type:string,p_size:int,p_retailprice:double",
    "orders" -> "o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string",
    "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double," +
      "l_returnflag:string,l_linestatus:string,l_shipdate:timestamp_ntz"),
    "events" -> "event_id:bigint,ts:timestamp,user_id:bigint,event_type:string,value:double,props:string",
    "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
    "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int")

  test("all 10 testdata tables match the FIXTURES.md schema contract") {
    val diffs = expected.toSeq.sortBy(_._1).flatMap { case (name, want) =>
      val df =
        if (name == "events") Tables.events(spark, TestSpark.sfDir)
        else Tables.load(spark, TestSpark.sfDir, name)
      val got = df.schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
      if (got != want) Some(s"$name:\n  want $want\n  got  $got") else None
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }
}
