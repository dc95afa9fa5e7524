package graft.sources

import java.util
import graft.pipeline.{HttpSource, Model}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 face of the offline capture source (SURVEY.md §2.1 S1–S3):
  *
  *   spark.read.format("graft-fixture")
  *     .option("provider", "sec_edgar")
  *     .option("root", "src/test/resources/fixtures")
  *     .option("fixtures", "submissions.json,artifact.htm")
  *     .load()
  *
  * Yields one CapturedResponse-shaped row per fixture, read inside the
  * executor partition (one partition per fixture — each "request" is an
  * independent unit of fetch work, which is exactly how the live source
  * parallelizes by host). The mapPartitions form in `pipeline.HttpSource`
  * remains the workhorse; this provider demonstrates the engine's DSv2
  * integration tier and gives `spark.read.format(...)` ergonomics for
  * ad-hoc capture inspection.
  */
class FixtureDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-fixture"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FixtureDataSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FixtureTable(
      properties.getOrDefault("provider", "sec_edgar"),
      properties.getOrDefault("root", "src/test/resources/fixtures"),
      properties.getOrDefault("fixtures", "").split(",").map(_.trim).filter(_.nonEmpty))
}

object FixtureDataSource {
  val schema: StructType = StructType(Seq(
    StructField("provider", StringType, nullable = false),
    StructField("fixture_name", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("status_code", IntegerType, nullable = false),
    StructField("headers_json", StringType, nullable = true),
    StructField("body", BinaryType, nullable = true)))
}

private[sources] class FixtureTable(
    provider: String, root: String, fixtures: Array[String])
    extends Table with SupportsRead {

  override def name(): String = s"graft-fixture:$provider"
  override def schema(): StructType = FixtureDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = FixtureDataSource.schema
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          fixtures.map(f => FixturePartition(provider, root, f): InputPartition)
        override def createReaderFactory(): PartitionReaderFactory =
          new FixtureReaderFactory
      }
    }
}

private[sources] case class FixturePartition(
    provider: String, root: String, fixture: String) extends InputPartition

private[sources] class FixtureReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FixturePartition]
    new PartitionReader[InternalRow] {
      private var consumed = false
      override def next(): Boolean = !consumed
      override def get(): InternalRow = {
        consumed = true
        val req = Model.FetchRequest(p.provider, 0, "metadata", "GET",
          s"fixture://${p.provider}/${p.fixture}", null, p.fixture)
        val fetched = HttpSource.offlineFetch(p.root, req)
        InternalRow(
          UTF8String.fromString(fetched.provider),
          UTF8String.fromString(p.fixture),
          UTF8String.fromString(fetched.url),
          fetched.status_code,
          UTF8String.fromString(fetched.headers_json),
          fetched.body)
      }
      override def close(): Unit = ()
    }
  }
}
