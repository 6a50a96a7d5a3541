package org.apache.spark.sql.connector.catalog

import org.apache.spark.sql.catalyst.util.{GeneratedColumn, IdentityColumn}
import org.apache.spark.sql.types.{MetadataBuilder, StructType}

/** Minimal bridge to `private[sql]` helpers: Spark's OWN v2-Column →
  * StructType conversion (what persists column DEFAULT values into the
  * StructField metadata `ResolveDefaultColumns` reads back on INSERT),
  * extended to ALSO persist GENERATED ALWAYS AS expressions and
  * IDENTITY specs under the exact metadata keys `GeneratedColumn` /
  * `IdentityColumn` expect — `CatalogV2Util` maps defaults but leaves
  * generation/identity on the [[Column]] object, and a catalog that
  * stores schemas as StructType JSON (this one) needs them in the
  * metadata to survive the commit log. Re-implementing the default
  * mapping would risk drifting from the analyzer across Spark
  * versions; an in-package forwarder cannot. */
object GraftCatalogBridge {
  def v2ColumnsToStructType(columns: Array[Column]): StructType = {
    val base = CatalogV2Util.v2ColumnsToStructType(columns)
    StructType(base.fields.zip(columns).map { case (f, c) =>
      var mb = new MetadataBuilder().withMetadata(f.metadata)
      if (c.generationExpression() != null)
        mb = mb.putString(GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY,
          c.generationExpression())
      val ids = c.identityColumnSpec()
      if (ids != null)
        mb = mb.putLong(IdentityColumn.IDENTITY_INFO_START, ids.getStart)
          .putLong(IdentityColumn.IDENTITY_INFO_STEP, ids.getStep)
          .putBoolean(IdentityColumn.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT,
            ids.isAllowExplicitInsert)
      f.copy(metadata = mb.build())
    })
  }
}
