package graft.queries

import org.apache.spark.sql.functions._

/** Multimodal-column plumbing exercised as a query (north star): treat
  * content as an opaque binary column, extract typed metadata
  * deterministically. The full typed decode pipeline (schema, batch
  * shape, stubbed decoders) lives in [[graft.multimodal.Multimodal]];
  * this query proves the binary column path end-to-end against the
  * oracle using text bytes as stand-in payloads.
  */
object MultimodalQueries {
  import Q._

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q34_binary_meta",
      (s, d) => {
        t(s, d, "documents")
          .select(
            col("doc_id"),
            octet_length(col("text")).cast("long").as("byte_len"),
            lower(hex(substring(col("text"), 1, 4).cast("binary"))).as("head_hex"),
            lower(hex(expr(
              "CAST(substring(text, CAST(floor(length(text)/2) AS INT), 4) AS BINARY)")))
              .as("mid_hex"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |  lower(hex(encode(substring(text, 1, 4)))) AS head_hex,
             |  lower(hex(encode(substring(text,
             |    CAST(floor(length(text)/2) AS INT), 4)))) AS mid_hex
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
