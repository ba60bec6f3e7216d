package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic dedup/similarity fixtures over the driver test
  * tables. The raw `documents`/`embeddings` tables contain no
  * duplicates (all 500 texts distinct at sf0.01), so — like the diff
  * fixtures in [[Tables]] — duplicate and near-duplicate corpora are
  * constructed in-engine, expressible identically in the DuckDB
  * oracle SQL.
  */
object Corpus {

  /** documents ∪ exact copies (doc_id % 7, id + 1,000,000) ∪ near-dup
    * copies with a 4-token tail appended (doc_id % 11, id + 2,000,000).
    */
  def docCorpus(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.unionByName(
      d.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
      .unionByName(
        d.filter(col("doc_id") % 11 === 0)
          .withColumn("doc_id", col("doc_id") + 2000000L)
          .withColumn("text", concat(col("text"), lit(" near dup extra tail"))))
  }

  val docCorpusSql: String =
    """SELECT doc_id, text, lang, source, n_chars FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000, text, lang, source, n_chars
      |FROM documents WHERE doc_id % 7 = 0
      |UNION ALL
      |SELECT doc_id + 2000000, text || ' near dup extra tail', lang, source, n_chars
      |FROM documents WHERE doc_id % 11 = 0""".stripMargin

  /** [[docCorpus]] ∪ a HOT GROUP: `copies` verbatim copies of the
    * lowest-doc_id document (ids 3,000,000+g). Identical texts have
    * identical minhash signatures, so the group lands in ONE (band,
    * bkey) bucket in EVERY band — the boilerplate-template skew shape
    * that makes an uncapped LSH band self-join quadratic. Fixture for
    * the hot-band star dial (`minhashPairs(maxDocsPerBand)`).
    */
  def hotCorpus(spark: SparkSession, dir: String, copies: Int = 40): DataFrame = {
    val seed = Tables.documents(spark, dir)
      .orderBy("doc_id").limit(1)
      .select("text", "lang", "source", "n_chars")
    docCorpus(spark, dir).unionByName(
      spark.range(copies.toLong)
        .select((col("id") + 3000000L).as("doc_id"))
        .crossJoin(seed)
        .select("doc_id", "text", "lang", "source", "n_chars"))
  }

  def hotCorpusSql(copies: Int = 40): String =
    s"""$docCorpusSql
       |UNION ALL
       |SELECT 3000000 + g.g AS doc_id, h.text, h.lang, h.source, h.n_chars
       |FROM (SELECT text, lang, source, n_chars FROM documents
       |      ORDER BY doc_id LIMIT 1) h
       |CROSS JOIN (SELECT range AS g FROM range(0, $copies)) g""".stripMargin

  /** documents with planted cross-doc token spans for the
    * repeated-span detector: every doc with doc_id % 13 == 0 gets the
    * FIRST 20 tokens of doc_id+1's text appended — so the pair
    * (13m, 13m+1) shares a verbatim ≥20-token span (shorter if the
    * partner has fewer tokens), sitting at the end of one doc and the
    * start of the other. Raw texts are otherwise distinct, so planted
    * spans dominate the output.
    */
  def spanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select("doc_id", "text")
    val p = d.select((col("doc_id") - 1).as("doc_id"), col("text").as("p_text"))
    d.join(p, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        when(
          col("doc_id") % 13 === 0 && col("p_text").isNotNull,
          concat_ws(
            " ",
            col("text"),
            concat_ws(" ", slice(expr("split(trim(p_text), '\\\\s+')"), 1, 20))))
          .otherwise(col("text"))
          .as("text"))
  }

  val spanCorpusSql: String =
    """SELECT d.doc_id,
      |  CASE WHEN d.doc_id % 13 = 0 AND p.text IS NOT NULL
      |       THEN d.text || ' ' || array_to_string(list_slice(string_split_regex(trim(p.text), '\s+'), 1, 20), ' ')
      |       ELSE d.text END AS text
      |FROM documents d LEFT JOIN documents p ON p.doc_id = d.doc_id + 1""".stripMargin

  /** documents re-laid-out as MULTI-LINE texts for the
    * paragraph-dedup operator: each doc's words are chunked into
    * 10-word lines joined by `\n`, and every doc with
    * doc_id % 13 == 0 gets the FIRST LINE of doc_id+1's chunked text
    * appended as an extra line — a verbatim cross-doc duplicate
    * paragraph. Because chunking is identical everywhere, the planted
    * line in doc 13m is exactly line 0 of doc 13m+1, and the
    * first-occurrence-wins rule resolves it by (doc_id, pos): the
    * APPENDED copy (smaller doc_id) survives, the partner's first
    * line drops.
    */
  def paraCorpus(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select("doc_id", "source", "text")
    val p = d.select((col("doc_id") - 1).as("doc_id"), col("text").as("p_text"))
    def linesOf(t: String): String =
      s"""array_join(transform(
         |  sequence(0, cast(ceil(size(split($t, ' ')) / 10.0) as int) - 1),
         |  i -> array_join(slice(split($t, ' '), i * 10 + 1, 10), ' ')), '\\n')""".stripMargin
    def firstLineOf(t: String): String =
      s"array_join(slice(split($t, ' '), 1, 10), ' ')"
    d.join(p, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("source"),
        when(
          col("doc_id") % 13 === 0 && col("p_text").isNotNull,
          concat(expr(linesOf("text")), lit("\n"), expr(firstLineOf("p_text"))))
          .otherwise(expr(linesOf("text")))
          .as("text"))
  }

  val paraCorpusSql: String = {
    def linesOf(t: String): String =
      s"""array_to_string(list_transform(
         |  range(0, CAST(ceil(len(string_split($t, ' ')) / 10.0) AS INT)),
         |  i -> array_to_string(list_slice(string_split($t, ' '), i * 10 + 1, i * 10 + 10), ' ')), chr(10))""".stripMargin
    def firstLineOf(t: String): String =
      s"array_to_string(list_slice(string_split($t, ' '), 1, 10), ' ')"
    s"""SELECT d.doc_id, d.source,
       |  CASE WHEN d.doc_id % 13 = 0 AND p.text IS NOT NULL
       |       THEN ${linesOf("d.text")} || chr(10) || ${firstLineOf("p.text")}
       |       ELSE ${linesOf("d.text")} END AS text
       |FROM documents d LEFT JOIN documents p ON p.doc_id = d.doc_id + 1""".stripMargin
  }

  /** embeddings ∪ scaled copies (vec_id % 17, id + 100,000, embedding
    * × 1.001f — cosine-identical up to float rounding, so they read
    * as near-duplicates under cosine ≥ 0.999).
    */
  def embCorpus(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    e.unionByName(
      e.filter(col("vec_id") % 17 === 0)
        .withColumn("vec_id", col("vec_id") + 100000L)
        .withColumn(
          "embedding",
          expr("transform(embedding, x -> x * cast(1.001 as float))")))
  }

  val embCorpusSql: String =
    """SELECT vec_id, embedding, label FROM embeddings
      |UNION ALL
      |SELECT vec_id + 100000, list_transform(embedding, x -> x * 1.001::FLOAT), label
      |FROM embeddings WHERE vec_id % 17 = 0""".stripMargin

  /** embeddings ∪ a HOT EMBEDDING SPIKE: `copies` verbatim copies of
    * the lowest-vec_id embedding (ids 300,001+g — offset past every
    * `% 50` k-means seed slot so the planted mass never becomes a
    * centroid seed). Identical vectors share one top-1 assignment, so
    * the group lands in ONE cluster — the broken-encoder shape that
    * makes SemDeDup's within-cluster join quadratic. Fixture for the
    * hot-cluster star dial (`semanticDedup(maxVecsPerCluster)`).
    */
  def hotEmbCorpus(spark: SparkSession, dir: String, copies: Int = 40): DataFrame = {
    // ids 300001..300001+copies-1 dodge the % 50 seed slots only while
    // the run stays short of 300050 — past that the planted mass would
    // seed its own centroid and the fixture's premise silently breaks
    require(copies <= 49,
      s"hotEmbCorpus plants ids from 300001 and must stay below the next " +
        s"% 50 k-means seed slot (300050) to keep the spike seedless — got $copies")
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val seed = e.orderBy("vec_id").limit(1).select("embedding")
    e.unionByName(
      spark.range(copies.toLong)
        .select((col("id") + 300001L).as("vec_id"))
        .crossJoin(seed)
        .select("vec_id", "embedding"))
  }

  def hotEmbCorpusSql(copies: Int = 40): String =
    s"""SELECT vec_id, embedding FROM embeddings
       |UNION ALL
       |SELECT 300001 + g.g AS vec_id, h.embedding
       |FROM (SELECT embedding FROM embeddings ORDER BY vec_id LIMIT 1) h
       |CROSS JOIN (SELECT range AS g FROM range(0, $copies)) g""".stripMargin
}
