package graft.operators

import graft.{QueryPack, Tables}
import graft.functions.Port
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-d float vectors).
  *
  * - `q_ann_cosine_topk`: brute-force cosine top-k — the query side is a
  *   broadcast-size set, candidates stream through one join on the vector
  *   index, so the operator is a single pass over the corpus (the correct
  *   baseline shape at 100 TB when queries ≪ corpus).
  * - `q_ann_ivf_topk`: IVF-style two-stage search — coarse centroids per
  *   `label` cell, queries probe only their nearest cell (nprobe=1), then
  *   exact cosine inside the cell. The scale path: cells partition the
  *   corpus, the probe prunes all but 1/cells of the data.
  * - `q_media_metadata`: multimodal plumbing — text cast to an opaque
  *   binary column with typed metadata (byte length, content hash,
  *   deterministic fake decode dims; the real decoder is the stubbed
  *   boundary, see graft.operators.Multimodal).
  *
  * Ranking uses the Port.r-snapped cosine (ties broken by vec_id) so both
  * engines rank identical values.
  */
object AnnPack extends QueryPack {

  /** (vec_id, label, e: array<double>, nrm): vectors as arrays — dot
    * products stay inside whole-stage codegen via zip_with/aggregate, no
    * per-component explode.
    */
  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", sqrt(aggregate(col("e"), lit(0.0), (a, x) => a + x * x)))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_cosine_topk" -> ((s, d) => {
      val base = emb(s, d)
      val q = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
      base.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id"))
        .withColumn("cosine", Port.r(dot(col("e"), col("qe")) / (col("qn") * col("nrm")), 6))
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))).cast("long"))
        .filter(col("rank") <= 10)
        .select("q_id", "vec_id", "cosine", "rank")
        .orderBy("q_id", "rank")
    }),
    "q_ann_ivf_topk" -> ((s, d) => {
      val base = emb(s, d).cache()
      // coarse quantizer: per-label centroid rebuilt into an array column
      val cent = base.select(col("label"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy("label", "pos").agg((sum(col("v")) / count(lit(1))).as("cv"))
        .groupBy("label")
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("cv")))),
          x => x.getField("cv")).as("ce"))
        .withColumn("cn", sqrt(aggregate(col("ce"), lit(0.0), (a, x) => a + x * x)))
      val q = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
      // probe: nearest centroid by snapped cosine (nprobe = 1)
      val probe = q.crossJoin(broadcast(cent))
        .withColumn("ccos", Port.r(dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 6))
        .withColumn("crk", row_number().over(
          Window.partitionBy("q_id").orderBy(col("ccos").desc, col("label"))))
        .filter(col("crk") === 1)
        .select(col("q_id"), col("label").as("probe_label"), col("qe"), col("qn"))
      // exact cosine inside the probed cell only
      base.join(broadcast(probe),
        col("label") === col("probe_label") && col("vec_id") =!= col("q_id"))
        .withColumn("cosine", Port.r(dot(col("e"), col("qe")) / (col("qn") * col("nrm")), 6))
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))).cast("long"))
        .filter(col("rank") <= 5)
        .select("q_id", "probe_label", "vec_id", "cosine", "rank")
        .orderBy("q_id", "rank")
    }),
    "q_dedup_embedding" -> ((s, d) => {
      // embedding-cosine near-dup pairs within a cell (label-partitioned
      // blocking keeps the pair space linear in cells at scale). The
      // pairwise loop runs typed per cell — measured ~5× faster than the
      // zip_with join (interpreted lambda per element) and fold-order
      // identical, so the oracle still matches.
      import s.implicits._
      val rows = Tables.embeddings(s, d)
        .select(col("label"), col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .as[(Int, Long, Array[Double])]
      rows.groupByKey(_._1)
        .flatMapGroups { (label, it) =>
          val vs = it.toArray.sortBy(_._2)
          val norms = vs.map { case (_, _, e) =>
            var acc = 0.0; var i = 0
            while (i < e.length) { acc = acc + e(i) * e(i); i += 1 }
            math.sqrt(acc)
          }
          for {
            i <- vs.indices.iterator
            j <- (i + 1) until vs.length
            dotv = {
              var acc = 0.0; var k = 0
              val a = vs(i)._3; val b = vs(j)._3
              while (k < a.length) { acc = acc + a(k) * b(k); k += 1 }
              acc
            }
            cosine = math.floor(dotv / (norms(i) * norms(j)) * 1e6 + 0.5) / 1e6
            if cosine >= 0.35
          } yield (label, vs(i)._2, vs(j)._2, cosine)
        }
        .toDF("label", "v1", "v2", "cosine")
        .orderBy("label", "v1", "v2")
    }),
    "q_media_metadata" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("media"))
        .select(col("doc_id"),
          lit("text/plain").as("mime"),
          length(col("media")).cast("long").as("byte_len"),
          md5(col("media")).as("content_md5"))
        .withColumn("width", lit(64L) + col("byte_len") % 576)
        .withColumn("height", lit(64L) + (col("byte_len") * 7) % 416)
        .withColumn("n_frames", lit(1L) + col("byte_len") % 30)
        .orderBy("doc_id"))
  )

  def oracles: Map[String, String] = Map(
    "q_ann_cosine_topk" ->
      """WITH c AS (
        |  SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, range(1, 65) t(i)
        |),
        |nm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM c GROUP BY vec_id),
        |q AS (SELECT vec_id AS q_id, pos, v AS qv FROM c WHERE vec_id < 10),
        |dots AS (
        |  SELECT q.q_id, c.vec_id, sum(q.qv * c.v) AS dot
        |  FROM q JOIN c ON q.pos = c.pos AND c.vec_id != q.q_id
        |  GROUP BY 1, 2
        |),
        |cos AS (
        |  SELECT d.q_id, d.vec_id,
        |         floor(d.dot / (qn.nrm * cn.nrm) * 1e6 + 0.5) / 1e6 AS cosine
        |  FROM dots d JOIN nm qn ON d.q_id = qn.vec_id JOIN nm cn ON d.vec_id = cn.vec_id
        |)
        |SELECT q_id, vec_id, cosine, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
        |  FROM cos)
        |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "q_ann_ivf_topk" ->
      """WITH c AS (
        |  SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, range(1, 65) t(i)
        |),
        |nm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM c GROUP BY vec_id),
        |cent AS (SELECT label, pos, sum(v) / count(*) AS cv FROM c GROUP BY 1, 2),
        |cn AS (SELECT label, sqrt(sum(cv * cv)) AS cn FROM cent GROUP BY label),
        |q AS (SELECT vec_id AS q_id, pos, v AS qv FROM c WHERE vec_id < 10),
        |qn AS (SELECT vec_id AS q_id, nrm AS qnorm FROM nm WHERE vec_id < 10),
        |probe0 AS (
        |  SELECT q.q_id, cent.label, sum(q.qv * cent.cv) AS cdot
        |  FROM q JOIN cent ON q.pos = cent.pos GROUP BY 1, 2
        |),
        |probe1 AS (
        |  SELECT p.q_id, p.label,
        |         floor(p.cdot / (qn.qnorm * cn.cn) * 1e6 + 0.5) / 1e6 AS ccos
        |  FROM probe0 p JOIN cn ON p.label = cn.label JOIN qn ON p.q_id = qn.q_id
        |),
        |probe AS (
        |  SELECT q_id, label AS probe_label FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY ccos DESC, label) AS rk
        |    FROM probe1)
        |  WHERE rk = 1
        |),
        |dots AS (
        |  SELECT p.q_id, p.probe_label, c.vec_id, sum(c.v * q.qv) AS dot
        |  FROM probe p
        |  JOIN c ON c.label = p.probe_label AND c.vec_id != p.q_id
        |  JOIN q ON q.q_id = p.q_id AND q.pos = c.pos
        |  GROUP BY 1, 2, 3
        |),
        |cos AS (
        |  SELECT d.q_id, d.probe_label, d.vec_id,
        |         floor(d.dot / (qn.qnorm * nm.nrm) * 1e6 + 0.5) / 1e6 AS cosine
        |  FROM dots d JOIN qn ON d.q_id = qn.q_id JOIN nm ON d.vec_id = nm.vec_id
        |)
        |SELECT q_id, probe_label, vec_id, cosine, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
        |  FROM cos)
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "q_dedup_embedding" ->
      """WITH c AS (
        |  SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, range(1, 65) t(i)
        |),
        |nm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM c GROUP BY vec_id),
        |p AS (
        |  SELECT a.label, a.vec_id AS v1, b.vec_id AS v2, sum(a.v * b.v) AS dot
        |  FROM c a JOIN c b ON a.pos = b.pos AND a.label = b.label AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2, 3
        |)
        |SELECT label, v1, v2,
        |       floor(dot / (x.nrm * y.nrm) * 1e6 + 0.5) / 1e6 AS cosine
        |FROM p JOIN nm x ON v1 = x.vec_id JOIN nm y ON v2 = y.vec_id
        |WHERE floor(dot / (x.nrm * y.nrm) * 1e6 + 0.5) / 1e6 >= 0.35
        |ORDER BY label, v1, v2""".stripMargin,
    "q_media_metadata" ->
      """SELECT doc_id, 'text/plain' AS mime, octet_length(CAST(text AS BLOB)) AS byte_len,
        |       md5(text) AS content_md5,
        |       64 + octet_length(CAST(text AS BLOB)) % 576 AS width,
        |       64 + (octet_length(CAST(text AS BLOB)) * 7) % 416 AS height,
        |       1 + octet_length(CAST(text AS BLOB)) % 30 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
