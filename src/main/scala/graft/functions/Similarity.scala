package graft.functions

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (north-star scope): brute-force cosine
  * top-k as the exact baseline, and a hyperplane-LSH bucketed variant as
  * the scale path (candidates come from an equi-join on bucket signatures
  * instead of a full cross join — shuffle ∝ corpus, not corpus²).
  *
  * Dot products run on doubles via `zip_with` + `aggregate` higher-order
  * functions (codegen'd, sequential left fold → bit-deterministic and
  * engine-portable).
  */
object Similarity {

  /** Cast a float-array column to double elements (so all arithmetic is
    * IEEE double, matching the oracle exactly). */
  def asDouble(v: Column): Column =
    transform(v, x => x.cast("double"))

  /** Sequential dot product of two array columns — native expression
    * (tight primitive loop; see [[ArrayMath]]) with identical semantics to
    * the composed `aggregate(zip_with(...))` form. */
  def dot(a: Column, b: Column): Column = ArrayMath.dotProduct(a, b)

  /** Cosine similarity; for pre-normalized vectors prefer [[dot]]. */
  def cosine(a: Column, b: Column): Column = {
    val n1 = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
    val n2 = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x * x))
    dot(a, b) / (n1 * n2)
  }

  /** Symmetric int8 quantization of a unit-scale float vector: x →
    * round(x·127) clamped to [-127, 127]. 4× smaller than float32 at
    * ~1% cosine error — the standard storage/bandwidth lever for
    * billion-vector similarity search (dequantize with [[dequantize]]
    * or compute directly on int8 with a scaled dot product). */
  def quantizeInt8(v: Column): Column =
    transform(v, x =>
      greatest(lit(-127), least(lit(127), round(x * 127).cast("int"))))

  /** Inverse of [[quantizeInt8]] (lossy). */
  def dequantize(q: Column): Column =
    transform(q, x => x.cast("double") / 127.0)

  /** Sign-bit hyperplane LSH signature over the first `bits` dimensions:
    * a '1'/'0' string. Vectors in the same bucket are ANN candidates. */
  def signBits(v: Column, bits: Int): Column =
    concat((1 to bits).map(j =>
      when(element_at(v, j) >= 0, "1").otherwise("0")): _*)

  /** Exact top-k by (rounded) similarity per query, brute force. `queries`
    * must be small (it is broadcast against every candidate partition). */
  def bruteTopK(candidates: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    candidates.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("sim", round(dot(col("qe"), col("ed")), 4))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
  }

  val defs: Seq[QueryDef] = Seq(

    // U5 brute-force cosine top-k (vectors are pre-normalized → dot =
    // cosine); ranking on the rounded sim keeps order ulp-robust
    QueryDef(
      "q_cosine_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), asDouble(col("embedding")).as("ed"))
        val q = emb.where(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("ed").as("qe"))
        bruteTopK(emb, q, 5)
          .select("qid", "vec_id", "sim", "rn")
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed FROM embeddings),
             |q AS (SELECT vec_id AS qid, ed AS qe FROM e WHERE vec_id < 5),
             |sims AS (SELECT q.qid, e.vec_id, round(list_dot_product(q.qe, e.ed), 4) AS sim
             |         FROM q CROSS JOIN e WHERE e.vec_id <> q.qid),
             |r AS (SELECT qid, vec_id, sim,
             |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS INT) AS rn
             |      FROM sims)
             |SELECT qid, vec_id, sim, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)),

    // U5 scale path: hyperplane-LSH bucketed ANN — equi-join on the 8-bit
    // sign signature prunes candidates ~256× before any dot product
    QueryDef(
      "q_ann_lsh",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), asDouble(col("embedding")).as("ed"),
            signBits(col("embedding"), 8).as("sig"))
        val q = emb.where(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("ed").as("qe"), col("sig"))
        val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
        emb.join(q, "sig")
          .where(col("vec_id") =!= col("qid"))
          .withColumn("sim", round(dot(col("qe"), col("ed")), 4))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .select("qid", "vec_id", "sim", "rn")
          .orderBy("qid", "rn")
      },
      Some {
        val sig = (1 to 8).map(j =>
          s"CASE WHEN embedding[$j] >= 0 THEN '1' ELSE '0' END").mkString(" || ")
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed,
           |             $sig AS sig
           |           FROM embeddings),
           |q AS (SELECT vec_id AS qid, ed AS qe, sig FROM e WHERE vec_id < 20),
           |sims AS (SELECT q.qid, e.vec_id, round(list_dot_product(q.qe, e.ed), 4) AS sim
           |         FROM q JOIN e ON e.sig = q.sig WHERE e.vec_id <> q.qid),
           |r AS (SELECT qid, vec_id, sim,
           |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS INT) AS rn
           |      FROM sims)
           |SELECT qid, vec_id, sim, rn FROM r WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
      }),

    // embedding-cosine near-duplicate pairs: LSH bucket join prunes the
    // pair space, then an exact cosine threshold — the scale recipe for
    // corpus-level near-dup removal by embedding
    QueryDef(
      "q_near_dup_cosine",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), asDouble(col("embedding")).as("ed"),
            signBits(col("embedding"), 8).as("sig"))
        val l = emb.select(col("vec_id").as("id1"), col("ed").as("e1"), col("sig"))
        val r = emb.select(col("vec_id").as("id2"), col("ed").as("e2"), col("sig"))
        l.join(r, "sig")
          .where(col("id1") < col("id2"))
          .withColumn("sim", round(dot(col("e1"), col("e2")), 4))
          .where(col("sim") >= 0.3)
          .select("id1", "id2", "sim")
          .orderBy("id1", "id2")
      },
      Some {
        val sig = (1 to 8).map(j =>
          s"CASE WHEN embedding[$j] >= 0 THEN '1' ELSE '0' END").mkString(" || ")
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed,
           |             $sig AS sig
           |           FROM embeddings)
           |SELECT a.vec_id AS id1, b.vec_id AS id2,
           |  round(list_dot_product(a.ed, b.ed), 4) AS sim
           |FROM e a JOIN e b ON a.sig = b.sig AND a.vec_id < b.vec_id
           |WHERE round(list_dot_product(a.ed, b.ed), 4) >= 0.3
           |ORDER BY id1, id2""".stripMargin
      }),

    // IVF-style ANN: assign every vector to its nearest "centroid" (a
    // deterministic coarse codebook — the first 8 vectors), then search
    // only the query's cell (nprobe=1). Candidate count drops ~|codebook|×
    // versus brute force; at scale the assignment is one broadcast join
    // and cells become the partitioning key.
    QueryDef(
      "q_ivf_ann",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), asDouble(col("embedding")).as("ed"))
        val cents = emb.where(col("vec_id") < 8)
          .select(col("vec_id").as("cent_id"), col("ed").as("ce"))
        val wAssign = Window.partitionBy("vec_id")
          .orderBy(col("cdot").desc, col("cent_id"))
        val assign = emb.crossJoin(broadcast(cents))
          .withColumn("cdot", round(dot(col("ed"), col("ce")), 4))
          .withColumn("crn", row_number().over(wAssign))
          .where(col("crn") === 1)
          .select(col("vec_id"), col("ed"), col("cent_id").as("cluster"))
        val q = assign.where(col("vec_id") >= 8 && col("vec_id") < 13)
          .select(col("vec_id").as("qid"), col("ed").as("qe"), col("cluster"))
        val wRank = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
        assign.join(broadcast(q), "cluster")
          .where(col("vec_id") =!= col("qid"))
          .withColumn("sim", round(dot(col("qe"), col("ed")), 4))
          .withColumn("rn", row_number().over(wRank))
          .where(col("rn") <= 3)
          .select("qid", "vec_id", "cluster", "sim", "rn")
          .orderBy("qid", "rn")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed FROM embeddings),
             |c AS (SELECT vec_id AS cent_id, ed AS ce FROM e WHERE vec_id < 8),
             |ad AS (SELECT e.vec_id, e.ed, c.cent_id,
             |         round(list_dot_product(e.ed, c.ce), 4) AS cdot,
             |         row_number() OVER (PARTITION BY e.vec_id
             |           ORDER BY round(list_dot_product(e.ed, c.ce), 4) DESC, c.cent_id) AS crn
             |       FROM e CROSS JOIN c),
             |assign AS (SELECT vec_id, ed, cent_id AS cluster FROM ad WHERE crn = 1),
             |q AS (SELECT vec_id AS qid, ed AS qe, cluster FROM assign
             |      WHERE vec_id >= 8 AND vec_id < 13),
             |sims AS (SELECT q.qid, a.vec_id, a.cluster,
             |           round(list_dot_product(q.qe, a.ed), 4) AS sim
             |         FROM q JOIN assign a ON a.cluster = q.cluster
             |         WHERE a.vec_id <> q.qid),
             |r AS (SELECT qid, vec_id, cluster, sim,
             |        CAST(row_number() OVER (PARTITION BY qid
             |          ORDER BY sim DESC, vec_id) AS INT) AS rn
             |      FROM sims)
             |SELECT qid, vec_id, cluster, sim, rn FROM r WHERE rn <= 3
             |ORDER BY qid, rn""".stripMargin)),

    // int8 quantization integrity: exact integer digests of the quantized
    // vectors (sum/min/max are deterministic ints; the array itself stays
    // engine-internal)
    QueryDef(
      "q_embed_quantize",
      (s, d) => Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          aggregate(quantizeInt8(asDouble(col("embedding"))), lit(0L),
            (acc, x) => acc + x).as("q_sum"),
          array_min(quantizeInt8(asDouble(col("embedding")))).as("q_min"),
          array_max(quantizeInt8(asDouble(col("embedding")))).as("q_max"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id,
             |  CAST(list_sum(q) AS BIGINT) AS q_sum,
             |  CAST(list_min(q) AS INT) AS q_min,
             |  CAST(list_max(q) AS INT) AS q_max
             |FROM (SELECT vec_id,
             |    list_transform(CAST(embedding AS DOUBLE[]),
             |      x -> greatest(-127, least(127, CAST(round(x * 127) AS INT)))) AS q
             |  FROM embeddings)
             |ORDER BY vec_id""".stripMargin)),

    // U6 multimodal join: text beside its embedding vector
    QueryDef(
      "q_doc_embed_join",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val emb = Tables.embeddings(s, d)
        docs.join(emb, docs("doc_id") === emb("vec_id"))
          .select(col("doc_id"), col("lang"), col("label"),
            size(col("embedding")).as("dim"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, label, CAST(len(embedding) AS INT) AS dim
             |FROM documents JOIN embeddings ON doc_id = vec_id
             |ORDER BY doc_id""".stripMargin))
  )
}
