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
