package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.unsafe.types.UTF8String

/** Pluggable pair-classifier seam for entity matching — the
  * {match, confidence, reason} contract of the reference's LLM
  * matcher (LLM/llm_entity_matching_demo.py classify_pair), with two
  * implementations:
  *
  *  - [[HeuristicPairClassifier]] (the DEFAULT): the deterministic
  *    token-sort-similarity features `match_llm_stub` ships — fully
  *    reproducible, engine-portable, no model behind it;
  *  - [[BatchedPairClassifier]]: the per-partition batched REMOTE
  *    skeleton — request batching, bounded exponential-backoff retry,
  *    and a strict same-order/same-length response contract — with
  *    the transport INJECTED (`String => String` over the JSON wire
  *    shape), so the batching/retry machinery is testable with no
  *    endpoint and a production deployment only supplies an HTTP
  *    send. No real endpoint ships here by design: the environment
  *    has no egress, and which model to call is a deployment choice.
  *
  * The Spark side is [[PairClassifier.classifyPairs]]: one classifier
  * call sequence per PARTITION (the batch shape every hosted-model
  * pipeline needs — per-row calls would pay the round-trip per name
  * pair), emitting one verdict row per input row.
  */
trait PairClassifier extends Serializable {
  /** Verdicts for a batch of (left_name, right_name) pairs — MUST
    * return exactly one verdict per pair, in input order.
    */
  def classifyBatch(pairs: Seq[(String, String)]): Seq[PairVerdict]
}

case class PairVerdict(matched: Boolean, confidence: Double, reason: String)

case class PairInput(left_id: Long, right_id: Long,
                     left_name: String, right_name: String)

case class PairResult(left_id: Long, right_id: Long, matched: Boolean,
                      confidence: Double, reason: String)

object PairClassifier {

  /** Partition-parallel classification: each partition's rows are
    * handed to the classifier as one ordered batch sequence (the
    * classifier chunks further as it sees fit), verdicts zip back
    * positionally. No driver transfer, no shuffle.
    */
  def classifyPairs(pairs: Dataset[PairInput],
                    clf: PairClassifier): Dataset[PairResult] = {
    import pairs.sparkSession.implicits._
    pairs.mapPartitions { it =>
      val rows = it.toSeq
      val verdicts = clf.classifyBatch(rows.map(r => (r.left_name, r.right_name)))
      require(verdicts.length == rows.length,
        s"classifier returned ${verdicts.length} verdicts for ${rows.length} pairs")
      rows.iterator.zip(verdicts.iterator).map { case (r, v) =>
        PairResult(r.left_id, r.right_id, v.matched, v.confidence, v.reason)
      }
    }
  }
}

/** Deterministic default: the same token-sort bounded-Levenshtein
  * features as `match_llm_stub` / matchFuzzyBlocked (normName +
  * [[graft.functions.BoundedLev.sim]]), phrased in the LLM contract.
  */
object HeuristicPairClassifier extends PairClassifier {

  private def norm(s: String): String =
    s.trim.toLowerCase.split("\\s+").sorted.mkString(" ")

  // HALF_UP to 6 decimals — Spark's round(), which the stub query
  // uses, so verdicts agree digit-for-digit with match_llm_stub
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  def score(a: String, b: String): Double =
    r6(graft.functions.BoundedLev.sim(
      UTF8String.fromString(norm(a)), UTF8String.fromString(norm(b)), 0.0))

  override def classifyBatch(pairs: Seq[(String, String)]): Seq[PairVerdict] =
    pairs.map { case (a, b) =>
      val s = score(a, b)
      PairVerdict(s >= 0.8, r6(math.min(1.0, s * 1.1)),
        s"token-sort similarity $s " +
          (if (s >= 0.8) ">= 0.8: same entity" else "< 0.8: different entity"))
    }
}

/** Remote-classifier SKELETON: chunks each batch to `batchSize`
  * requests, retries a failed transport call up to `maxRetries` times
  * with exponential backoff, and enforces the one-verdict-per-pair
  * response contract. The wire format is the reference's JSON shape —
  * request `[{"left":…,"right":…},…]`, response
  * `[{"match":bool,"confidence":num,"reason":str},…]`.
  */
class BatchedPairClassifier(transport: String => String,
                            batchSize: Int = 16,
                            maxRetries: Int = 3,
                            backoffMs: Long = 10L) extends PairClassifier {
  require(batchSize > 0)

  override def classifyBatch(pairs: Seq[(String, String)]): Seq[PairVerdict] =
    pairs.grouped(batchSize).flatMap { chunk =>
      val verdicts = withRetry(BatchedPairClassifier.toRequestJson(chunk))
      require(verdicts.length == chunk.length,
        s"endpoint returned ${verdicts.length} verdicts for ${chunk.length} pairs")
      verdicts
    }.toSeq

  private def withRetry(request: String): Seq[PairVerdict] = {
    var attempt = 0
    while (true) {
      try return BatchedPairClassifier.parseResponseJson(transport(request))
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt > maxRetries) throw e
          Thread.sleep(backoffMs << (attempt - 1))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

object BatchedPairClassifier {

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def unesc(s: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => out += '"'; i += 2
          case '\\' => out += '\\'; i += 2
          case 'n' => out += '\n'; i += 2
          case 'u' => out += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 6
          case other => out += other; i += 2
        }
      } else { out += c; i += 1 }
    }
    out.toString
  }

  def toRequestJson(chunk: Seq[(String, String)]): String =
    chunk.map { case (l, r) =>
      s"""{"left":"${esc(l)}","right":"${esc(r)}"}"""
    }.mkString("[", ",", "]")

  private val verdictRe =
    """\{"match":(true|false),"confidence":([0-9.eE+\-]+),"reason":"((?:[^"\\]|\\.)*)"\}""".r

  def parseResponseJson(json: String): Seq[PairVerdict] =
    verdictRe.findAllMatchIn(json).map(m =>
      PairVerdict(m.group(1) == "true", m.group(2).toDouble, unesc(m.group(3)))
    ).toSeq

  def toResponseJson(vs: Seq[PairVerdict]): String =
    vs.map(v =>
      s"""{"match":${v.matched},"confidence":${v.confidence},"reason":"${esc(v.reason)}"}"""
    ).mkString("[", ",", "]")
}
