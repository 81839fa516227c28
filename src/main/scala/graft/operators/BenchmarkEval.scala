package graft.operators

import graft.Q
import graft.functions.AuditDefs.sl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's built-in detection benchmark, as queries: its 14
  * labeled samples (benchmark.py:20-243) are embedded as a literal
  * relation, scored with the same style operator as the corpus, and
  * evaluated exactly like benchmark.evaluate_accuracy (accuracy,
  * per-class accuracy; benchmark.py:264-300).
  */
object BenchmarkEval {

  final case class Sample(sample_id: Long, label: String, category: String, text: String)

  /** Port of BENCHMARK_SAMPLES (benchmark.py:20-243), verbatim. */
  val samples: Seq[Sample] = Seq(
    Sample(0, "gpt-4", "qa",
      "Certainly! Here's a comprehensive breakdown of the topic. " +
        "First, let's consider the key factors at play. The primary " +
        "consideration is that machine learning models learn patterns " +
        "from data, and these patterns can sometimes reflect biases " +
        "present in the training data. It's important to note that " +
        "this is an active area of research with ongoing developments."),
    Sample(1, "gpt-4", "code",
      "Here's a Python implementation that addresses your requirements:\n\n" +
        "```python\ndef calculate_fibonacci(n: int) -> list[int]:\n" +
        "    \"\"\"Calculate the first n Fibonacci numbers.\"\"\"\n" +
        "    if n <= 0:\n        return []\n" +
        "    if n == 1:\n        return [0]\n" +
        "    fib = [0, 1]\n" +
        "    for _ in range(2, n):\n" +
        "        fib.append(fib[-1] + fib[-2])\n" +
        "    return fib\n```\n\n" +
        "This solution uses an iterative approach with O(n) time complexity " +
        "and O(n) space complexity. Let me know if you'd like me to explain " +
        "any part in more detail!"),
    Sample(2, "gpt-4", "reasoning",
      "That's a great question! Let me walk you through the reasoning " +
        "step by step. The key insight here is that we need to consider " +
        "both the short-term and long-term implications. In the short term, " +
        "the approach seems viable, but when we look at scalability, " +
        "there are several factors worth considering. Would you like me " +
        "to elaborate on any specific aspect?"),
    Sample(3, "claude", "qa",
      "I'd be happy to help with that. Let me think through this carefully. " +
        "The question touches on some nuanced aspects of the topic. " +
        "I should note that there are different perspectives on this, and " +
        "I want to be straightforward about the uncertainty involved. " +
        "Based on my understanding, the most balanced view would be that " +
        "while there are clear benefits, we should also consider potential " +
        "drawbacks and ethical implications."),
    Sample(4, "claude", "creative",
      "I appreciate you sharing that creative prompt. Here's my attempt:\n\n" +
        "The morning light filtered through the old library's windows, " +
        "casting long shadows across the dusty shelves. Sarah traced her " +
        "fingers along the spines of forgotten books, each one holding " +
        "stories that had waited decades to be read again. She paused " +
        "at a leather-bound volume with no title — just a small, " +
        "embossed symbol that seemed to shimmer in the light.\n\n" +
        "I tried to capture a sense of mystery and atmosphere. " +
        "Would you like me to continue or take it in a different direction?"),
    Sample(5, "claude", "reasoning",
      "Let me reason through this step by step. First, we need to " +
        "identify the core constraints. The problem states that we have " +
        "a limited budget and need to maximize coverage. This is essentially " +
        "a variant of the knapsack problem. I want to be careful here — " +
        "the optimal solution depends on whether we're looking at the " +
        "fractional or 0/1 variant. For the 0/1 case, dynamic programming " +
        "gives us the best approach."),
    Sample(6, "llama", "qa",
      "Sure thing! So basically, machine learning is all about teaching " +
        "computers to learn from data. Think of it like training a dog — " +
        "you show it examples of what you want, and it learns to do it. " +
        "The main types are supervised learning (where you give labeled data), " +
        "unsupervised learning (where the model finds patterns on its own), " +
        "and reinforcement learning (where it learns by trial and error). " +
        "Pretty cool stuff!"),
    Sample(7, "llama", "code",
      "Here you go! Check out this code:\n\n" +
        "```\ndef merge_sort(arr):\n" +
        "    if len(arr) <= 1:\n        return arr\n" +
        "    mid = len(arr) // 2\n" +
        "    left = merge_sort(arr[:mid])\n" +
        "    right = merge_sort(arr[mid:])\n" +
        "    return merge(left, right)\n\n" +
        "def merge(left, right):\n" +
        "    result = []\n" +
        "    i = j = 0\n" +
        "    while i < len(left) and j < len(right):\n" +
        "        if left[i] <= right[j]:\n" +
        "            result.append(left[i])\n" +
        "            i += 1\n" +
        "        else:\n" +
        "            result.append(right[j])\n" +
        "            j += 1\n" +
        "    result.extend(left[i:])\n" +
        "    result.extend(right[j:])\n" +
        "    return result\n```\n\n" +
        "This is a classic merge sort! It's O(n log n) time. " +
        "Let me know if you need anything else!"),
    Sample(8, "gemini", "qa",
      "Great question! Here's what you need to know about quantum computing. " +
        "Quantum computers leverage quantum mechanical phenomena like " +
        "superposition and entanglement to process information. Unlike " +
        "classical bits (0 or 1), qubits can exist in multiple states " +
        "simultaneously. **Key applications** include:\n\n" +
        "* Cryptography and security\n" +
        "* Drug discovery and molecular simulation\n" +
        "* Optimization problems\n" +
        "* Machine learning acceleration\n\n" +
        "It's worth noting that we're still in the early stages of " +
        "practical quantum computing. Current systems are noisy and " +
        "error-prone, but progress is accelerating rapidly."),
    Sample(9, "gemini", "reasoning",
      "Let me break this problem down systematically. We're looking at " +
        "a graph traversal problem, and I think BFS would be the most " +
        "appropriate approach here. Here's why:\n\n" +
        "1. We need the shortest path\n" +
        "2. All edges have equal weight\n" +
        "3. The graph is unweighted\n\n" +
        "The time complexity would be O(V + E) where V is vertices and " +
        "E is edges. This is optimal for this type of problem. " +
        "I can provide a code implementation if that would be helpful!"),
    Sample(10, "qwen", "qa",
      "好的，我来为您详细解答这个问题。关于深度学习中的注意力机制，" +
        "它的核心思想是让模型能够动态地关注输入序列中最相关的部分。" +
        "具体来说，Transformer 架构中的自注意力机制通过 Query、Key、" +
        "Value 三个矩阵来计算注意力权重。这种机制的优势在于能够捕捉" +
        "长距离依赖关系，同时支持并行计算。"),
    Sample(11, "qwen", "code",
      "以下是一个高效的解决方案：\n\n" +
        "```python\nclass LRUCache:\n" +
        "    def __init__(self, capacity: int):\n" +
        "        self.capacity = capacity\n" +
        "        self.cache = OrderedDict()\n\n" +
        "    def get(self, key: int) -> int:\n" +
        "        if key not in self.cache:\n" +
        "            return -1\n" +
        "        self.cache.move_to_end(key)\n" +
        "        return self.cache[key]\n\n" +
        "    def put(self, key: int, value: int) -> None:\n" +
        "        if key in self.cache:\n" +
        "            self.cache.move_to_end(key)\n" +
        "        self.cache[key] = value\n" +
        "        if len(self.cache) > self.capacity:\n" +
        "            self.cache.popitem(last=False)\n```\n\n" +
        "这个实现使用 OrderedDict 来维护访问顺序，" +
        "get 和 put 操作均为 O(1) 时间复杂度。"),
    Sample(12, "deepseek", "reasoning",
      "嗯，让我仔细想想这个问题。这是一个关于动态规划的经典问题。" +
        "我们可以定义状态 dp[i] 表示到达第 i 个位置的最优解。" +
        "状态转移方程为 dp[i] = max(dp[j] + value[i]) 其中 j < i " +
        "且满足约束条件。边界条件是 dp[0] = value[0]。" +
        "时间复杂度 O(n²)，空间复杂度 O(n)。" +
        "如果需要优化，可以考虑单调栈或线段树来降低复杂度。"),
    Sample(13, "deepseek", "qa",
      "这个问题可以从多个角度来分析。首先从技术层面看，" +
        "大语言模型的训练过程本质上是在海量文本数据上进行" +
        "概率分布的学习。模型通过最小化交叉熵损失来优化参数，" +
        "使得生成的文本概率分布尽可能接近训练数据的分布。" +
        "从实际应用角度来看，这意味着模型会倾向于生成" +
        "训练数据中常见的模式和表达方式。"))

  /** The samples as a DuckDB VALUES relation. */
  private val samplesSql: String =
    samples.map(s => s"(${s.sample_id}, ${sl(s.label)}, ${sl(s.text)})")
      .mkString("(VALUES\n", ",\n", ") AS t(sample_id, label, text)")

  private val sampleScoresSql = Style.scoresSqlOf(samplesSql, "sample_id, label")

  private def sampleScores(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    Style.scoresOf(samples.toDF(), Seq("sample_id", "label"))
  }

  /** Per-sample detection result against the known label. */
  val detect = Q(
    "ma_benchmark_detect",
    s"""SELECT sample_id, label, family AS predicted_model, score AS confidence,
       |  family = label AS correct
       |FROM (
       |  SELECT sample_id, label, family, score,
       |    row_number() OVER (PARTITION BY sample_id ORDER BY score DESC, fidx) AS rn
       |  FROM ($sampleScoresSql)
       |) WHERE rn = 1
       |ORDER BY sample_id""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy("sample_id").orderBy(col("score").desc, col("fidx"))
    sampleScores(spark)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("sample_id"), col("label"), col("family").as("predicted_model"),
        col("score").as("confidence"), (col("family") === col("label")).as("correct"))
      .orderBy("sample_id")
  }

  /** evaluate_accuracy: overall + per-class accuracy (benchmark.py:264-300). */
  val eval = Q(
    "ma_benchmark_eval",
    s"""SELECT coalesce(label, '__overall__') AS label,
       |  CAST(count(*) AS BIGINT) AS n_total,
       |  CAST(count(*) FILTER (WHERE correct) AS BIGINT) AS n_correct,
       |  round(1e-9 + count(*) FILTER (WHERE correct) / CAST(count(*) AS DOUBLE) + 1e-9, 6) AS accuracy
       |FROM (
       |  SELECT label, family = label AS correct FROM (
       |    SELECT sample_id, label, family,
       |      row_number() OVER (PARTITION BY sample_id ORDER BY score DESC, fidx) AS rn
       |    FROM ($sampleScoresSql)
       |  ) WHERE rn = 1
       |)
       |GROUP BY ROLLUP (label)
       |ORDER BY label""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy("sample_id").orderBy(col("score").desc, col("fidx"))
    sampleScores(spark)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("correct", col("family") === col("label"))
      .rollup("label")
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("correct"), 1)).as("n_correct"),
        round(lit(1e-9) + count(when(col("correct"), 1)) / count(lit(1)).cast("double") + 1e-9, 6)
          .as("accuracy"))
      .select(coalesce(col("label"), lit("__overall__")).as("label"),
        col("n_total"), col("n_correct"), col("accuracy"))
      .orderBy("label")
  }

  /** Human-readable audit summary per model pair, replicating
    * engine._generate_summary (engine.py:339-361).
    */
  val summary = Q(
    "ma_summary",
    s"""WITH audit AS (${Style.audit.oracle.get.replace("ORDER BY l.model_a, l.model_b", "")})
       |SELECT model_a, model_b,
       |  '审计对象: ' || model_a || ' vs ' || model_b || chr(10) ||
       |  '判定结果: ' || CASE verdict
       |    WHEN 'likely_derived' THEN '可能存在蒸馏关系'
       |    WHEN 'independent' THEN '两个模型独立'
       |    ELSE '无法确定' END || chr(10) ||
       |  '  [llmmap] 相似度: ' || printf('%.4f', llmmap_similarity + 1e-9) || ' (阈值: 0.85)' || chr(10) ||
       |  '  [dli] 相似度: ' || printf('%.4f', dli_similarity + 1e-9) || ' (阈值: 0.8)' AS summary
       |FROM audit
       |ORDER BY model_a, model_b""".stripMargin) { (spark, dir) =>
    Style.audit.fn(spark, dir)
      .select(col("model_a"), col("model_b"),
        concat(
          lit("审计对象: "), col("model_a"), lit(" vs "), col("model_b"), lit("\n"),
          lit("判定结果: "),
          when(col("verdict") === "likely_derived", "可能存在蒸馏关系")
            .when(col("verdict") === "independent", "两个模型独立")
            .otherwise("无法确定"), lit("\n"),
          lit("  [llmmap] 相似度: "), format_string("%.4f", col("llmmap_similarity") + 1e-9),
          lit(" (阈值: 0.85)\n"),
          lit("  [dli] 相似度: "), format_string("%.4f", col("dli_similarity") + 1e-9),
          lit(" (阈值: 0.8)")).as("summary"))
      .orderBy("model_a", "model_b")
  }

  val all: Seq[Q] = Seq(detect, eval, summary)
}
