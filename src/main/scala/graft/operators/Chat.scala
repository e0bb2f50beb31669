package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conversation (SFT/chat) data processing — the structured-text side
  * of a training-data pipeline: instruction-tuning corpora ship as JSON
  * turn lists (`[{"role": "user", "content": ...}, ...]`), and before
  * they become training text they need schema-checked parsing,
  * role-protocol validation, and flattening into a single string with
  * LOSS-MASK SPANS (the char ranges of assistant turns — the only
  * tokens a chat fine-tune trains on).
  *
  * Everything is per-conversation map-side work (one window keyed by
  * the conversation for the offsets); validation and offsets are
  * integer/string-exact, so the gate oracle replays them fully. */
object Chat {

  private val turnsSchema = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  /** Parse a JSON turn-list column into exploded turns
    * `(idCol, turn_ix, role, content)`. Malformed JSON (or a non-array)
    * RAISES with the conversation id — a null-swallowing parse would
    * silently drop conversations from the corpus. */
  def parseConversations(df: DataFrame, jsonCol: String,
      idCol: String): DataFrame = {
    val parsed = df.withColumn("__turns",
      from_json(col(jsonCol), turnsSchema))
    val guarded = parsed.withColumn("__turns",
      when(col(jsonCol).isNotNull && col("__turns").isNull,
        raise_error(concat(lit("Chat.parseConversations: malformed turn JSON for "),
          col(idCol).cast("string"))))
        .otherwise(col("__turns")))
    guarded.where(col("__turns").isNotNull)
      .select(col(idCol), posexplode(col("__turns")).as(Seq("turn_ix", "__t")))
      .select(col(idCol), col("turn_ix"),
        col("__t.role").as("role"), col("__t.content").as("content"))
  }

  /** Per-conversation protocol flags over exploded turns:
    * `(idCol, n_turns, starts_with_user, alternates, ends_with_assistant,
    * has_empty_content, valid)`. `alternates` = the roles are
    * user/assistant strictly alternating (either phase); `valid` is the
    * conjunction — the standard SFT admission gate. One
    * map-side-combinable aggregation. */
  def validateConversations(turns: DataFrame, idCol: String): DataFrame = {
    val parity = when(col("turn_ix") % 2 === 0, lit("user"))
      .otherwise(lit("assistant"))
    val flipped = when(col("turn_ix") % 2 === 0, lit("assistant"))
      .otherwise(lit("user"))
    turns.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_turns"),
      max(when(col("turn_ix") === 0, col("role"))).as("__first"),
      (sum(when(col("role") === parity, 1L).otherwise(0L)) === count(lit(1)) ||
        sum(when(col("role") === flipped, 1L).otherwise(0L)) === count(lit(1)))
        .as("alternates"),
      max(struct(col("turn_ix"), col("role"))).as("__last"),
      max(when(col("content").isNull || length(trim(col("content"))) === 0, 1L)
        .otherwise(0L)).as("__empty"))
      .select(col(idCol), col("n_turns"),
        (col("__first") === "user").as("starts_with_user"),
        col("alternates"),
        (col("__last.role") === "assistant").as("ends_with_assistant"),
        (col("__empty") === 1L).as("has_empty_content"))
      .withColumn("valid",
        col("starts_with_user") && col("alternates") &&
          col("ends_with_assistant") && !col("has_empty_content"))
  }

  /** Flatten turns to segment offsets: each turn renders as
    * `<|role|>content` and the conversation is their in-order concat;
    * the output keeps per-turn `(seg_start, seg_end)` char offsets into
    * that flat string (half-open) plus `train_on` = the assistant
    * loss mask. Offsets come from one cumulative window per
    * conversation — integer-exact, so a tokenizer downstream can map
    * them without re-rendering. */
  def flattenWithSpans(turns: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val segLen = length(lit("<|")) + length(col("role")) + length(lit("|>")) +
      length(coalesce(col("content"), lit("")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("turn_ix"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns
      .withColumn("__len", segLen.cast("long"))
      .withColumn("seg_end", sum(col("__len")).over(w))
      .withColumn("seg_start", col("seg_end") - col("__len"))
      .withColumn("train_on", col("role") === "assistant")
      .select(col(idCol), col("turn_ix"), col("role"),
        col("seg_start"), col("seg_end"), col("train_on"))
  }

  /** Pack flattened conversations into fixed-token training examples
    * with REMAPPED loss-mask spans — the last mile of SFT data prep:
    * [[Packing.packSequencesBy]] lays whole conversations into
    * (stream, pack) examples under `budgetTokens` (whitespace tokens of
    * the flat text; conversations never split), then every turn's char
    * span shifts by the char offset of its conversation within the
    * example. Output: `(idCol, stream, pack, turn_ix, role, ex_start,
    * ex_end, train_on)` — ex_start/ex_end index into the example's
    * concatenated text, so the trainer masks without re-rendering.
    * Integer-exact end to end (the gate oracle replays the greedy
    * layout with a recursive CTE and the offsets with one window). */
  def packConversations(turns: DataFrame, idCol: String,
      budgetTokens: Int, streams: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val flat = flatText(turns, idCol)
    val placed = Packing.packSequencesBy(flat,
      graft.functions.TextFunctions.tokenCount(col("text")),
      idCol, budgetTokens, streams)
    val withLen = placed.join(
      flat.select(col(idCol), length(col("text")).cast("long").as("__clen")),
      Seq(idCol))
    val w = Window.partitionBy(col("stream"), col("pack")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val off = withLen
      .withColumn("__conv_start", sum(col("__clen")).over(w) - col("__clen"))
      .select(col(idCol), col("stream"), col("pack"), col("__conv_start"))
    flattenWithSpans(turns, idCol).join(off, Seq(idCol))
      .select(col(idCol), col("stream"), col("pack"), col("turn_ix"), col("role"),
        (col("__conv_start") + col("seg_start")).as("ex_start"),
        (col("__conv_start") + col("seg_end")).as("ex_end"),
        col("train_on"))
  }

  /** The flat training text per conversation (the string the spans of
    * [[flattenWithSpans]] index into). */
  def flatText(turns: DataFrame, idCol: String): DataFrame =
    turns
      .withColumn("__seg", concat(lit("<|"), col("role"), lit("|>"),
        coalesce(col("content"), lit(""))))
      .groupBy(col(idCol))
      .agg(concat_ws("", array_sort(collect_list(
        struct(col("turn_ix"), col("__seg")))).getField("__seg")).as("text"))
}
