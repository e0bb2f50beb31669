package graft

import graft.operators.Chat
import org.apache.spark.sql.functions._

class ChatSpec extends SparkSpec {
  import spark.implicits._

  private def j(turns: (String, String)*): String =
    turns.map { case (r, c) => s"""{"role":"$r","content":"$c"}""" }
      .mkString("[", ",", "]")

  private lazy val convs = Seq(
    (1L, j("user" -> "hi there", "assistant" -> "hello", "user" -> "bye",
      "assistant" -> "later")),
    (2L, j("assistant" -> "i speak first", "user" -> "odd")),
    (3L, j("user" -> "a", "user" -> "b", "assistant" -> "c")),
    (4L, j("user" -> "question", "assistant" -> "")),
    (5L, j("user" -> "only asks", "assistant" -> "answers", "user" -> "again"))
  ).toDF("conv_id", "convo")

  test("parseConversations explodes turns in order and raises on malformed JSON") {
    val turns = Chat.parseConversations(convs, "convo", "conv_id")
    val got = turns.where(col("conv_id") === 1)
      .orderBy("turn_ix").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3)))
    assert(got.toSeq == Seq((0, "user", "hi there"), (1, "assistant", "hello"),
      (2, "user", "bye"), (3, "assistant", "later")))
    val bad = Seq((9L, "not json at all {{")).toDF("conv_id", "convo")
    intercept[Exception](
      Chat.parseConversations(bad, "convo", "conv_id").collect())
  }

  test("validateConversations flags each protocol violation precisely") {
    val v = Chat.validateConversations(
      Chat.parseConversations(convs, "convo", "conv_id"), "conv_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    def flags(id: Long) = {
      val r = v(id)
      (r.getAs[Boolean]("starts_with_user"), r.getAs[Boolean]("alternates"),
        r.getAs[Boolean]("ends_with_assistant"), r.getAs[Boolean]("has_empty_content"),
        r.getAs[Boolean]("valid"))
    }
    assert(flags(1L) == (true, true, true, false, true))
    assert(flags(2L) == (false, true, false, false, false)) // assistant-first phase alternates
    assert(flags(3L) == (true, false, true, false, false))
    assert(flags(4L) == (true, true, true, true, false))
    assert(flags(5L) == (true, true, false, false, false))
    assert(v(1L).getAs[Long]("n_turns") == 4L)
  }

  test("flattenWithSpans offsets index the flat text exactly; mask covers assistant turns only") {
    val turns = Chat.parseConversations(convs, "convo", "conv_id")
    val flat = Chat.flattenWithSpans(turns, "conv_id")
    val text = Chat.flatText(turns, "conv_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // conv 1: "<|user|>hi there<|assistant|>hello<|user|>bye<|assistant|>later"
    assert(text(1L) ==
      "<|user|>hi there<|assistant|>hello<|user|>bye<|assistant|>later")
    flat.join(turns, Seq("conv_id", "turn_ix")).collect().foreach { r =>
      val (id, s, e) = (r.getAs[Long]("conv_id"),
        r.getAs[Long]("seg_start").toInt, r.getAs[Long]("seg_end").toInt)
      val seg = text(id).substring(s, e)
      val expected = s"<|${r.getAs[String]("role")}|>${Option(r.getAs[String]("content")).getOrElse("")}"
      assert(seg == expected, s"conv $id turn ${r.getAs[Int]("turn_ix")}: '$seg' != '$expected'")
      assert(r.getAs[Boolean]("train_on") == (r.getAs[String]("role") == "assistant"))
    }
  }

  test("pipeline is partitioning-invariant") {
    val t1 = Chat.flattenWithSpans(
      Chat.parseConversations(convs.repartition(1), "convo", "conv_id"), "conv_id")
      .collect().toSet
    val t8 = Chat.flattenWithSpans(
      Chat.parseConversations(convs.repartition(8), "convo", "conv_id"), "conv_id")
      .collect().toSet
    assert(t1 == t8)
  }

  test("packConversations: spans land in example coordinates exactly") {
    val turns = Chat.parseConversations(convs, "convo", "conv_id")
    val packed = Chat.packConversations(turns, "conv_id", budgetTokens = 8, streams = 2)
    val flat = Chat.flatText(turns, "conv_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // rebuild each example's text: conversations in id order within (stream, pack)
    val byExample = packed.select("conv_id", "stream", "pack").distinct().collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(0))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val exText = byExample.map { case (k, ids) => k -> ids.map(flat).mkString("") }
    val turnsByKey = turns.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), Option(r.getString(3)).getOrElse("")))
      .toMap
    packed.collect().foreach { r =>
      val key = (r.getAs[Long]("stream"), r.getAs[Long]("pack"))
      val (role, content) = turnsByKey((r.getAs[Long]("conv_id"), r.getAs[Int]("turn_ix")))
      val seg = exText(key).substring(r.getAs[Long]("ex_start").toInt, r.getAs[Long]("ex_end").toInt)
      assert(seg == s"<|$role|>$content", s"$key: '$seg'")
    }
    // a conversation never splits across examples
    val convExamples = packed.select("conv_id", "stream", "pack").distinct()
      .groupBy("conv_id").count().collect().map(_.getLong(1))
    assert(convExamples.forall(_ == 1L))
  }
}
