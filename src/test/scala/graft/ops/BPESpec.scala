package graft.ops

import graft.SparkSpec

/** BPE trainer specs: hand-traced merges, greedy-leftmost application,
  * early exhaustion when the vocabulary runs out of pairs.
  */
class BPESpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("BPE merges: hand-traced counts, greedy application, early stop") {
    // corpus words: "aaab" ×2, "ab" ×1.
    // iter 1: pairs (a,a)=4 [two per aaab ×2], (a,b)=2+1=3 → merge (a,a).
    //   aaab → [aa,a,b] (greedy leftmost: second 'a a' overlap consumed).
    // iter 2: (aa,a)=2, (a,b)=2+1=3 → merge (a,b). aaab → [aa,ab], ab → [ab].
    // iter 3: (aa,ab)=2 → merge. aaab → [aaab].
    // iter 4: no pairs anywhere → training stops at 3 merges of 6.
    val df = docs((1L, "aaab ab aaab"))
    val got = BPE.bpeMerges(df)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "a", "a", 4L),
      (2, "a", "b", 3L),
      (3, "aa", "ab", 2L)))
  }

  test("BPE tokenize: learned merges collapse trained words to single " +
    "subtokens; fertility reflects it") {
    // merges capped at 3: (a,a), (a,b), (aa,ab) as traced above — the
    // (x,y) pair (count 1) never wins a round. Both trained words then
    // compress fully: aaab → [aaab], ab → [ab] → doc 1 has 3 words /
    // 3 subtokens, fertility 1.0; doc 2's xy stays [x,y] (2) and z [z]
    // (1) → fertility 1.5.
    val df = docs((1L, "aaab ab aaab"), (2L, "xy z"))
    val got = BPE.bpeTokenize(df, merges = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((3L, 3L, 1.0)))
    assert(got(2L) == ((2L, 3L, 1.5)))
  }

  test("bounded-sample training: cap >= vocab is exactly full training; " +
    "a tight cap learns only from the most frequent words") {
    val df = docs((1L, "aaab ab aaab zzzz"))
    val full = BPE.bpeMerges(df).collect().map(_.toSeq)
    // cap larger than the 3-word vocabulary: identical merge table
    val capped = BPE.bpeMerges(df, trainCap = 100).collect().map(_.toSeq)
    assert(capped.toSeq == full.toSeq)
    // cap = 1 keeps only the most frequent word type ("aaab", freq 2) —
    // every learned merge must build from its symbols; the rare "zzzz"
    // (whose (z,z) pairs would otherwise participate) contributes nothing
    val tight = BPE.bpeMerges(df, trainCap = 1)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(tight.nonEmpty)
    assert(tight.forall { case (p1, p2) =>
      !p1.contains("z") && !p2.contains("z") })
  }

  test("driver-local trainer matches the distributed trainer merge for " +
    "merge, capped and uncapped") {
    val df = docs((1L, "aaab ab aaab zzzz xy xy xy"))
    val dist = BPE.bpeMerges(df, merges = 8).collect().map(_.toSeq).toSeq
    val local = BPE.bpeMergesLocal(df, merges = 8, trainCap = 100)
      .collect().map(_.toSeq).toSeq
    assert(local == dist) // cap covers the vocab → exact full training
    val distCapped = BPE.bpeMerges(df, merges = 8, trainCap = 2)
      .collect().map(_.toSeq).toSeq
    val localCapped = BPE.bpeMergesLocal(df, merges = 8, trainCap = 2)
      .collect().map(_.toSeq).toSeq
    assert(localCapped == distCapped) // same seed → same merges at any cap
    // trainCap <= 0 means FULL vocab (mirrors bpeMerges), never limit(0):
    // the q97 registration relies on this being oracle-exact
    val localFull = BPE.bpeMergesLocal(df, merges = 8, trainCap = 0)
      .collect().map(_.toSeq).toSeq
    assert(localFull == dist)
  }

  test("merge-table prefix stability: training longer never rewrites " +
    "earlier merges (the 32k-run's first K rows equal a K-merge run)") {
    // richer corpus so deep merge steps exist and exercise the heap's
    // stale-entry skipping across many count updates
    val df = docs((1L, "the quick brown fox jumps over the lazy dog " +
      "the quick brown cat sleeps under the lazy tree"),
      (2L, "pack my box with five dozen liquor jugs pack my box again"),
      (3L, "aaaa aaab aabb abbb bbbb aaaa aaab"))
    val full = BPE.bpeMergesLocal(df, merges = 60, trainCap = 0)
      .collect().map(_.toSeq).toSeq
    val short = BPE.bpeMergesLocal(df, merges = 15, trainCap = 0)
      .collect().map(_.toSeq).toSeq
    assert(full.take(15) == short)
    // and the incremental trainer still equals the distributed one
    // (the merge-for-merge contract; depth kept at 10 — the distributed
    // trainer's per-merge cost grows superlinearly with the union-grown
    // counts plan, and deeper equality is exactly what the incremental
    // trainer exists to avoid re-measuring)
    val dist = BPE.bpeMerges(df, merges = 10, trainCap = 0)
      .collect().map(_.toSeq).toSeq
    assert(full.take(10) == dist)
  }

  test("deep-merge prefix: a 512-merge run over the derived hex vocab " +
    "equals the 256-merge oracle point (q123) on its prefix") {
    // the covering evidence for training depths past DuckDB's binder
    // limit (BPE.DeepMerges note): incremental BPE never revises a
    // committed merge, so the oracle-checked 256-merge table pins the
    // exact prefix of any deeper run on the same code path. The corpus
    // mirrors q123's derivation (md5 word-forms over the documents
    // table) on a synthetic docs df rich enough to survive 512 merges.
    val df = docs((1L to 40L).map(i => (i,
      s"alpha bravo charlie delta echo${i % 7} foxtrot golf hotel " +
        s"india juliet kilo${i % 5} lima mike november oscar papa")): _*)
    val deep = BPE.bpeDeepMerges(df, merges = 512, cap = 1024)
      .collect().map(_.toSeq).toSeq
    val oraclePoint = BPE.bpeDeepMerges(df, merges = 256, cap = 1024)
      .collect().map(_.toSeq).toSeq
    assert(oraclePoint.size == 256) // vocab rich enough: no early stop
    assert(deep.take(256) == oraclePoint)
    assert(deep.size > 256) // the deep run really went past the oracle
  }

  test("BPE ignores non-ASCII words and ties break lexicographically") {
    // "zz" and "yy" both count 2; (y,y) < (z,z) lexicographically → the
    // first merge must be (y,y). The unicode word must not contribute.
    val df = docs((1L, "zz yy 漢字 zz yy"))
    val got = BPE.bpeMerges(df, merges = 1)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "y", "y", 2L)))
  }
}
