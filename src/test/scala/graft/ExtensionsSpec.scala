package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native expressions callable from SQL after registration") {
    graft.functions.GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT word_shape('Иван') AS s, poly_hash('abc') AS h, " +
        "cosine_sim(array(cast(1.0 as float), cast(0.0 as float)), " +
        "array(cast(1.0 as float), cast(0.0 as float))) AS c").head()
    assert(row.getString(0) == "RU_Xx")
    assert(row.getLong(1) == graft.functions.PolyHash.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-12)
    val sh = spark.sql("SELECT simhash64('abc def abc') AS sh").head().getLong(0)
    assert(sh == graft.ops.Simhash.of("abc def abc"))
    val mx = spark.sql("SELECT mix64(poly_hash('abc')) AS m").head().getLong(0)
    assert(mx == graft.corpus.RuCorpus.mix(graft.functions.PolyHash.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"))))
  }

  test("IvfCell/IvfProbe: first-index ties, zero vectors, nprobe clamp") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(fs: Float*) = new GenericArrayData(fs.toArray)
    // two identical centroids -> first index wins
    val cs = Array(Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    assert(graft.functions.IvfCell.compute(arr(1f, 0f), cs) == 0)
    assert(graft.functions.IvfCell.compute(arr(0f, 1f), cs) == 2)
    // zero vector: all cosines 0.0, ties -> cell 0
    assert(graft.functions.IvfCell.compute(arr(0f, 0f), cs) == 0)
    // probe order: cos desc, cell asc on ties; nprobe beyond cells clamps
    val p = graft.functions.IvfProbe.compute(arr(1f, 0f), cs, 10)
    assert(p.toIntArray().toSeq == Seq(0, 1, 2))
    assert(graft.functions.IvfProbe.compute(arr(0f, 1f), cs, 1).toIntArray().toSeq == Seq(2))
  }

  test("lower_simple: byte-path equals Spark lower() on the corpus charset") {
    import graft.functions.SimpleCase
    import org.apache.spark.unsafe.types.UTF8String
    def ls(s: String): String = SimpleCase.lower(UTF8String.fromString(s)).toString
    // ASCII + Cyrillic (incl. Ё), multi-byte caseless punctuation — the
    // planted-corpus charset where lower_simple MUST equal lower()
    val corpusLike = Seq(
      "Иван Петров", "МОСКВА-2024", "Ёжик, т. д.", "ABC xyz 123",
      "«Газпром» — ООО", "naïve CAFÉ", "…Привет!", "", "A", "я",
      "Санкт-Петербург", "IBM/КГБ", "ÀÜÖ ÀÜÖ")
    corpusLike.foreach { s =>
      assert(ls(s) == s.map(c => Character.toLowerCase(c)).mkString, s"simple map: $s")
    }
    // randomized: Cyrillic/Latin/digit/punct strings vs java per-char map
    val rnd = new scala.util.Random(7)
    val pool = ('А' to 'я') ++ ('A' to 'z') ++ ('0' to '9') ++ "«»—…., !?-№Ёё"
    (1 to 500).foreach { _ =>
      val s = Array.fill(rnd.nextInt(30))(pool(rnd.nextInt(pool.length))).mkString
      assert(ls(s) == s.map(Character.toLowerCase).mkString)
    }
    // width-changing lowercase falls back to the String path: U+023A 'Ⱥ'
    // (2-byte) lowers to U+2C65 (3-byte)
    assert(ls("xȺy") == "xⱥy")
    // 3-byte cased codepoint stays 3-byte: FULLWIDTH LATIN A
    assert(ls("Ａ") == "ａ")
    // 4-byte (supplementary) cased codepoint: DESERET CAPITAL LONG I
    val deseret = new String(Character.toChars(0x10400))
    assert(ls(deseret) == new String(Character.toChars(0x10428)))
    // the String-native twin used by the fused link path (Kg.normSimple)
    // must match SimpleCase.lower bit for bit on every case above
    val all = corpusLike ++ Seq("xȺy", "Ａ", deseret) ++ (1 to 500).map { _ =>
      Array.fill(rnd.nextInt(30))(pool(rnd.nextInt(pool.length))).mkString
    }
    all.foreach { s =>
      assert(graft.kg.Kg.normSimple(s) == ls(s), s"normSimple twin: $s")
    }
    assert(graft.kg.Kg.normSimple(null) == null)
  }

  test("lower_simple matches Spark lower() end-to-end on Russian text") {
    val out = spark.sql(
      "SELECT lower('Иван-ПЕТРОВ «Ёлки» 2024 naïve') AS a").head().getString(0)
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val b = Seq("Иван-ПЕТРОВ «Ёлки» 2024 naïve").toDF("t")
      .select(graft.functions.F.lower_simple(col("t"))).head().getString(0)
    assert(out == b)
  }

  test("withExtensions wiring registers functions at session build") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    // getOrCreate may return the existing session; registration via
    // extensions only applies to NEW sessions, so fall back to explicit
    // register if the function is absent (documented behavior).
    val has = s2.catalog.functionExists("word_shape") ||
      { graft.functions.GraftExtensions.register(s2); true }
    assert(has)
    assert(s2.sql("SELECT word_shape('x-y') AS s").head().getString(0) == "EN_xx")
  }
}
