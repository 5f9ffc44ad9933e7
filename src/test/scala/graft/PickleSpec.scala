package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.sim.Seir
import graft.sources.Pickle

/** S13 pickle sink: validated against REAL CPython `pickle.load` —
  * the only authority on the stream format. Skips (assume) when no
  * python3 is on PATH.
  */
class PickleSpec extends AnyFunSuite {

  private def python(code: String): Option[String] =
    try {
      val pb = new ProcessBuilder("python3", "-c", code)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      if (p.waitFor() == 0) Some(out) else None
    } catch { case _: java.io.IOException => None }

  private lazy val havePython = python("print(1)").contains("1")

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("pickle").resolve(name).toString

  test("every supported value kind survives pickle.load byte-exactly") {
    assume(havePython, "python3 not available")
    val path = tmp("mixed.pkl")
    Pickle.dump(Map(
      "none" -> None,
      "bools" -> Seq(true, false),
      // every BININT encoding boundary + LONG1 both signs
      "ints" -> Seq(0L, 255L, 256L, 65535L, 65536L, -1L, Int.MaxValue.toLong,
        Int.MinValue.toLong, Int.MaxValue + 1L, Long.MaxValue, Long.MinValue,
        -1099511627776L),
      "floats" -> Seq(0.0, -2.5, 1.7976931348623157e308, 1e-300),
      "text" -> "héllo 世界",
      "bytes" -> Array[Byte](0, 1, -1, 127),
      "tuple" -> Pickle.PyTuple(Seq(1L, "two", 3.0)),
      "nested" -> Map("k" -> Seq(Map("deep" -> 42L)))), path)
    val out = python(
      s"""import pickle, json
         |v = pickle.load(open('$path', 'rb'))
         |v['bytes'] = list(v['bytes'])
         |v['tuple'] = list(v['tuple'])
         |print(json.dumps(v, sort_keys=True))""".stripMargin).get
    val expected = """{"bools": [true, false], "bytes": [0, 1, 255, 127],""" +
      """ "floats": [0.0, -2.5, 1.7976931348623157e+308, 1e-300],""" +
      """ "ints": [0, 255, 256, 65535, 65536, -1, 2147483647, -2147483648,""" +
      """ 2147483648, 9223372036854775807, -9223372036854775808,""" +
      """ -1099511627776], "nested": {"k": [{"deep": 42}]}, "none": null,""" +
      // json.dumps default ensure_ascii escapes the non-ASCII text
      " \"text\": \"h\\u00e9llo \\u4e16\\u754c\", \"tuple\": [1, \"two\", 3.0]}"
    assert(out == expected, s"pickle.load mismatch:\n$out")
  }

  test("randomized long encoding: 4096 seeded-random ints round-trip bit-exactly") {
    assume(havePython, "python3 not available")
    val rnd = new scala.util.Random(0xC0FFEE)
    // random magnitudes across every encoding regime, plus the exact
    // power-of-two boundaries both signs
    val longs = (1 to 4096).map { _ =>
      val bits = rnd.nextInt(64)
      val v = rnd.nextLong() >> bits
      v
    } ++ (0 to 62).flatMap(b => Seq(1L << b, -(1L << b), (1L << b) - 1,
      -(1L << b) - 1))
    val path = tmp("longs.pkl")
    Pickle.dump(longs, path)
    val out = python(
      s"""import pickle
         |v = pickle.load(open('$path', 'rb'))
         |print(len(v), sum(v) % (2**61 - 1), min(v), max(v))""".stripMargin).get
    val m = BigInt(2).pow(61) - 1
    val expect = s"${longs.length} ${longs.map(BigInt(_)).sum.mod(m)} " +
      s"${longs.min} ${longs.max}"
    assert(out == expect, s"$out != $expect")
  }

  test("dumpPerSeed writes the reference's per-seed files, loadable by pickle") {
    assume(havePython, "python3 not available")
    val spark = Sessions.build("graft-test", "4")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val adj = Map(
      1L -> Array(2L, 3L), 2L -> Array(1L), 3L -> Array(1L), 4L -> Array.empty[Long])
    val statuses = Seir.runMany(spark, adj, beta = 5.0, sigma = 2.0,
      gamma = 0.5, initialInfected = Seq(1L), tmax = 100.0, seeds = 7 to 8)
      .as[Seir.NodeStatus]
    val dir = java.nio.file.Files.createTempDirectory("pklsink").toString
    Pickle.dumpPerSeed(statuses, dir)
    for (seed <- Seq(7L, 8L)) {
      val f = s"$dir/SIM_SEED_${seed}_raw_result.pkl"
      assert(new java.io.File(f).exists(), s"missing $f")
      val out = python(
        s"""import pickle, math
           |v = pickle.load(open('$f', 'rb'))
           |ns = v['node_statuses']
           |ok = (v['seed'] == $seed and len(ns) == 4
           |  and [d['node'] for d in ns] == [1, 2, 3, 4]
           |  and all(set(d) == {'node', 't_e', 't_i', 't_r'} for d in ns)
           |  and ns[0]['t_i'] == 0.0)
           |print('OK' if ok else ns)""".stripMargin).get
      assert(out == "OK", s"seed $seed: $out")
    }
    // reproducibility across the executor boundary: same seed, same file
    val dir2 = java.nio.file.Files.createTempDirectory("pklsink2").toString
    Pickle.dumpPerSeed(statuses, dir2)
    for (seed <- Seq(7L, 8L)) {
      val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        s"$dir/SIM_SEED_${seed}_raw_result.pkl"))
      val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        s"$dir2/SIM_SEED_${seed}_raw_result.pkl"))
      assert(java.util.Arrays.equals(a, b), s"seed $seed files differ")
    }
  }

  test("dumpDataFrame: a small result table round-trips as a list of row dicts") {
    assume(havePython, "python3 not available")
    val spark = Sessions.build("graft-test", "4")
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", -0.25))
      .toDF("id", "name", "score")
    val path = tmp("table.pkl")
    Pickle.dumpDataFrame(df, path)
    val out = python(
      s"""import pickle, json
         |print(json.dumps(pickle.load(open('$path', 'rb')), sort_keys=True))"""
        .stripMargin).get
    assert(out ==
      """[{"id": 1, "name": "a", "score": 1.5}, {"id": 2, "name": "b", "score": -0.25}]""",
      out)
  }

  test("dumpDataFrame covers timestamp/date/decimal/array result columns") {
    assume(havePython, "python3 not available")
    val spark = Sessions.build("graft-test", "4")
    import spark.implicits._
    val df = Seq((1L, "2024-03-01 10:30:00", "12.50", Seq(1L, 2L)))
      .toDF("id", "ts_s", "dec_s", "arr")
      .select(col("id"), col("ts_s").cast("timestamp").as("ts"),
        col("ts_s").cast("date").as("d"),
        col("dec_s").cast("decimal(10,2)").as("m"), col("arr"))
    val path = tmp("typed.pkl")
    Pickle.dumpDataFrame(df, path)
    val out = python(
      s"""import pickle, json
         |print(json.dumps(pickle.load(open('$path', 'rb')), sort_keys=True))"""
        .stripMargin).get
    assert(out ==
      """[{"arr": [1, 2], "d": "2024-03-01", "id": 1,""" +
      """ "m": 12.5, "ts": "2024-03-01 10:30:00.0"}]""", out)
  }
}
