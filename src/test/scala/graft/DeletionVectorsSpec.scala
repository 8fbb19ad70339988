package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sources.DeletionVectors

/** Pins the Delta deletion-vector plumbing to its PUBLIC reference
  * points: RFC 1924's own Base85 example, the protocol's magic number,
  * and round-trip laws for the bitmap/file layers (delta.io PROTOCOL.md
  * "Deletion Vectors"). */
class DeletionVectorsSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).get

  private def forSeeds[A](g: Gen[A])(body: A => Unit): Unit =
    (1L to 25L).foreach(seed => body(sample(g, seed)))

  test("Base85: RFC 1924 character set, 4-byte big-endian blocks") {
    // Delta's codec = the RFC 1924 CHARACTER SET with the standard 4-byte
    // block-aligned encoding (the RFC's own worked example encodes the
    // whole 128-bit address as ONE base-85 number, so it does not apply
    // to the block variant). Pin the charset and the block law against an
    // independent BigInt re-derivation.
    val alphabet = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      "abcdefghijklmnopqrstuvwxyz!#$%&()*+-;<=>?@^_`{|}~"
    assert(alphabet.length == 85)
    def blockEnc(b: Array[Byte]): String = {
      val v = BigInt(1, b)
      (4 to 0 by -1).map(i => alphabet(((v / BigInt(85).pow(i)) % 85).toInt)).mkString
    }
    forSeeds(Gen.listOfN(4, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      assert(DeletionVectors.base85Encode(bs.toArray) == blockEnc(bs.toArray))
    }
    assert(DeletionVectors.base85Encode(Array[Byte](0, 0, 0, 0)) == "00000")
    assert(DeletionVectors.base85Encode(Array[Byte](0, 0, 0, 1)) == "00001")
    assert(DeletionVectors.base85Encode(Array[Byte](-1, -1, -1, -1)) == "|NsC0")
  }

  test("Base85: arbitrary byte arrays round-trip (incl. non-multiple-of-4 lengths)") {
    forSeeds(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      val a = bs.toArray
      val enc = DeletionVectors.base85Encode(a)
      assert(enc.length == (a.length + 3) / 4 * 5)
      assert(DeletionVectors.base85Decode(enc, a.length).toSeq == a.toSeq)
    }
  }

  test("UUIDs encode to 20 chars and round-trip") {
    forSeeds(Gen.uuid) { u =>
      val enc = DeletionVectors.encodeUuid(u)
      assert(enc.length == 20)
      assert(DeletionVectors.decodeUuid(enc) == u)
    }
  }

  test("RoaringBitmapArray: positions round-trip, 64-bit keys, magic enforced") {
    val gen = Gen.listOf(Gen.oneOf(
      Gen.chooseNum(0L, 5000L),
      Gen.chooseNum(0L, 3L).map(k => (k << 32) | 17L))) // multi-key blobs
    forSeeds(gen) { ps =>
      val distinct = ps.distinct.sorted
      val blob = DeletionVectors.serialize(distinct.iterator)
      assert(DeletionVectors.positions(blob).toSeq == distinct)
      assert(DeletionVectors.cardinality(blob) == distinct.size.toLong)
    }
    val bad = DeletionVectors.serialize(Iterator(1L, 2L))
    bad(0) = 0x7f.toByte // corrupt the magic
    val e = intercept[IllegalArgumentException](DeletionVectors.positions(bad).toSeq)
    assert(e.getMessage.contains("magic"))
  }

  test("union merges stacked deletes") {
    val a = DeletionVectors.serialize(Iterator(1L, 5L, (2L << 32) | 9L))
    val b = DeletionVectors.serialize(Iterator(5L, 7L))
    assert(DeletionVectors.positions(DeletionVectors.union(a, b)).toSeq ==
      Seq(1L, 5L, 7L, (2L << 32) | 9L))
  }

  test("DV file: version byte, size/CRC verification, offset math") {
    val root = Files.createTempDirectory("graft_dv")
    val b1 = DeletionVectors.serialize(Iterator(0L, 3L, 4L))
    val b2 = DeletionVectors.serialize(Iterator(100L))
    val (encUuid, offsets) = DeletionVectors.writeDvFile(root, Seq(b1, b2))
    assert(offsets.head == 1, "the first blob starts right after the version byte")
    val file = DeletionVectors.resolveDvFile(root, "u", encUuid)
    assert(Files.isRegularFile(file))
    assert(DeletionVectors.readDvBlob(file, offsets(0), b1.length).toSeq == b1.toSeq)
    assert(DeletionVectors.readDvBlob(file, offsets(1), b2.length).toSeq == b2.toSeq)
    // wrong size -> loud; corrupt byte -> CRC failure
    assert(intercept[IllegalArgumentException](
      DeletionVectors.readDvBlob(file, offsets(0), b1.length - 1))
      .getMessage.contains("declares"))
    val raw = Files.readAllBytes(file)
    raw(offsets(0) + 5) = (raw(offsets(0) + 5) ^ 0x01).toByte
    Files.write(file, raw)
    assert(intercept[IllegalArgumentException](
      DeletionVectors.readDvBlob(file, offsets(0), b1.length))
      .getMessage.contains("CRC"))
    // external storage refused
    assert(intercept[IllegalArgumentException](
      DeletionVectors.resolveDvFile(root, "p", "s3://bucket/dv.bin"))
      .getMessage.contains("external storage"))
  }
}
