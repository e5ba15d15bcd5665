package graft.tools

import graft.contentops.Fixture
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.Base64

/** One-shot recorder for the checked-in GetRecords wire fixture
  * (`src/test/resources/kinesis_getrecords_recorded.jsonl`): one
  * `GetRecords`-response-shaped JSON object per shard, records carrying
  * base64 `Data` (the exact gzipped wire payload bytes of the living
  * fixture), 56-digit fixed-width `SequenceNumber`s (real Kinesis shape —
  * they overflow BIGINT by ~37 orders of magnitude), fractional-epoch
  * `ApproximateArrivalTimestamp`, and the document id as `PartitionKey`
  * (an arbitrary user string in production, NOT a shard identity).
  *
  * Run `sbt "Test/runMain graft.tools.RecordKinesisFixture"` to
  * re-record; KinesisFixtureSpec pins the committed file byte-for-byte
  * against the living fixture, so a drift in either shows up as a red
  * test, not a silent de-sync.
  */
object RecordKinesisFixture {

  /** 48-digit prefix + zero-padded 8-digit op seq = 56 digits, fixed
    * width, so lexicographic order is numeric order (the wire contract). */
  val SeqPrefix = "495903382714902566085596925383615710959215759891"
  def seq56(seq: Long): String = SeqPrefix + f"$seq%08d"

  /** Deterministic AWS-style fractional epoch seconds. */
  def arrival(seq: Long): String = s"${1709251200L + seq * 7}.${f"${(seq * 137) % 1000}%03d"}"

  /** Ops with seq < 20 cover every wire path: inline payloads, resolved
    * S3 indirections (seq 3, 10), a broken indirection that must be lost
    * (seq 17), plus the alien non-content-operation record on shard 0. */
  def recordedOps: Vector[Fixture.Op] = Fixture.ops.filter(_.seq < 20)

  def lines: Seq[String] = {
    val payloadBySeq = Fixture.wireRecords.map(w => w.seq -> w.payload).toMap
    def rec(seqNum: String, arrivalTs: String, key: String, payload: Array[Byte]): String =
      s"""{"SequenceNumber":"$seqNum","ApproximateArrivalTimestamp":$arrivalTs,""" +
        s""""Data":"${Base64.getEncoder.encodeToString(payload)}","PartitionKey":"$key"}"""
    recordedOps.groupBy(_.shard).toSeq.sortBy(_._1).map { case (shard, ops) =>
      val recs = ops.sortBy(_.seq).map { o =>
        rec(seq56(o.seq), arrival(o.seq), o.id, payloadBySeq(Fixture.seqStr(o.seq)))
      } ++ (if (shard == 0)
        Seq(rec(seq56(999999L), arrival(999999L), "healthcheck",
          payloadBySeq(Fixture.AlienSeq)))
      else Nil)
      s"""{"ShardId":"shardId-${f"$shard%012d"}","MillisBehindLatest":0,""" +
        s""""NextShardIterator":"AAAAAAAAAAGraftFixtureIterator${f"$shard%04d"}",""" +
        s""""Records":[${recs.mkString(",")}]}"""
    }
  }

  def main(args: Array[String]): Unit = {
    val out = Paths.get("src/test/resources/kinesis_getrecords_recorded.jsonl")
    Files.createDirectories(out.getParent)
    Files.write(out, (lines.mkString("\n") + "\n").getBytes(UTF_8))
    println(s"recorded ${lines.size} shard responses to $out")
  }
}
