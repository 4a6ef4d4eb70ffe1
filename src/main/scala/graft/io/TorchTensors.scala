package graft.io

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pure-JVM reader for torch-saved tensor files (`.pt`) — the reference's
  * scene input format (data_loader.py:128-135: `torch.load` of an IntTensor
  * shaped (bands, stations, 7, 7), then `permute(1,0,2,3)`).
  *
  * A `.pt` file is a zip: `<name>/data.pkl` (a protocol-2 pickle that calls
  * `torch._utils._rebuild_tensor_v2` with a persistent storage id, shape and
  * stride) plus `<name>/data/<key>` (raw little-endian storage bytes). The
  * pickle program torch emits for a single tensor uses a small fixed opcode
  * set; [[PtPickle]] is a stack-machine for exactly that subset (public
  * pickle protocol documentation; no torch dependency).
  *
  * Ingest runs once at the edge (S5): binaryFile scan → decode per file →
  * columnar nested arrays. The decode is a narrow map — files parallelize
  * across executors, nothing shuffles.
  */
object TorchTensors {

  final case class PtTensor(
      storageType: String,   // e.g. "IntStorage"
      shape: Seq[Int],
      stride: Seq[Int],
      storageOffset: Int,
      data: Array[Int])

  /** Decode one .pt zip payload. torch writes STORED entries with EXT
    * descriptors, which the streaming ZipInputStream rejects — spool to an
    * executor-local temp file and use ZipFile (central-directory reader).
    */
  def parsePt(bytes: Array[Byte]): PtTensor = {
    var pkl: Array[Byte] = null
    val storages = mutable.Map[String, Array[Byte]]()
    val tmp = java.io.File.createTempFile("graft_pt", ".zip")
    try {
      java.nio.file.Files.write(tmp.toPath, bytes)
      val zf = new java.util.zip.ZipFile(tmp)
      try {
        val entries = zf.entries()
        while (entries.hasMoreElements) {
          val e = entries.nextElement()
          val name = e.getName
          lazy val content = zf.getInputStream(e).readAllBytes()
          if (name.endsWith("/data.pkl")) pkl = content
          else {
            val i = name.lastIndexOf("/data/")
            if (i >= 0) storages(name.substring(i + 6)) = content
          }
        }
      } finally zf.close()
    } finally tmp.delete()
    require(pkl != null, "no data.pkl entry in .pt archive")
    val t = PtPickle.parse(pkl)
    val raw = storages.getOrElse(t.storageKey,
      throw new IllegalArgumentException(s"storage ${t.storageKey} missing"))
    val buf = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN).asIntBuffer()
    val data = new Array[Int](buf.remaining())
    buf.get(data)
    PtTensor(t.storageType, t.shape, t.stride, t.offset, data)
  }

  /** The reference's layout transform: (bands, stations, 7, 7) →
    * per-station, per-band 49-px windows (permute(1,0,2,3) + flatten last 2).
    */
  def toStationBands(t: PtTensor): Seq[Seq[Seq[Double]]] = {
    val Seq(nb, ns, h, w) = t.shape
    val Seq(s0, s1, s2, s3) = t.stride
    (0 until ns).map(s => (0 until nb).map(b => {
      val out = new Array[Double](h * w)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = t.data(t.storageOffset + b * s0 + s * s1 + y * s2 + x * s3)
          x += 1
        }
        y += 1
      }
      out.toSeq
    }))
  }

  private val decode = udf { (bytes: Array[Byte]) =>
    val t = parsePt(bytes)
    toStationBands(t)
  }

  /** Ingest a directory of .pt files → one row per scene with the permuted
    * nested tensor (stations × bands × 49).
    */
  def ingest(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pt").load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)\\.pt$", 1).as("scene_id"),
        decode(col("content")).as("tensor"))

  /** Inverse of [[parsePt]]+[[toStationBands]]: a (stations × bands × px)
    * tensor back to a torch-format .pt archive (zip + pickle + int32
    * storage, contiguous layout, shape (bands, stations, 1, px)). Values
    * must be integral — the reference's tensors are IntStorage.
    */
  def encodePt(sceneId: String, tensor: Seq[Seq[Seq[Double]]]): Array[Byte] = {
    val ns = tensor.size
    require(ns > 0, "empty tensor")
    val nb = tensor.head.size
    val px = tensor.head.head.size
    val data = new Array[Int](nb * ns * px)
    for (s <- 0 until ns; b <- 0 until nb) {
      val band = tensor(s)(b)
      require(band.size == px, s"ragged tensor at station $s band $b")
      var x = 0
      while (x < px) {
        val v = band(x)
        require(v == math.rint(v) && math.abs(v) <= Int.MaxValue,
          s"non-int32 value $v at ($s,$b,$x)")
        data(b * ns * px + s * px + x) = v.toInt
        x += 1
      }
    }
    val storage = ByteBuffer.allocate(data.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    data.foreach(storage.putInt)
    val pkl = PtPickle.write("IntStorage", "0",
      shape = Seq(nb, ns, 1, px), stride = Seq(ns * px, px, px, 1),
      numel = data.length)
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, bytes: Array[Byte]): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(bytes); zip.closeEntry()
    }
    entry(s"$sceneId/version", "3\n".getBytes("UTF-8"))
    entry(s"$sceneId/data.pkl", pkl)
    entry(s"$sceneId/data/0", storage.array())
    zip.close()
    bos.toByteArray
  }
}

/** Minimal protocol-2 pickle stack machine for torch single-tensor saves.
  * Supported opcodes: exactly the set torch emits for
  * `_rebuild_tensor_v2(storage_pid, offset, shape, stride, grad, hooks)`.
  * [[PtPickle.write]] emits the same structure (the writer half of the
  * graft-pt DataSource V2), byte-compatible with [[PtPickle.parse]].
  */
object PtPickle {

  /** Emit the torch single-tensor pickle: REDUCE of _rebuild_tensor_v2
    * over (persistent storage id, offset 0, shape, stride, grad=false,
    * OrderedDict()). Protocol 2, little-endian, same opcode set the parser
    * accepts.
    */
  def write(storageType: String, storageKey: String,
      shape: Seq[Int], stride: Seq[Int], numel: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def op(c: Int): Unit = bos.write(c)
    def int(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def unicode(s: String): Unit = {
      val b = s.getBytes("UTF-8"); op('X'); int(b.length); bos.write(b)
    }
    def global(module: String, name: String): Unit = {
      op('c'); bos.write(s"$module\n$name\n".getBytes("UTF-8"))
    }
    def intTuple(xs: Seq[Int]): Unit = {
      op('('); xs.foreach { x => op('J'); int(x) }; op('t')
    }
    op(0x80); op(2)                                  // PROTO 2
    global("torch._utils", "_rebuild_tensor_v2")
    op('(')                                          // args tuple
    op('(')                                          //   persistent id tuple
    unicode("storage")
    global("torch", storageType)
    unicode(storageKey)
    unicode("cpu")
    op('J'); int(numel)
    op('t')
    op('Q')                                          //   BINPERSID
    op('K'); op(0)                                   //   storage offset
    intTuple(shape)
    intTuple(stride)
    op(0x89)                                         //   requires_grad=False
    global("collections", "OrderedDict"); op(')'); op('R') // empty hooks
    op('t')
    op('R')                                          // REDUCE
    op('.')                                          // STOP
    bos.toByteArray
  }
  final case class Parsed(storageType: String, storageKey: String,
      shape: Seq[Int], stride: Seq[Int], offset: Int)

  private case class Global(module: String, name: String)
  private case class PersId(value: Any)
  private case class Reduced(callable: Any, args: Any)
  private case object Mark

  def parse(bytes: Array[Byte]): Parsed = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val stack = mutable.ArrayBuffer[Any]()
    val memo = mutable.Map[Int, Any]()

    def readLine(): String = {
      val sb = new StringBuilder
      var c = buf.get()
      while (c != '\n') { sb.append(c.toChar); c = buf.get() }
      sb.toString
    }
    def popToMark(): Seq[Any] = {
      val i = stack.lastIndexOf(Mark)
      val items = stack.slice(i + 1, stack.length).toSeq
      stack.remove(i, stack.length - i)
      items
    }

    var done = false
    while (!done && buf.hasRemaining) {
      (buf.get() & 0xff) match {
        case 0x80 => buf.get()                                  // PROTO n
        case 'c' => stack += Global(readLine(), readLine())     // GLOBAL
        case 'q' => memo(buf.get() & 0xff) = stack.last         // BINPUT
        case 'r' => memo(buf.getInt()) = stack.last             // LONG_BINPUT
        case 'h' => stack += memo(buf.get() & 0xff)             // BINGET
        case 'j' => stack += memo(buf.getInt())                 // LONG_BINGET
        case '(' => stack += Mark                               // MARK
        case 'X' =>                                             // BINUNICODE
          val n = buf.getInt()
          val b = new Array[Byte](n); buf.get(b)
          stack += new String(b, "UTF-8")
        case 'K' => stack += (buf.get() & 0xff)                 // BININT1
        case 'M' => stack += (buf.getShort() & 0xffff)          // BININT2
        case 'J' => stack += buf.getInt()                       // BININT
        case 't' => stack += popToMark()                        // TUPLE
        case ')' => stack += Seq.empty[Any]                     // EMPTY_TUPLE
        case 'Q' => stack += PersId(stack.remove(stack.length - 1)) // BINPERSID
        case 0x89 => stack += false                             // NEWFALSE
        case 0x88 => stack += true                              // NEWTRUE
        case 'N' => stack += null                               // NONE
        case 'R' =>                                             // REDUCE
          val args = stack.remove(stack.length - 1)
          val callable = stack.remove(stack.length - 1)
          stack += Reduced(callable, args)
        case '.' => done = true                                 // STOP
        case op => throw new IllegalArgumentException(
          f"unsupported pickle opcode 0x$op%02x at ${buf.position() - 1}")
      }
    }

    stack.last match {
      case Reduced(Global("torch._utils", "_rebuild_tensor_v2"), args: Seq[_]) =>
        val Seq(pid, offset, shape, stride, _ @ _*) = args
        val PersId(p: Seq[_]) = pid: @unchecked
        val Seq(_, Global(_, stype), key: String, _, _ @ _*) = p
        Parsed(stype, key,
          shape.asInstanceOf[Seq[Int]], stride.asInstanceOf[Seq[Int]],
          offset.asInstanceOf[Int])
      case other =>
        throw new IllegalArgumentException(s"unexpected pickle root: $other")
    }
  }
}
