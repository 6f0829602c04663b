package graft.tools

/** One-off probe: where do the ~40 ms offsets/commit-log writes of a
  * micro-batch actually go? Times the exact write paths Structured
  * Streaming's HDFSMetadataLog uses (Hadoop FileContext atomic
  * create+rename on the local scheme) against raw java.nio on the same
  * tmpfs dir, to separate filesystem cost from Hadoop-layer cost.
  */
object FsProbe {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(graft.Scratch.root, s"fsprobe_${ProcessHandle.current().pid()}")
    dir.mkdirs()
    val payload = ("x" * 500).getBytes

    // raw java.nio: write temp + atomic move
    var t0 = System.nanoTime()
    for (i <- 0 until 50) {
      val tmp = new java.io.File(dir, s"nio_$i.tmp").toPath
      java.nio.file.Files.write(tmp, payload)
      java.nio.file.Files.move(tmp, new java.io.File(dir, s"nio_$i").toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    println(f"nio write+move: ${(System.nanoTime() - t0) / 50e6}%.2f ms/op")

    val conf = new org.apache.hadoop.conf.Configuration()
    // FileContext path (FileContextBasedCheckpointFileManager)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      new java.net.URI(dir.toURI.toString), conf)
    t0 = System.nanoTime()
    for (i <- 0 until 50) {
      val tmp = new org.apache.hadoop.fs.Path(dir.toString, s"fc_$i.tmp")
      val out = fc.create(tmp,
        java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
          org.apache.hadoop.fs.CreateFlag.OVERWRITE))
      out.write(payload); out.close()
      fc.rename(tmp, new org.apache.hadoop.fs.Path(dir.toString, s"fc_$i"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    println(f"fc create+rename: ${(System.nanoTime() - t0) / 50e6}%.2f ms/op")

    // FileSystem path with checksums (what fs.file gives by default)
    val fs = new org.apache.hadoop.fs.Path(dir.toString).getFileSystem(conf)
    t0 = System.nanoTime()
    for (i <- 0 until 50) {
      val tmp = new org.apache.hadoop.fs.Path(dir.toString, s"fs_$i.tmp")
      val out = fs.create(tmp, true)
      out.write(payload); out.close()
      fs.rename(tmp, new org.apache.hadoop.fs.Path(dir.toString, s"fs_$i"))
    }
    println(f"fs create+rename: ${(System.nanoTime() - t0) / 50e6}%.2f ms/op")

    // with hsync (the durability barrier metadata logs may request)
    t0 = System.nanoTime()
    for (i <- 0 until 20) {
      val p = new org.apache.hadoop.fs.Path(dir.toString, s"sync_$i")
      val out = fs.create(p, true)
      out.write(payload); out.hsync(); out.close()
    }
    println(f"fs create+hsync: ${(System.nanoTime() - t0) / 20e6}%.2f ms/op")

    // granular: which FileContext op pays the fork/exec?
    t0 = System.nanoTime()
    for (i <- 0 until 20) {
      val out = fc.create(new org.apache.hadoop.fs.Path(dir.toString, s"fco_$i"),
        java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
          org.apache.hadoop.fs.CreateFlag.OVERWRITE))
      out.write(payload); out.close()
    }
    println(f"fc create only: ${(System.nanoTime() - t0) / 20e6}%.2f ms/op")
    t0 = System.nanoTime()
    for (i <- 0 until 20) {
      fc.rename(new org.apache.hadoop.fs.Path(dir.toString, s"fco_$i"),
        new org.apache.hadoop.fs.Path(dir.toString, s"fcr_$i"))
    }
    println(f"fc rename only: ${(System.nanoTime() - t0) / 20e6}%.2f ms/op")
    t0 = System.nanoTime()
    for (i <- 0 until 20) {
      fs.mkdirs(new org.apache.hadoop.fs.Path(dir.toString, s"d_$i"))
    }
    println(f"fs mkdirs: ${(System.nanoTime() - t0) / 20e6}%.2f ms/op")
    t0 = System.nanoTime()
    for (i <- 0 until 20) {
      fs.setPermission(new org.apache.hadoop.fs.Path(dir.toString, s"fs_$i"),
        new org.apache.hadoop.fs.permission.FsPermission("644"))
    }
    println(f"fs setPermission: ${(System.nanoTime() - t0) / 20e6}%.2f ms/op")
    t0 = System.nanoTime()
    for (i <- 0 until 20) {
      fs.getFileStatus(new org.apache.hadoop.fs.Path(dir.toString, s"fs_$i"))
    }
    println(f"fs getFileStatus: ${(System.nanoTime() - t0) / 20e6}%.2f ms/op")

    graft.io.ParquetIO.deleteRecursively(dir)
  }
}
