package graft.llmdata

import java.nio.file.{Files, Path, Paths}

/** Test-only deployment cloner (r16, VERDICT r15 #3): the ingest
  * crash/convergence matrices need a FRESH DEPLOYMENT per case, not a
  * fresh bootstrap COMPUTATION — and the full 6-artifact bootstrap was
  * the dominant per-case cost (the 7-seam batch matrix alone paid it 8
  * times, ~4 minutes of the suite wall). Bootstrap once per tag into a
  * pristine template, then serve filesystem copies: valid because
  * every store resolves paths RELATIVE to its own dir (ManifestStore
  * manifests record `data/b<id>/…` names, GenDir resolves generations
  * by listing), and each copy gets a unique temp path so no
  * path-keyed session memo can alias template and clone. Bootstrap
  * determinism over an immutable corpus makes the copy
  * indistinguishable from a re-run — and the bootstrap-RESUME tests,
  * which exercise the bootstrap computation itself, keep their own
  * inline bootstraps. */
object PristineDeployment {
  private val templates =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A fresh work dir whose content equals what `boot` produces: built
    * once per `tag`, copied thereafter. `boot` receives the template
    * work dir and must bootstrap it completely. */
  def fresh(tag: String)(boot: String => Unit): String = {
    val tpl = templates.computeIfAbsent(tag, _ => {
      val work = Files.createTempDirectory(s"graft-pristine-$tag").toString
      boot(work)
      work
    })
    val dst = Files.createTempDirectory(s"graft-$tag").toString
    copyTree(Paths.get(tpl), Paths.get(dst))
    dst
  }

  private def copyTree(src: Path, dst: Path): Unit = {
    val it = Files.walk(src).iterator()
    while (it.hasNext) {
      val p = it.next()
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else {
        Files.createDirectories(t.getParent)
        Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }
}
