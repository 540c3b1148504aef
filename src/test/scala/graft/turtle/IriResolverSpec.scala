package graft.turtle

import org.scalatest.funsuite.AnyFunSuite

/** RFC 3986 §5.4 reference-resolution examples (normal + abnormal), the
  * public test vectors for the resolution algorithm the reference gets from
  * oxiri (triple_production.rs:337-343). */
class IriResolverSpec extends AnyFunSuite {
  private val base = IriResolver.parseBase("http://a/b/c/d;p?q")
    .fold(e => fail(e), identity)
  private def r(ref: String): String = IriResolver.resolve(base, ref)

  test("RFC 3986 5.4.1 normal examples") {
    assert(r("g:h") == "g:h")
    assert(r("g") == "http://a/b/c/g")
    assert(r("./g") == "http://a/b/c/g")
    assert(r("g/") == "http://a/b/c/g/")
    assert(r("/g") == "http://a/g")
    assert(r("//g") == "http://g")
    assert(r("?y") == "http://a/b/c/d;p?y")
    assert(r("g?y") == "http://a/b/c/g?y")
    assert(r("#s") == "http://a/b/c/d;p?q#s")
    assert(r("g#s") == "http://a/b/c/g#s")
    assert(r("g?y#s") == "http://a/b/c/g?y#s")
    assert(r(";x") == "http://a/b/c/;x")
    assert(r("g;x") == "http://a/b/c/g;x")
    assert(r("g;x?y#s") == "http://a/b/c/g;x?y#s")
    assert(r("") == "http://a/b/c/d;p?q")
    assert(r(".") == "http://a/b/c/")
    assert(r("./") == "http://a/b/c/")
    assert(r("..") == "http://a/b/")
    assert(r("../") == "http://a/b/")
    assert(r("../g") == "http://a/b/g")
    assert(r("../..") == "http://a/")
    assert(r("../../") == "http://a/")
    assert(r("../../g") == "http://a/g")
  }

  test("RFC 3986 5.4.2 abnormal examples") {
    assert(r("../../../g") == "http://a/g")
    assert(r("../../../../g") == "http://a/g")
    assert(r("/./g") == "http://a/g")
    assert(r("/../g") == "http://a/g")
    assert(r("g.") == "http://a/b/c/g.")
    assert(r(".g") == "http://a/b/c/.g")
    assert(r("g..") == "http://a/b/c/g..")
    assert(r("..g") == "http://a/b/c/..g")
    assert(r("./../g") == "http://a/b/g")
    assert(r("./g/.") == "http://a/b/c/g/")
    assert(r("g/./h") == "http://a/b/c/g/h")
    assert(r("g/../h") == "http://a/b/c/h")
    assert(r("g;x=1/./y") == "http://a/b/c/g;x=1/y")
    assert(r("g;x=1/../y") == "http://a/b/c/y")
    // strict parser (RFC 3986, not 1808): query/fragment stay with ref
    assert(r("g?y/./x") == "http://a/b/c/g?y/./x")
    assert(r("g?y/../x") == "http://a/b/c/g?y/../x")
    assert(r("g#s/./x") == "http://a/b/c/g#s/./x")
    assert(r("g#s/../x") == "http://a/b/c/g#s/../x")
  }

  test("fragment-only and empty references against a directory base") {
    val b = IriResolver.parseBase("http://example.org/").toOption.get
    assert(IriResolver.resolve(b, "#green-goblin") == "http://example.org/#green-goblin")
    assert(IriResolver.resolve(b, "subject2") == "http://example.org/subject2")
  }

  test("relative base is rejected like oxiri") {
    assert(IriResolver.parseBase("relative/path").isLeft)
  }
}
